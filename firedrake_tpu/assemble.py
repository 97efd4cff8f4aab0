"""assemble(): the gather -> vmapped-kernel -> scatter executor.

Replaces the assemble driver + PyOP2 parloop machinery (reference:
firedrake/assemble.py:48 assemble / :154 get_assembler;
pyop2/parloop.py:245 execution; pyop2/global_kernel.py:428 JIT).  One jitted
XLA program per (form signature, mesh, bcs): gathers via static int32 maps,
vmaps the quadrature kernel over entities, scatter-adds into the global
vector / flat CSR data.  XLA replaces the generated-C + ctypes pipeline.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .language.measure import Form
from .language.core import Argument, Coefficient, ConstantBase
from .compiler.kernels import CompiledIntegral
from .compiler.smalldot import einsum as _small_einsum
from .compiler.precision import (kernel_dtype, trace_ctx, castf,
                                 castf_map, widen)
from .compiler.pallas_eval import run_cell_kernel
from .assembly.sparsity import Sparsity
from .assembly.matrix import Matrix
from .function import Function, Cofunction
from .bcs import DirichletBC, as_bcs


def _form_dtype(form):
    """complex128 when any coefficient/constant/literal in the form is
    complex, else float64 (the reference's PetscScalar role)."""
    from .language.core import ScalarValue
    for c in form.coefficients():
        if np.iscomplexobj(np.asarray(c.dat)):
            return jnp.complex128
    for c in form.constants():
        if np.iscomplexobj(c.values()):
            return jnp.complex128
    for it in form.integrals():
        for t in it.integrand.traverse():
            if isinstance(t, ScalarValue) and isinstance(t.value, complex):
                return jnp.complex128
    return jnp.float64

__all__ = ["assemble", "FormAssembler", "get_assembler"]

_assembler_cache: dict = {}


def _kernel_chunk(ci, ce):
    """Cell-axis chunk size bounding the batched kernel's live
    (ni, nj, nq, chunk) quadrature intermediate to FDTPU_KERNEL_BYTES
    (default 1 GiB).  None = no chunking (the common case; only
    north-star-scale meshes with high-degree rules trip the bound)."""
    import os as _os
    C = ce.shape[-1]
    ni, nj = ci.local_shape()
    per_cell = max(ni * nj * ci.num_quad_points(), 1) * ce.dtype.itemsize
    budget = float(_os.environ.get("FDTPU_KERNEL_BYTES", 2 ** 30))
    chunk = int(budget / per_cell)
    if chunk >= C:
        return None
    return max(chunk, 1024)


def _perm_index_map(cell, nfv=None):
    """permutation tuple -> orientation index (itertools order)."""
    import itertools
    if nfv is None:
        nfv = cell.facets.shape[1]
    perms = list(itertools.permutations(range(nfv)))
    return {p: i for i, p in enumerate(perms)}, nfv


class FormAssembler:
    """Static index data + one jitted device program for a form.

    Reference analogue: ParloopFormAssembler (assemble.py:1019) and its
    parloop/kernel caches (tsfc_interface.py:77)."""

    def __init__(self, form: Form, bcs=(), mat_type="aij",
                 zero_bc_nodes=False, use_stencil=True):
        self.form = form
        self.bcs = as_bcs(bcs)
        self.mat_type = mat_type
        self.zero_bc_nodes = zero_bc_nodes
        args = form.arguments()
        self.rank = len(args)
        self.test = args[0] if self.rank >= 1 else None
        self.trial = args[1] if self.rank >= 2 else None
        self.mesh = form.mesh()
        if self.mesh is None:
            raise ValueError("form has no mesh")
        self.coords_space = self.mesh.coordinates.function_space()
        self.coefficients = form.coefficients()
        self.constants = form.constants()
        # mixed-precision kernel execution (compiler/precision.py):
        # read ONCE at build — the jitted program bakes the choice in
        self._prec = kernel_dtype()
        # complex scalar mode (reference: tsfc complex builds,
        # tsfc/ufl_utils.py:48-70): the output dtype follows the data —
        # complex coefficients/constants/literals make the whole
        # accumulation complex128.  Complex never runs reduced.
        self._cdtype = _form_dtype(form)
        if self._cdtype == jnp.complex128:
            self._prec = None

        self._compiled = []
        for integral in form.integrals():
            mixed_facets = (self.mesh.cell.facet_cell_name is None
                            and integral.integral_type in
                            ("exterior_facet", "interior_facet"))
            if mixed_facets:
                # prism: one compiled program per facet class (the
                # triangle and quad facets carry different quadrature)
                for ft in sorted(set(self.mesh.cell.facet_types)):
                    self._compiled.append(CompiledIntegral(
                        integral, self.test, self.trial, self.mesh,
                        ftype=ft))
            else:
                self._compiled.append(CompiledIntegral(
                    integral, self.test, self.trial, self.mesh))
        # ---- structured-mesh stencil fast path (assembly/stencil.py):
        # zero index arrays, zero gathers — slices + lax.pad only.  When
        # it applies, the big per-integral index statics (and for rank 2
        # the whole Sparsity) are built lazily only if a consumer (the
        # distributed executor) asks for them.
        self._stencil = None
        self._column = None
        if use_stencil and self.rank in (1, 2) \
                and self._cdtype != jnp.complex128:
            from .assembly.stencil import build_stencil_plan
            self._stencil = build_stencil_plan(self)
            if self._stencil is None:
                # extruded column fast path (assembly/columns.py): row
                # gathers of whole dof columns + strided z-slices
                from .assembly.columns import build_column_plan
                self._column = build_column_plan(self)
        self._jitted_diag = None
        if self._stencil is not None or self._column is not None:
            self._statics_list = None
            self._acc_args = None
            self._arg_statics = []
            self._jitted = jax.jit(self._run)
            return

        self._statics_list = []
        self._build_statics()
        self._finalize_setup()

    def _build_statics(self):
        compiled = self._compiled
        self._compiled = []
        self._statics_list = []
        blocks = []
        for ci in compiled:
            st = self._prepare_integral(ci)
            if st is None:
                continue     # empty entity set
            self._compiled.append(ci)
            self._statics_list.append(st)
            if self.rank == 2:
                blocks.append((np.asarray(st["rows"]),
                               np.asarray(st["cols"])))
        if self.rank == 2:
            self.sparsity = Sparsity(self.test.space.dim,
                                     self.trial.space.dim, blocks)
            for st, pos in zip(self._statics_list,
                               self.sparsity.block_positions):
                st["pos"] = np.asarray(pos)

    @property
    def _statics(self):
        """Per-integral numpy index statics.  Built lazily when the
        stencil fast path is active (only the distributed executor
        needs them then)."""
        if self._statics_list is None:
            self._build_statics()
        return self._statics_list

    def _finalize_setup(self):
        self._acc_args = None
        import os as _os
        if _os.environ.get("FDTPU_SCATTER") == "1":
            pass          # debug: keep the scatter-add accumulation
        elif self.rank == 2:
            # gather tables by default: the honest forced-materialization
            # A/B at 512^2 P1 measured table 200 ms vs sorted-segsum
            # 650-770 ms per assembly (segment_sum lowers slowly on this
            # chip; PERF_NOTES round 2b)
            if _os.environ.get("FDTPU_GATHER_ACC") == "sorted":
                self._acc_args = self._build_sorted_accum()
            else:
                self._acc_args = self._build_acc_table()
        elif self.rank == 1:
            self._acc_args = self._build_sorted_accum_rank1()
        # index maps are passed as ARGUMENTS to the jitted program (not
        # closure constants): multi-MB embedded literals blow up
        # compile time, especially through remote-compile tunnels.
        # _statics stays NUMPY (host-side consumers — accumulation
        # plans, the distributed localizer — must NEVER read arrays
        # back from the device: ONE multi-MB d2h through the axon
        # tunnel takes ~30 s AND permanently degrades every subsequent
        # dispatch of the process by ~30-100 ms — PERF_NOTES round 2b);
        # _arg_statics is the device mirror.
        def _is_arrayish(v):
            if isinstance(v, (np.ndarray, jnp.ndarray)):
                return True
            if isinstance(v, tuple):
                return all(isinstance(x, (np.ndarray, jnp.ndarray))
                           for x in v)
            if isinstance(v, dict):
                return bool(v) is False or all(
                    _is_arrayish(x) for x in v.values())
            return False

        # persistent device mirrors hold every >=2D array FLATTENED:
        # a (C, 3) int32 map stored 2-D gets (8,128)-tile-padded on TPU
        # (3 -> 128 lanes, 43x HBM; 1024^2 meshes OOMed in round 2).
        # _run reshapes at the use site with the statically-known
        # trailing dims — a no-op for host callers that pass 2-D shards.
        self._arg_statics = [
            jax.tree_util.tree_map(
                lambda v: jnp.asarray(
                    v.reshape(-1) if isinstance(v, np.ndarray)
                    and v.ndim >= 2 else v),
                {k: v for k, v in st.items()
                 if not k.startswith("_") and v is not None
                 and _is_arrayish(v)})
            for st in self._statics]
        self._jitted = jax.jit(self._run)

    @staticmethod
    def _rs1(v, ref):
        if ref is None or not hasattr(v, "reshape"):
            return v
        ref = np.asarray(ref)
        if ref.ndim >= 2:
            return v.reshape((-1,) + ref.shape[1:])
        return v

    def _restore_shapes(self, st, np_st):
        """Restore the trailing dims of flattened device mirrors using
        the numpy statics' statically-known shapes (a no-op for shard
        callers that pass 2-D arrays)."""
        out = {}
        for k, v in st.items():
            ref = np_st.get(k)
            if isinstance(v, dict) and isinstance(ref, dict):
                out[k] = {kk: self._rs1(vv, ref.get(kk))
                          for kk, vv in v.items()}
            elif isinstance(v, tuple) and isinstance(ref, tuple):
                out[k] = tuple(self._rs1(x, r) for x, r in zip(v, ref))
            else:
                out[k] = self._rs1(v, ref)
        return out

    def _build_sorted_accum(self):
        """Sorted-permutation CSR accumulation (the round-2 fast path).

        Measured on the v5e: flat 1-D gathers and sorted segment_sum with
        index arrays passed as jit ARGUMENTS run at ~0.02-0.2 ns/element,
        while (nnz, K) 2D gather tables and scatter-adds with duplicate
        indices cost 10-140 ms at 1M contributions (tiny-trailing-dim
        relayouts + serial scatter lowering — PERF_NOTES.md round 2).
        So: concatenate the per-integral local values FLAT, apply ONE
        host-precomputed permutation that sorts contributions by target
        nonzero, and finish with segment_sum(indices_are_sorted=True)."""
        nnz = self.sparsity.nnz
        parts = [np.asarray(st["pos"]) for st in self._statics]
        if not parts:
            return None
        pos_all = np.concatenate(parts)
        # RestrictedFunctionSpace sentinels (pos == nnz) never land
        src = np.nonzero(pos_all < nnz)[0].astype(np.int64)
        key = pos_all[src]
        o = np.argsort(key, kind="stable")
        return {"perm": jnp.asarray(src[o].astype(np.int32)),
                "seg": jnp.asarray(key[o].astype(np.int32))}

    def _build_sorted_accum_rank1(self):
        """Same sorted-permutation trick for vector assembly: one flat
        permutation + segment_sum replaces the duplicate-index
        scatter-add (which XLA lowers serially, ~10 ms/Melem)."""
        ndof = self.test.space.dim
        parts = [np.asarray(st["rows"]).reshape(-1)
                 for st in self._statics]
        if not parts:
            return None
        pos_all = np.concatenate(parts)
        src = np.nonzero(pos_all < ndof)[0].astype(np.int64)
        key = pos_all[src]
        o = np.argsort(key, kind="stable")
        return {"perm": jnp.asarray(src[o].astype(np.int32)),
                "seg": jnp.asarray(key[o].astype(np.int32))}

    def _build_acc_table(self):
        """Scatter-free CSR accumulation plan.

        XLA lowers scatter-add with duplicate indices (and random
        gathers) to ~40 ns/element serial paths on TPU; a static
        (nnz, K) gather table — K = max contributions per nonzero —
        turns the accumulation into K masked gathers + adds, measured
        ~2x faster end-to-end (PERF_NOTES.md).  Built once per form on
        the host; falls back to scatter-add (None) when K or the table
        size would be excessive (high-degree 3D vertices)."""
        nnz = self.sparsity.nnz
        parts = []
        for st in self._statics:
            pos = np.asarray(st["pos"])
            n = st["n"]
            kk = pos.size // n
            # value flat order: slot-major (k*C + c) on the batched
            # cell-last path, cell-major (c*KK + k) otherwise
            parts.append(pos.reshape(n, kk).T.reshape(-1)
                         if st.get("batched") else pos)
        if not parts:
            return None
        pos_all = np.concatenate(parts)
        nvals = len(pos_all)       # flat value-array length (pad slot)
        # RestrictedFunctionSpace sentinels (pos == nnz) never land
        src = np.nonzero(pos_all < nnz)[0]
        pos_all = pos_all[src]
        counts = np.bincount(pos_all, minlength=nnz)
        K = int(counts.max()) if counts.size else 0
        if K == 0 or K > 12 or nnz * min(K, 4) > 6e7:
            return None
        order = src[np.argsort(pos_all, kind="stable")]
        spos = np.sort(pos_all, kind="stable")
        col = np.arange(len(order)) - (np.cumsum(counts) - counts)[spos]
        # split point NB minimizing gathered volume: a dense (nnz, NB)
        # base table plus a short (rows>NB, K-NB) spill table (most
        # nonzeros have few contributors; padding all rows to K wastes
        # gather bandwidth)
        NB = min(range(1, K + 1),
                 key=lambda nb: nnz * nb
                 + int((counts > nb).sum()) * (K - nb))
        pad = np.int32(nvals)
        tbl = np.full((nnz, NB), pad, dtype=np.int32)
        m = col < NB
        tbl[spos[m], col[m]] = order[m].astype(np.int32)
        # store COLUMNS, not the (nnz, NB) table: a 2-D int32 array with
        # a tiny trailing dim gets (8,128)-tile-padded on TPU (NB=2 ->
        # 128 lanes, 64x HBM — the round-2 1024^2 OOM); flat 1-D columns
        # don't pad and gather identically
        out = {"tbl_cols": tuple(
            jnp.asarray(np.ascontiguousarray(tbl[:, j]))
            for j in range(NB))}
        rows_x = np.where(counts > NB)[0]
        if len(rows_x):
            ridx = np.full(nnz, -1, dtype=np.int64)
            ridx[rows_x] = np.arange(len(rows_x))
            tblx = np.full((len(rows_x), K - NB), pad, dtype=np.int32)
            mx = ~m
            tblx[ridx[spos[mx]], col[mx] - NB] = \
                order[mx].astype(np.int32)
            out["tblx_cols"] = tuple(
                jnp.asarray(np.ascontiguousarray(tblx[:, j]))
                for j in range(tblx.shape[1]))
            out["rows_x"] = jnp.asarray(rows_x)
        return out

    # ----------------------------------------------------- host-side prep
    def _prepare_integral(self, ci: CompiledIntegral):
        mesh = self.mesh
        topo = mesh.topology
        st = {}
        g = mesh.geometric_dimension
        cmap = self.coords_space.cell_dof_map    # (ncell, ndofc*g)
        cmap3 = cmap.reshape(topo.num_cells, -1, g)

        def dofmaps(cells):
            return {c.count: np.asarray(c.space.cell_dof_map[cells])
                    for c in ci.coefficients}

        def coeff_signs(cells):
            out = {}
            for c in ci.coefficients:
                if getattr(c.space, "has_dof_signs", False):
                    out[c.count] = np.asarray(
                        c.space.cell_dof_signs[cells])
            return out

        def arg_signs(arg, cells):
            if arg is not None and getattr(arg.space, "has_dof_signs",
                                           False):
                return np.asarray(arg.space.cell_dof_signs[cells])
            return None

        # matrix-valued entity transformations (tet-face moments etc.,
        # functionspace.cell_dof_transforms): per-cell (nd, nd) blocks
        # applied as B to coefficient gathers and B^T . B to local
        # tensors — the FIAT entity_transformations role
        def coeff_T(cells):
            out = {}
            for c in ci.coefficients:
                if getattr(c.space, "has_dof_transforms", False):
                    out[c.count] = np.asarray(
                        c.space.cell_dof_transforms[cells])
            return out

        def arg_T(arg, cells):
            if arg is not None and getattr(arg.space,
                                           "has_dof_transforms", False):
                return np.asarray(arg.space.cell_dof_transforms[cells])
            return None

        if ci.integral_type == "cell":
            cells = mesh.cell_subset(ci.subdomain_id)
            if len(cells) == 0:
                return None
            # numpy (non-jnp) => stays out of _arg_statics; the
            # distributed executor uses it to localize per shard
            st["_entities"] = np.asarray(cells)
            st["coords_map"] = np.asarray(cmap3[cells])
            st["coeff_maps"] = dofmaps(cells)
            st["coeff_signs"] = coeff_signs(cells)
            st["sign_rows"] = arg_signs(self.test, cells)
            st["sign_cols"] = arg_signs(self.trial, cells)
            st["coeff_T"] = coeff_T(cells)
            st["T_rows"] = arg_T(self.test, cells)
            st["T_cols"] = arg_T(self.trial, cells)
            if self.test is not None:
                st["rows"] = np.asarray(
                    self.test.space.cell_dof_map[cells])
            if self.trial is not None:
                st["cols"] = np.asarray(
                    self.trial.space.cell_dof_map[cells])
            st["n"] = len(cells)
            # sum-factorized (spectral) executor for Q_k on quad/hex
            # cells (compiler/spectral.py; tsfc spectral-mode role)
            from .compiler.spectral import build_spectral_plan
            st["_spectral"] = build_spectral_plan(ci, self.test,
                                                  self.trial)
        elif ci.integral_type == "exterior_facet":
            facets = mesh.boundary_facets(ci.subdomain_id)
            if getattr(ci, "ftype", None) is not None:
                ftypes = np.asarray(mesh.cell.facet_types)
                facets = facets[
                    ftypes[topo.facet_local_id[facets, 0]] == ci.ftype]
            if len(facets) == 0:
                return None
            cells = topo.facet_cells[facets, 0]
            st["_entities"] = np.asarray(cells)   # shard = cell owner
            st["coords_map"] = np.asarray(cmap3[cells])
            st["lf"] = np.asarray(topo.facet_local_id[facets, 0])
            st["coeff_maps"] = dofmaps(cells)
            st["coeff_signs"] = coeff_signs(cells)
            st["sign_rows"] = arg_signs(self.test, cells)
            st["sign_cols"] = arg_signs(self.trial, cells)
            st["coeff_T"] = coeff_T(cells)
            st["T_rows"] = arg_T(self.test, cells)
            st["T_cols"] = arg_T(self.trial, cells)
            if self.test is not None:
                st["rows"] = np.asarray(
                    self.test.space.cell_dof_map[cells])
            if self.trial is not None:
                st["cols"] = np.asarray(
                    self.trial.space.cell_dof_map[cells])
            st["n"] = len(facets)
        elif ci.integral_type == "interior_facet":
            facets = topo.interior_facets
            if ci.subdomain_id not in ("everywhere", None):
                # dS(id): marked interior facets (gmsh physical lines /
                # Mesh.mark_facets), reference: measure subdomain_data
                sd = ci.subdomain_id
                if isinstance(sd, (int, np.integer)):
                    sd = (int(sd),)
                # UNMARKED (= -1, the reference's mesh.py:87 label for
                # untagged facets) selects marker 0 (our untagged value)
                sd = tuple(0 if s == -1 else s for s in sd)
                facets = facets[np.isin(
                    mesh.facet_markers[facets], np.asarray(sd))]
            if getattr(ci, "ftype", None) is not None:
                ftypes = np.asarray(mesh.cell.facet_types)
                facets = facets[
                    ftypes[topo.facet_local_id[facets, 0]] == ci.ftype]
            if len(facets) == 0:
                return None
            cp = topo.facet_cells[facets, 0]
            cm = topo.facet_cells[facets, 1]
            st["_entities"] = np.asarray(cp)      # shard = plus-cell owner
            lfp = topo.facet_local_id[facets, 0]
            lfm = topo.facet_local_id[facets, 1]
            # relative orientation of the minus side:
            # pos[i'] = index of minus-vertex i' in the plus vertex list
            if getattr(ci, "ftype", None) is not None:
                from .elements.reference_cell import by_name
                pidx, nfv = _perm_index_map(
                    mesh.cell, by_name(ci.ftype).num_vertices)
            else:
                pidx, nfv = _perm_index_map(mesh.cell)
            cellfacets = mesh.cell.facets[:, :nfv]
            vp = topo.cell_vertices[cp[:, None], cellfacets[lfp]]
            vm = topo.cell_vertices[cm[:, None], cellfacets[lfm]]
            # vectorized position lookup
            o_rel = np.empty(len(facets), dtype=np.int32)
            eqm = (vm[:, :, None] == vp[:, None, :])   # (ne, nfv, nfv)
            pos = np.argmax(eqm, axis=2)               # (ne, nfv)
            keys = [tuple(row) for row in pos]
            o_rel = np.array([pidx[k] for k in keys], dtype=np.int32)
            st["coords_map_p"] = np.asarray(cmap3[cp])
            st["coords_map_m"] = np.asarray(cmap3[cm])
            st["lf_p"] = np.asarray(lfp)
            st["lf_m"] = np.asarray(lfm)
            st["o_rel"] = np.asarray(o_rel)
            st["coeff_maps_p"] = dofmaps(cp)
            st["coeff_maps_m"] = dofmaps(cm)
            st["coeff_signs_p"] = coeff_signs(cp)
            st["coeff_signs_m"] = coeff_signs(cm)
            st["coeff_T_p"] = coeff_T(cp)
            st["coeff_T_m"] = coeff_T(cm)

            def _cat_T(arg):
                """Block-diag [T(+), T(-)] matching the hstacked rows."""
                Tp_ = arg_T(arg, cp)
                if Tp_ is None:
                    return None
                Tm_ = arg_T(arg, cm)
                Tp_, Tm_ = np.asarray(Tp_), np.asarray(Tm_)
                ne, nd = Tp_.shape[0], Tp_.shape[1]
                out2 = np.zeros((ne, 2 * nd, 2 * nd))
                out2[:, :nd, :nd] = Tp_
                out2[:, nd:, nd:] = Tm_
                return out2
            st["T_rows"] = _cat_T(self.test)
            st["T_cols"] = _cat_T(self.trial)
            def _cat_signs(arg):
                if arg is not None and getattr(arg.space, "has_dof_signs",
                                               False):
                    sg = arg.space.cell_dof_signs
                    return np.hstack([sg[cp], sg[cm]])
                return None
            st["sign_rows"] = _cat_signs(self.test)
            st["sign_cols"] = _cat_signs(self.trial)
            if self.test is not None:
                m = self.test.space.cell_dof_map
                st["rows"] = np.asarray(np.hstack([m[cp], m[cm]]))
            if self.trial is not None:
                m = self.trial.space.cell_dof_map
                st["cols"] = np.asarray(np.hstack([m[cp], m[cm]]))
            st["n"] = len(facets)
        return st

    # ------------------------------------------------------ device program
    def _run(self, coords_dat, coeff_dats, const_vals, arg_statics=None,
             acc=None, nseg=None):
        """nseg overrides the segment count of the sorted accumulation —
        the distributed executor passes per-shard LOCAL sizes (+1 trash
        segment for padding) while reusing this exact program.

        The stencil fast path applies ONLY to self-driven whole-mesh
        runs (arg_statics None): the distributed executor passes
        per-shard statics and must get the general gather program."""
        if self._stencil is not None and arg_statics is None:
            return self._run_stencil(coords_dat, coeff_dats, const_vals)
        if self._column is not None and arg_statics is None:
            return self._run_column(coords_dat, coeff_dats, const_vals)
        prec = self._prec
        if prec is not None:
            # cast BEFORE the gathers: f32 random gathers run ~2.8x
            # faster than (emulated) f64 ones on the v5e
            coords_dat = castf(coords_dat, prec)
            coeff_dats = castf_map(coeff_dats, prec)
            const_vals = castf_map(const_vals, prec)
        rank = self.rank
        statics = arg_statics if arg_statics is not None \
            else self._arg_statics
        if acc is None:
            acc = self._acc_args
        if nseg is None:
            nseg = (self.sparsity.nnz if rank == 2
                    else self.test.space.dim if rank == 1 else 0)
        if rank == 0:
            total = jnp.zeros((), self._cdtype)
        elif rank == 1:
            total = jnp.zeros(nseg, self._cdtype)
        else:
            total = jnp.zeros(self.sparsity.nnz, self._cdtype)
        flats = []          # per-integral local values (gather-table path)
        for ci, st, np_st in zip(self._compiled, statics, self._statics):
            st = self._restore_shapes(st, np_st)
            consts = tuple(const_vals[c.count] for c in ci.constants)
            if "coords_map_T" in st:
                # ---------------- cell-last fast path (compiler/batched)
                kb = ci.cell_kernel_batched()
                ce = coords_dat[st["coords_map_T"]]   # (ndofc, g, C)
                ws = []
                for c in ci.coefficients:
                    w = coeff_dats[c.count][st["coeff_maps_T"][c.count]]
                    sg = st.get("coeff_signs_T", {}).get(c.count)
                    ws.append(w if sg is None else w * sg)
                with trace_ctx(prec):
                    loc = run_cell_kernel(kb, ce, tuple(ws), consts)
                if st.get("sign_rows_T") is not None:
                    loc = loc * st["sign_rows_T"][:, None, :]
                if st.get("sign_cols_T") is not None:
                    loc = loc * st["sign_cols_T"][None, :, :]
                if rank == 0:
                    total = total + jnp.sum(loc)
                elif rank == 1:
                    if acc is not None:
                        # per-slot flat (C,) slices: a concat of flat
                        # pieces keeps the default layout; reshape(-1)
                        # of the tiled (ni, C) array would force a
                        # relayout inside the fused program
                        ni = loc.shape[0]
                        flats.extend(loc[i, 0] for i in range(ni))
                    else:
                        vals = loc[:, 0, :]           # (ni, C)
                        rows_T = st["rows"].T         # (ni, C) index view
                        total = total.at[rows_T.reshape(-1)].add(
                            vals.reshape(-1))
                elif acc is not None:
                    ni, nj = loc.shape[0], loc.shape[1]
                    flats.extend(loc[i, j] for i in range(ni)
                                 for j in range(nj))  # slot-major (k, C)
                else:
                    total = total.at[st["pos_T"].reshape(-1)].add(
                        loc.reshape(-1))
                continue
            kern = ci.kernel()
            nco = len(ci.coefficients)
            def _signed(c, gathered, signs, Ts=None):
                sg = signs.get(c.count)
                if sg is not None:
                    return gathered * castf(sg, prec)
                T = Ts.get(c.count) if Ts else None
                if T is not None:
                    # local coefficients = B @ canonical (tet faces etc.)
                    return _small_einsum("cij,cj->ci", castf(T, prec),
                                         gathered)
                return gathered

            if ci.integral_type == "cell":
                ce = coords_dat[st["coords_map"]]      # (ne, ndofc, g)
                coeffs = tuple(
                    _signed(c, coeff_dats[c.count][
                        st["coeff_maps"][c.count]], st["coeff_signs"],
                        st.get("coeff_T"))
                    for c in ci.coefficients)
                sp = np_st.get("_spectral")
                with trace_ctx(prec):
                    if sp is not None:
                        loc = sp.local_tensors(ce, coeffs, consts)
                    else:
                        loc = jax.vmap(
                            lambda c, *w: kern(c, w, consts))(ce, *coeffs)
            elif ci.integral_type == "exterior_facet":
                ce = coords_dat[st["coords_map"]]
                coeffs = tuple(
                    _signed(c, coeff_dats[c.count][
                        st["coeff_maps"][c.count]], st["coeff_signs"],
                        st.get("coeff_T"))
                    for c in ci.coefficients)
                with trace_ctx(prec):
                    loc = jax.vmap(
                        lambda c, l, *w: kern(c, l, w, consts)
                    )(ce, st["lf"], *coeffs)
            else:
                cpn = coords_dat[st["coords_map_p"]]
                cmn = coords_dat[st["coords_map_m"]]
                coeffs_p = tuple(
                    _signed(c, coeff_dats[c.count][
                        st["coeff_maps_p"][c.count]],
                        st["coeff_signs_p"], st.get("coeff_T_p"))
                    for c in ci.coefficients)
                coeffs_m = tuple(
                    _signed(c, coeff_dats[c.count][
                        st["coeff_maps_m"][c.count]],
                        st["coeff_signs_m"], st.get("coeff_T_m"))
                    for c in ci.coefficients)
                with trace_ctx(prec):
                    loc = jax.vmap(
                        lambda a, b, lp, lm, o, *w: kern(
                            a, b, lp, lm, o, w[:nco], w[nco:], consts)
                    )(cpn, cmn, st["lf_p"], st["lf_m"], st["o_rel"],
                      *coeffs_p, *coeffs_m)
            # H(div)/H(curl) facet-dof sign flips on argument slots
            if st.get("sign_rows") is not None:
                loc = loc * castf(st["sign_rows"], prec)[:, :, None]
            if st.get("sign_cols") is not None:
                loc = loc * castf(st["sign_cols"], prec)[:, None, :]
            # matrix entity transforms: A_can = B_r^T A_loc B_c
            if st.get("T_rows") is not None:
                loc = _small_einsum("cip,cij->cpj",
                                    castf(st["T_rows"], prec), loc)
            if st.get("T_cols") is not None:
                loc = _small_einsum("cpj,cjq->cpq", loc,
                                    castf(st["T_cols"], prec))
            if rank == 0:
                total = total + jnp.sum(widen(loc))
            elif rank == 1:
                vals = loc[:, :, 0]
                if acc is not None:
                    # reduced dtype flats: the accumulation's value
                    # gathers then move narrow elements; widened to f64
                    # AFTER the gather, BEFORE the sums
                    flats.append(vals.reshape(-1))
                else:
                    total = total.at[st["rows"].reshape(-1)].add(
                        widen(vals).reshape(-1))
            elif acc is not None:
                flats.append(loc.reshape(-1))         # cell-major (C, k)
            else:
                total = total.at[st["pos"]].add(widen(loc).reshape(-1))
        if acc is not None and rank >= 1 and flats:
            flat = flats[0] if len(flats) == 1 else jnp.concatenate(flats)
            if "perm" in acc:
                # sorted-permutation accumulation: ONE flat gather + ONE
                # sorted segment-sum (both ~memory-bandwidth on TPU);
                # f64 accumulation on top of reduced-dtype gathers
                total = jax.ops.segment_sum(
                    widen(flat[acc["perm"]]), acc["seg"],
                    num_segments=nseg, indices_are_sorted=True)
            else:
                flat = jnp.concatenate(
                    [flat, jnp.zeros(1, flat.dtype)])
                total = sum(widen(flat[c]) for c in acc["tbl_cols"])
                if "tblx_cols" in acc:
                    extra = sum(widen(flat[c]) for c in acc["tblx_cols"])
                    total = total.at[acc["rows_x"]].add(
                        extra, unique_indices=True)
        return total

    def _run_column(self, coords_dat, coeff_dats, const_vals):
        """Extruded-mesh device program: column row gathers + strided
        z-slices in, row scatters out (assembly/columns.py)."""
        plan = self._column
        prec = self._prec
        if prec is not None:
            coords_dat = castf(coords_dat, prec)
            coeff_dats = castf_map(coeff_dats, prec)
            const_vals = castf_map(const_vals, prec)
        loc = None
        for ci in self._compiled:
            kb = ci.cell_kernel_batched()
            consts = tuple(const_vals[c.count] for c in ci.constants)
            ce, ws = plan.gather_cell_inputs(coords_dat, coeff_dats, ci)
            with trace_ctx(prec):
                li = run_cell_kernel(kb, ce, ws, consts,
                                     chunk=_kernel_chunk(ci, ce))
            loc = li if loc is None else loc + li
        if prec is not None:
            loc = widen(loc)              # f64 pad/scatter accumulation
        if self.rank == 2:
            return plan.accumulate_rank2(loc)
        return plan.accumulate_rank1(loc)

    def _run_stencil(self, coords_dat, coeff_dats, const_vals,
                     diag_only=False):
        """Structured-mesh device program: static slices in, lax.pad
        accumulation out — zero gathers/scatters (assembly/stencil.py)."""
        plan = self._stencil
        prec = self._prec
        if prec is not None:
            coords_dat = castf(coords_dat, prec)
            coeff_dats = castf_map(coeff_dats, prec)
            const_vals = castf_map(const_vals, prec)
        locs = [None] * plan.ntypes
        for ci in self._compiled:
            kb = ci.cell_kernel_batched()
            consts = tuple(const_vals[c.count] for c in ci.constants)
            for t in range(plan.ntypes):
                ce, ws = plan.gather_cell_inputs(t, coords_dat, coeff_dats,
                                                 ci)
                with trace_ctx(prec):
                    loc = run_cell_kernel(kb, ce, ws, consts,
                                          chunk=_kernel_chunk(ci, ce))
                locs[t] = loc if locs[t] is None else locs[t] + loc
        if prec is not None:
            locs = [widen(l) for l in locs]   # f64 pad-add accumulation
        if diag_only:
            return plan.accumulate_diag(locs)
        if self.rank == 2:
            return plan.accumulate_rank2(locs)
        return plan.accumulate_rank1(locs)

    def assemble_diagonal(self):
        """diag(A) of a rank-2 form WITHOUT materializing the operator
        (reference role: ImplicitMatrix getDiagonal,
        matrix_free/operators.py).  Stencil meshes accumulate only the
        zero-offset channel; other executors assemble and extract."""
        assert self.rank == 2, "assemble_diagonal needs a bilinear form"
        coords_dat = jnp.asarray(self.mesh.coordinates.dat)
        coeff_dats = {c.count: jnp.asarray(c.dat)
                      for c in self.coefficients}
        const_vals = {c.count: jnp.asarray(c.values())
                      for c in self.constants}
        if self._stencil is not None:
            if self._jitted_diag is None:
                self._jitted_diag = jax.jit(
                    lambda c, w, v: self._run_stencil(c, w, v,
                                                      diag_only=True))
            return self._jitted_diag(coords_dat, coeff_dats, const_vals)
        return self.assemble().diagonal()

    # ------------------------------------------------------------- public
    def assemble(self, tensor=None):
        coords_dat = jnp.asarray(self.mesh.coordinates.dat)
        coeff_dats = {c.count: jnp.asarray(c.dat)
                      for c in self.coefficients}
        const_vals = {c.count: jnp.asarray(c.values())
                      for c in self.constants}
        out = self._jitted(
            coords_dat, coeff_dats, const_vals,
            None if (self._stencil is not None
                     or self._column is not None) else self._arg_statics,
            self._acc_args)
        return self._postprocess(out, tensor)

    def _postprocess(self, out, tensor):
        rank = self.rank
        if rank == 0:
            return complex(out) if self._cdtype == jnp.complex128 \
                else float(out)
        if rank == 1:
            for bc in self.bcs:
                if self.zero_bc_nodes:
                    out = bc.zero(out)
                else:
                    out = bc.apply(out)
            if tensor is not None:
                tensor.dat = out
                return tensor
            f = Cofunction(self.test.space)
            f.dat = out
            return f
        if self._stencil is not None:
            from .assembly.stencil import StencilMatrix
            mat = StencilMatrix(self._stencil, out, self.test.space,
                                self.trial.space, self.bcs)
        elif self._column is not None:
            from .assembly.columns import ColumnMatrix
            mat = ColumnMatrix(self._column, out, self.test.space,
                               self.trial.space, self.bcs)
        else:
            mat = Matrix(self.sparsity, out, self.test.space,
                         self.trial.space, self.bcs)
        if self.bcs:
            rows = np.unique(np.concatenate(
                [bc.dof_indices for bc in self.bcs]))
            mat = mat.with_dirichlet(jnp.asarray(rows))
        return mat


def _bc_key(bcs):
    return tuple((id(bc.function_space_obj), str(bc.sub_domain),
                  bc.sub_component) for bc in bcs)


def get_assembler(form: Form, bcs=None, mat_type="aij",
                  zero_bc_nodes=False) -> FormAssembler:
    import os as _os
    bcs = as_bcs(bcs)
    from .mixed import split_mixed_terminals
    form = split_mixed_terminals(form)
    # constants must key the cache alongside coefficients: signature()
    # renumbers Constant terminals structurally, and the assembler binds
    # ITS form's Constant objects (values read at call time by count) —
    # without this, assemble(Constant(3)*dx) after assemble(Constant(2)
    # *dx) replayed the first program with the first constant's value
    # (caught by the round-5 acceptance battery, test_facet_normal port)
    key = (form.signature(), id(form.mesh()), _bc_key(bcs), mat_type,
           zero_bc_nodes, _os.environ.get("FDTPU_PREC", ""),
           tuple(id(c) for c in form.coefficients()),
           tuple(c.count for c in form.constants()))
    if key not in _assembler_cache:
        cls = MixedFormAssembler if _form_is_mixed(form) else FormAssembler
        _assembler_cache[key] = cls(form, bcs, mat_type, zero_bc_nodes)
    else:
        _assembler_cache[key].bcs = bcs
    return _assembler_cache[key]


def assemble(form, tensor=None, bcs=None, mat_type="aij",
             zero_bc_nodes=False, diagonal=False, **kwargs):
    """Assemble a 0/1/2-form (reference: firedrake/assemble.py:48).
    `diagonal=True` on a bilinear form returns the matrix diagonal as a
    Cofunction without materializing the matrix (reference assemble's
    diagonal kwarg; backed by FormAssembler.assemble_diagonal)."""
    if isinstance(form, (int, float)):
        return float(form)
    if not isinstance(form, Form):
        raise TypeError(f"cannot assemble {type(form)}")
    if form.empty():
        return 0.0
    if diagonal:
        assembler = get_assembler(form, bcs, mat_type, zero_bc_nodes)
        d = assembler.assemble_diagonal()
        test = [a for a in form.arguments() if a.number == 0][0]
        out = Cofunction(test.space)
        out.dat = d
        return out
    if getattr(form.mesh(), "is_vertex_only", False):
        from .vertexonly import vom_assemble
        return vom_assemble(form)
    assembler = get_assembler(form, bcs, mat_type, zero_bc_nodes)
    result = assembler.assemble(tensor=tensor)
    if isinstance(result, float):
        from .adjoint.tape import (annotate_tape, get_working_tape,
                                   FunctionalBlock, AdjFloat)
        if annotate_tape():
            block = FunctionalBlock(form, result)
            get_working_tape().add_block(block)
            return AdjFloat(result, block)
    return result


# ------------------------------------------------------------ mixed spaces
def _form_is_mixed(form: Form):
    for it in form.integrals():
        for t in it.integrand.traverse():
            if isinstance(t, Argument) and t.part is not None:
                return True
    return False


class MixedFormAssembler:
    """Block-wise assembly over mixed spaces: each block is extracted
    symbolically (mixed.extract_block, the multilinearity trick replacing
    formmanipulation.py split_form) and assembled with the scalar-path
    FormAssembler."""

    def __init__(self, form: Form, bcs=(), mat_type="aij",
                 zero_bc_nodes=False):
        from .mixed import (extract_block, form_parts, BlockMatrix,
                            MixedFunctionSpace)
        self.form = form
        self.bcs = as_bcs(bcs)
        self.zero_bc_nodes = zero_bc_nodes
        args = form.arguments()
        numbers = sorted({a.number for a in args})
        self.rank = len(numbers)
        tests = [a for a in args if a.number == 0]
        trials = [a for a in args if a.number == 1]
        self.W_test = tests[0].space.parent if tests else None
        self.W_trial = trials[0].space.parent if trials else None
        self.mesh = form.mesh()

        self.block_assemblers = {}
        if self.rank == 2:
            for i in range(self.W_test.num_sub_spaces):
                for j in range(self.W_trial.num_sub_spaces):
                    bf = extract_block(form, i, j)
                    if not bf.empty():
                        # BlockMatrix consumers need CSR blocks
                        self.block_assemblers[(i, j)] = FormAssembler(
                            bf, use_stencil=False)
        elif self.rank == 1:
            for i in range(self.W_test.num_sub_spaces):
                bf = extract_block(form, i, None)
                if not bf.empty():
                    self.block_assemblers[(i,)] = FormAssembler(bf)
        else:
            raise ValueError("0-forms cannot contain arguments")

    def assemble(self, tensor=None):
        import jax.numpy as _jnp
        from .mixed import BlockMatrix
        if self.rank == 2:
            blocks = {k: a.assemble() for k, a in
                      self.block_assemblers.items()}
            mat = BlockMatrix(self.W_test, self.W_trial, blocks)
            if self.bcs:
                rows = np.unique(np.concatenate(
                    [bc.dof_indices for bc in self.bcs]))
                mat = mat.with_dirichlet(rows)
            mat.bcs = self.bcs
            return mat
        # rank 1: concatenated vector
        outs = []
        for i, Vi in enumerate(self.W_test.subspaces):
            a = self.block_assemblers.get((i,))
            if a is None:
                outs.append(_jnp.zeros(Vi.dim))
            else:
                outs.append(_jnp.asarray(a.assemble().dat))
        out = _jnp.concatenate(outs)
        for bc in self.bcs:
            if self.zero_bc_nodes:
                out = bc.zero(out)
            else:
                out = bc.apply(out)
        if tensor is not None:
            tensor.dat = out
            return tensor
        from .function import MixedFunction
        f = MixedFunction(self.W_test)
        f.dat = np.asarray(out)
        return f
