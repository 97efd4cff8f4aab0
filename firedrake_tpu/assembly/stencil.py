"""Structured-mesh stencil assembly: the zero-gather TPU fast path.

On structured utility meshes (RectangleMesh & friends) every cell->dof
relation is a fixed grid offset, so assembly needs NO index arrays at
all: coefficient/coordinate gathers become static strided slices of the
dof grid, and matrix accumulation becomes a handful of `lax.pad` +
elementwise adds into per-offset stencil channels.  This removes the
~16-43 ns/element element-serial XLA gather that PERF_NOTES round 2b
measured as the assembly wall, and it is the role PyOP2's generated
wrappers play for the reference (reference: pyop2/codegen/builder.py:702
builds the per-form gather/scatter wrapper; firedrake/mesh.py:578
reorders dofs for locality — here locality is exact by construction).

The assembled operator is a `StencilMatrix`: data stored as
(nchannels, gny, gnx) per-offset planes; SpMV is shifted elementwise
multiply-adds (pure HBM bandwidth, no gathers).

Requirements checked by `build_stencil_plan` (falls back to the general
gather path when unmet):
  * mesh built by a structured constructor (mesh._structured metadata),
  * all integrals are cell integrals over "everywhere",
  * test/trial/coefficient spaces are Lagrange with grid-affine dof
    numbering (degree 1 natively; higher degree once the space carries
    a structured grid numbering), no dof signs/transforms.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


# --------------------------------------------------------------- grid maps
def _cell_type_vertices(kind):
    """Per cell type, the quad-unit (dx, dy) offsets of its vertices in
    mesh construction order (mesh/utility.py RectangleMesh)."""
    if kind == "tri_left":
        return [[(0, 0), (1, 0), (0, 1)], [(1, 0), (1, 1), (0, 1)]]
    if kind == "tri_right":
        return [[(0, 0), (1, 0), (1, 1)], [(0, 0), (1, 1), (0, 1)]]
    if kind == "quad":
        return [[(0, 0), (1, 0), (0, 1), (1, 1)]]
    return None


def grid_slot_offsets(elem, kind):
    """Per cell type, the fine-grid (oi, oj) offset of every local dof
    of a Lagrange element (nodes must sit on the k-lattice), or None."""
    tverts = _cell_type_vertices(kind)
    if tverts is None:
        return None
    nodes = np.asarray(elem.nodes, dtype=np.float64)
    if nodes.ndim != 2 or nodes.shape[1] != 2:
        return None
    k = elem.degree
    offs = []
    for verts in tverts:
        V0 = np.asarray(verts[0], dtype=np.float64)
        if len(verts) == 3:                              # affine triangle
            E = np.stack([np.asarray(verts[1]) - V0,
                          np.asarray(verts[2]) - V0]).T  # (2, 2)
            pos = V0[None] + nodes @ E.T
        else:                                            # bilinear quad
            c = [np.asarray(v, dtype=np.float64) for v in verts]
            x, y = nodes[:, 0:1], nodes[:, 1:2]
            pos = (c[0][None] * (1 - x) * (1 - y) + c[1][None] * x * (1 - y)
                   + c[2][None] * (1 - x) * y + c[3][None] * x * y)
        fo = np.rint(k * pos).astype(np.int64)
        if not np.allclose(k * pos, fo, atol=1e-9):
            return None                                  # non-lattice nodes
        offs.append([tuple(map(int, p)) for p in fo])
    return offs


class _SpaceGrid:
    """Grid-affine dof layout of a function space on a structured mesh:
    node id == gi + gj * gnx, with per-cell-type fine-grid slot offsets."""

    def __init__(self, gnx, gny, k, offs, bs):
        self.gnx, self.gny, self.k, self.offs, self.bs = gnx, gny, k, offs, bs


def _space_grid(V, s):
    """_SpaceGrid for V on structured metadata s, or None."""
    elem = V.scalar_element
    if getattr(elem, "family", None) != "Lagrange":
        return None
    if getattr(V, "has_dof_signs", False) or \
            getattr(V, "has_dof_transforms", False):
        return None
    k = elem.degree
    if k != 1 and not getattr(V.sdata, "grid_numbered", False):
        return None
    offs = grid_slot_offsets(elem, s["kind"])
    if offs is None:
        return None
    gnx = k * s["nx"] + 1
    gny = k * s["ny"] + 1
    sg = _SpaceGrid(gnx, gny, k, offs, V.block_size)
    if not _verify_grid(V, s, sg):
        return None
    return sg


def _verify_grid(V, s, sg):
    """Full vectorized check that cell_node_map matches the grid
    prediction (guards against any cell/vertex renumbering).  Cache
    keyed by the map's identity: RestrictedFunctionSpace shares sdata
    with its base space but carries a different (renumbered) map."""
    cnm_id = id(V.cell_node_map)
    cache = getattr(V.sdata, "_grid_ok", None)
    if cache is not None and cache[0] == cnm_id:
        return cache[1]
    nx, ny = s["nx"], s["ny"]
    ntypes = len(sg.offs)
    cnm = V.cell_node_map                                # (ncell, nd)
    ok = cnm.shape[0] == ntypes * nx * ny
    if ok:
        c = np.arange(cnm.shape[0])
        t = c % ntypes
        q = c // ntypes
        qi, qj = q // ny, q % ny                         # x-major quads
        offs = np.asarray([sg.offs[tt] for tt in range(ntypes)])  # (nt,nd,2)
        oi = offs[t][:, :, 0]                            # (ncell, nd)
        oj = offs[t][:, :, 1]
        pred = (qi[:, None] * sg.k + oi) + (qj[:, None] * sg.k + oj) * sg.gnx
        ok = bool(np.array_equal(cnm.astype(np.int64), pred))
    V.sdata._grid_ok = (cnm_id, ok)
    return ok


# ------------------------------------------------------------------ plan
class StencilPlan:
    """Static slice/pad schedule for one form on a structured mesh."""

    def __init__(self, asm, s, test_g, trial_g, coeff_g):
        self.mesh = asm.mesh
        self.s = s
        self.nx, self.ny = s["nx"], s["ny"]
        self.ntypes = len(_cell_type_vertices(s["kind"]))
        self.test_g = test_g
        self.trial_g = trial_g
        self.coeff_g = coeff_g                   # {count: _SpaceGrid}
        self.rank = asm.rank
        # coordinates are vector P1 on the vertex grid
        self.coord_g = _SpaceGrid(self.nx + 1, self.ny + 1, 1,
                                  _cell_type_vertices(s["kind"]),
                                  asm.mesh.geometric_dimension)
        if self.rank == 2:
            self._plan_channels()

    def _plan_channels(self):
        """Channel = fine-grid offset (col - row).  Contributions grouped
        per channel: (t, i, j, row_oi, row_oj)."""
        chans = {}
        nd_r = len(self.test_g.offs[0])
        nd_c = len(self.trial_g.offs[0])
        for t in range(self.ntypes):
            for i in range(nd_r):
                oiR, ojR = self.test_g.offs[t][i]
                for j in range(nd_c):
                    oiC, ojC = self.trial_g.offs[t][j]
                    ch = (oiC - oiR, ojC - ojR)
                    chans.setdefault(ch, []).append((t, i, j, oiR, ojR))
        self.channels = sorted(chans)            # list of (doi, doj)
        self.contribs = [chans[ch] for ch in self.channels]
        self.diag_channel = self.channels.index((0, 0))

    # --------------------------------------------------- device programs
    def _planes(self, dat, sg):
        """Flat dof vector -> list of bs (gny, gnx) component planes."""
        bs = sg.bs
        if bs == 1:
            return [dat.reshape(sg.gny, sg.gnx)]
        return [dat[d::bs].reshape(sg.gny, sg.gnx) for d in range(bs)]

    def _slot(self, plane, off, k):
        """(gny, gnx) plane -> flat (C,) cell-slot values via a strided
        static slice (the zero-gather replacement for dof-map gathers)."""
        oi, oj = off
        ny, nx = self.ny, self.nx
        v = jax.lax.slice(plane, (oj, oi),
                          (oj + k * (ny - 1) + 1, oi + k * (nx - 1) + 1),
                          (k, k))
        return v.reshape(-1)

    def gather_cell_inputs(self, t, coords_dat, coeff_dats, ci):
        """Kernel inputs for cell type t: coords (ndofc, g, C), coeffs
        tuple of (nslot, C) — all built from static slices."""
        cg = self.coord_g
        planes = self._planes(coords_dat, cg)
        ce = jnp.stack([
            jnp.stack([self._slot(planes[d], off, cg.k)
                       for d in range(cg.bs)])
            for off in cg.offs[t]])
        ws = []
        for c in ci.coefficients:
            sg = self.coeff_g[c.count]
            p = self._planes(coeff_dats[c.count], sg)
            ws.append(jnp.stack([
                self._slot(p[d], off, sg.k)
                for off in sg.offs[t] for d in range(sg.bs)]))
        return ce, tuple(ws)

    def _place(self, v2d, oi, oj, sg):
        """Place a (ny, nx) per-cell plane at fine offset (oi, oj) with
        stride k into the (gny, gnx) dof grid — ONE lax.pad (interior
        padding = the stride), no scatter."""
        k = sg.k
        hi_j = sg.gny - (oj + k * (self.ny - 1) + 1)
        hi_i = sg.gnx - (oi + k * (self.nx - 1) + 1)
        return jax.lax.pad(v2d, jnp.zeros((), v2d.dtype),
                           ((oj, hi_j, k - 1), (oi, hi_i, k - 1)))

    def accumulate_rank2(self, locs):
        """locs[t]: (ni, nj, C) local tensors -> (nch, gny, gnx)."""
        sg = self.test_g
        ny, nx = self.ny, self.nx
        planes = []
        for contribs in self.contribs:
            acc = None
            for (t, i, j, oiR, ojR) in contribs:
                v = self._place(locs[t][i, j].reshape(ny, nx), oiR, ojR, sg)
                acc = v if acc is None else acc + v
            planes.append(acc)
        return jnp.stack(planes)

    def accumulate_rank1(self, locs):
        sg = self.test_g
        ny, nx = self.ny, self.nx
        acc = None
        for t in range(self.ntypes):
            ni = locs[t].shape[0]
            for i in range(ni):
                oiR, ojR = sg.offs[t][i]
                v = self._place(locs[t][i, 0].reshape(ny, nx), oiR, ojR, sg)
                acc = v if acc is None else acc + v
        return acc.reshape(-1)


def build_stencil_plan(asm):
    """StencilPlan for a FormAssembler, or None when inapplicable."""
    if os.environ.get("FDTPU_NO_STENCIL") == "1":
        return None
    mesh = asm.mesh
    s = getattr(mesh, "_structured", None)
    if s is None or asm.rank not in (1, 2):
        return None
    if getattr(mesh, "_extruded", False) or \
            getattr(mesh, "is_vertex_only", False):
        return None
    test_g = _space_grid(asm.test.space, s) if asm.test is not None else None
    if asm.rank >= 1 and test_g is None:
        return None
    # block_size > 1 arguments need interleaved channel planes — not yet
    if asm.test.space.block_size != 1:
        return None
    trial_g = None
    if asm.rank == 2:
        trial_g = _space_grid(asm.trial.space, s)
        if trial_g is None or asm.trial.space.block_size != 1:
            return None
    coeff_g = {}
    for ci in asm._compiled:
        if ci.integral_type != "cell":
            return None
        if ci.subdomain_id not in ("everywhere", None):
            return None
        for c in ci.coefficients:
            if c.count not in coeff_g:
                cs = getattr(c, "space", None)
                if cs is None or getattr(cs, "mesh_obj", None) is not mesh:
                    return None
                cg = _space_grid(cs, s)
                if cg is None:
                    return None
                coeff_g[c.count] = cg
        # the stencil path evaluates via the cell-last (batched) lowering;
        # verify it supports this integrand
        try:
            C = 4
            g = mesh.geometric_dimension
            kb = ci.cell_kernel_batched()
            cshape = (len(_cell_type_vertices(s["kind"])[0]), g, C)
            cfshapes = tuple(jax.ShapeDtypeStruct(
                (c.space.cell_dof_map.shape[1], C), jnp.float64)
                for c in ci.coefficients)
            cvals = tuple(jax.ShapeDtypeStruct(
                np.asarray(c.values()).shape, jnp.float64)
                for c in ci.constants)
            jax.eval_shape(kb, jax.ShapeDtypeStruct(cshape, jnp.float64),
                           cfshapes, cvals)
        except NotImplementedError:
            return None
    try:
        return StencilPlan(asm, s, test_g, trial_g, coeff_g)
    except Exception:
        return None


# --------------------------------------------------------------- matrix
class StencilMatrix:
    """Assembled operator on a structured dof grid: per-offset channel
    planes (nch, gny, gnx).  Fills the Matrix role (matvec/diagonal/
    with_dirichlet/to_scipy) with shift-based, gather-free kernels
    (reference semantics: firedrake/matrix.py:48 over pyop2 Mat)."""

    def __init__(self, plan: StencilPlan, channels, row_space=None,
                 col_space=None, bcs=()):
        self.plan = plan
        self.channels = channels                  # (nch, gny, gnx) device
        self.offsets = plan.channels              # [(doi, doj)]
        self.row_space = row_space
        self.col_space = col_space
        self.bcs = tuple(bcs)
        self.gnx = plan.test_g.gnx
        self.gny = plan.test_g.gny

    @property
    def shape(self):
        n = self.gnx * self.gny
        return (n, n)

    @property
    def dtype(self):
        return self.channels.dtype

    # ---------------------------------------------------------------- ops
    def matvec(self, x):
        x = jnp.asarray(x)
        X = x.reshape(self.gny, self.gnx)
        mj = max(abs(o[1]) for o in self.offsets)
        mi = max(abs(o[0]) for o in self.offsets)
        Xp = jnp.pad(X, ((mj, mj), (mi, mi)))
        y = None
        for ch, (doi, doj) in enumerate(self.offsets):
            sl = jax.lax.slice(Xp, (mj + doj, mi + doi),
                               (mj + doj + self.gny, mi + doi + self.gnx))
            term = self.channels[ch] * sl
            y = term if y is None else y + term
        return y.reshape(-1)

    __matmul__ = matvec

    def transpose_matvec(self, y):
        """(A^T y)[p] = sum_off A[off][p - off] * y[p - off] — shifted
        planes, still gather-free."""
        y = jnp.asarray(y)
        Y = y.reshape(self.gny, self.gnx)
        mj = max(abs(o[1]) for o in self.offsets)
        mi = max(abs(o[0]) for o in self.offsets)
        Yp = jnp.pad(Y, ((mj, mj), (mi, mi)))
        Cp = jnp.pad(self.channels, ((0, 0), (mj, mj), (mi, mi)))
        out = None
        for ch, (doi, doj) in enumerate(self.offsets):
            a = jax.lax.slice(Cp[ch], (mj - doj, mi - doi),
                              (mj - doj + self.gny, mi - doi + self.gnx))
            v = jax.lax.slice(Yp, (mj - doj, mi - doi),
                              (mj - doj + self.gny, mi - doi + self.gnx))
            term = a * v
            out = term if out is None else out + term
        return out.reshape(-1)

    def diagonal(self):
        return self.channels[self.plan.diag_channel].reshape(-1)

    def copy(self):
        return StencilMatrix(self.plan, self.channels, self.row_space,
                             self.col_space, self.bcs)

    # ----------------------------------------------------------------- bcs
    def with_dirichlet(self, bc_rows, symmetric=True):
        n = self.gnx * self.gny
        mask = jnp.zeros(n, dtype=self.channels.dtype).at[
            jnp.asarray(bc_rows)].set(1.0).reshape(self.gny, self.gnx)
        keep_r = 1.0 - mask
        mj = max(abs(o[1]) for o in self.offsets)
        mi = max(abs(o[0]) for o in self.offsets)
        Mp = jnp.pad(mask, ((mj, mj), (mi, mi)))
        planes = []
        for ch, (doi, doj) in enumerate(self.offsets):
            a = self.channels[ch] * keep_r
            if symmetric:
                cm = jax.lax.slice(Mp, (mj + doj, mi + doi),
                                   (mj + doj + self.gny, mi + doi + self.gnx))
                a = a * (1.0 - cm)
            if ch == self.plan.diag_channel:
                a = a + mask                      # unit diagonal on bc rows
            planes.append(a)
        return StencilMatrix(self.plan, jnp.stack(planes), self.row_space,
                             self.col_space, self.bcs)

    # -------------------------------------------------------------- export
    def _index_pairs(self):
        """Host (rows, cols, ch) index triplets of in-band entries."""
        gny, gnx = self.gny, self.gnx
        jj, ii = np.meshgrid(np.arange(gny), np.arange(gnx), indexing="ij")
        rows_l, cols_l, chs_l = [], [], []
        for ch, (doi, doj) in enumerate(self.offsets):
            cj, ci_ = jj + doj, ii + doi
            ok = (cj >= 0) & (cj < gny) & (ci_ >= 0) & (ci_ < gnx)
            rows_l.append((jj[ok] * gnx + ii[ok]))
            cols_l.append((cj[ok] * gnx + ci_[ok]))
            chs_l.append(np.stack([np.full(ok.sum(), ch),
                                   jj[ok], ii[ok]], axis=0))
        return (np.concatenate(rows_l), np.concatenate(cols_l),
                np.concatenate(chs_l, axis=1))

    def to_scipy(self):
        from scipy.sparse import coo_matrix
        rows, cols, chs = self._index_pairs()
        dat = np.asarray(self.channels)
        vals = dat[chs[0], chs[1], chs[2]]
        n = self.gnx * self.gny
        return coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()

    def to_dense(self):
        return self.to_scipy().toarray()

    def to_dense_device(self):
        n = self.gnx * self.gny
        rows, cols, chs = self._index_pairs()
        vals = self.channels[jnp.asarray(chs[0]), jnp.asarray(chs[1]),
                             jnp.asarray(chs[2])]
        return jnp.zeros((n, n), dtype=self.channels.dtype).at[
            jnp.asarray(rows), jnp.asarray(cols)].add(vals)

    @property
    def nnz(self):
        """CSR-equivalent nonzero count (pattern entries actually touched
        by assembly), for honest flop accounting in benches."""
        if getattr(self.plan, "_nnz", None) is None:
            gny, gnx = self.gny, self.gnx
            total = 0
            k = self.plan.test_g.k
            ny, nx = self.plan.ny, self.plan.nx
            for contribs in self.plan.contribs:
                touched = np.zeros((gny, gnx), dtype=bool)
                for (t, i, j, oiR, ojR) in contribs:
                    touched[ojR:ojR + k * (ny - 1) + 1:k,
                            oiR:oiR + k * (nx - 1) + 1:k] = True
                total += int(touched.sum())
            self.plan._nnz = total
        return self.plan._nnz

    def __repr__(self):
        return (f"StencilMatrix({self.shape}, nch={len(self.offsets)}, "
                f"grid=({self.gny},{self.gnx}))")
