"""Structured-mesh stencil assembly: the zero-gather TPU fast path.

On structured utility meshes (RectangleMesh/BoxMesh & friends) every
cell->dof relation is a fixed grid offset, so assembly needs NO index
arrays at all: coefficient/coordinate gathers become static strided
slices of the dof grid, and matrix accumulation becomes a handful of
`lax.pad` + elementwise adds into per-offset stencil channels.  This
removes the ~16-43 ns/element element-serial XLA gather that PERF_NOTES
round 2b measured as the assembly wall, and it is the role PyOP2's
generated wrappers play for the reference (reference:
pyop2/codegen/builder.py:702 builds the per-form gather/scatter wrapper;
firedrake/mesh.py:578 reorders dofs for locality — here locality is
exact by construction).

Dimension-generic: 2D (tri_left/tri_right/quad) and 3D (tet6 = the
Freudenthal/Kuhn 6-tet cube subdivision, hex).  Per-cell-type vertex
offsets are DERIVED from the mesh's own (post-orientation-forcing)
cell_vertices, so the positive-orientation vertex swaps applied at mesh
build (mesh/geometry.py _fix_simplex_orientation) are handled
automatically.

The assembled operator is a `StencilMatrix`: data stored as
(nchannels, *grid) per-offset planes (grid axes reversed: (gz, gy, gx));
SpMV is shifted elementwise multiply-adds (pure HBM bandwidth, no
gathers).

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
_KIND_NTYPES = {"quad": 1, "tri_left": 2, "tri_right": 2,
                "hex": 1, "tet6": 6}


def struct_dims(s):
    """Per-axis cell counts (nx, ny[, nz]) of structured metadata."""
    if "nz" in s:
        return (s["nx"], s["ny"], s["nz"])
    return (s["nx"], s["ny"])


def type_vertex_offsets(mesh):
    """Per cell type, the unit-cube (dx, dy[, dz]) offsets of its
    vertices in the mesh's OWN local order (so orientation-forcing
    vertex swaps at mesh build are reflected), derived from cells
    0..ntypes-1 (the cube/quad at the grid origin; mesh/utility.py
    orders cells c = ntypes*q + t).  None when underivable."""
    cached = mesh.__dict__.get("_grid_tverts", "missing")
    if cached != "missing":
        return cached
    out = _derive_tverts(mesh)
    mesh.__dict__["_grid_tverts"] = out
    return out


def _derive_tverts(mesh):
    s = getattr(mesh, "_structured", None)
    if s is None:
        return None
    dims = struct_dims(s)
    D = len(dims)
    ntypes = _KIND_NTYPES.get(s["kind"])
    if ntypes is None:
        return None
    cv = np.asarray(mesh.topology.cell_vertices[:ntypes], dtype=np.int64)
    offs = []
    for t in range(ntypes):
        o = []
        for v in cv[t]:
            rem = int(v)
            co = []
            for ax in range(D):
                co.append(rem % (dims[ax] + 1))
                rem //= (dims[ax] + 1)
            if rem != 0:
                return None
            o.append(tuple(co))
        offs.append(o)
    arr = np.asarray(offs)
    if arr.min() < 0 or arr.max() > 1:
        return None
    return offs


def grid_slot_offsets(elem, tverts):
    """Per cell type, the fine-grid offset tuple of every local dof of a
    Lagrange element (nodes must sit on the k-lattice), or None."""
    if tverts is None:
        return None
    D = len(tverts[0][0])
    nodes = np.asarray(elem.nodes, dtype=np.float64)
    if nodes.ndim != 2 or nodes.shape[1] != D:
        return None
    k = elem.degree
    offs = []
    for vertsts in tverts:
        pos = _map_ref_points(vertsts, nodes)
        if pos is None:
            return None
        fo = np.rint(k * pos).astype(np.int64)
        if not np.allclose(k * pos, fo, atol=1e-9):
            return None                                  # non-lattice nodes
        offs.append([tuple(map(int, p)) for p in fo])
    return offs


def _map_ref_points(verts, pts):
    """Image of reference points under the cell's vertex map: affine for
    a simplex (D+1 verts), multilinear for a hypercube (2^D verts)."""
    V = np.asarray(verts, dtype=np.float64)
    D = V.shape[1]
    pts = np.asarray(pts, dtype=np.float64)
    if len(V) == D + 1:                                  # affine simplex
        E = (V[1:] - V[:1]).T                            # (D, D)
        return V[0][None] + pts @ E.T
    if len(V) == 2 ** D:                                 # multilinear cube
        out = np.zeros((len(pts), D))
        for c in range(len(V)):
            w = np.ones(len(pts))
            for ax in range(D):
                w = w * (pts[:, ax] if V[c, ax] > 0.5 else 1.0 - pts[:, ax])
            out += w[:, None] * V[c][None]
        return out
    return None


def parity_class_weights(tverts, p):
    """P1 interpolation weights of the fine-grid point at half-integer
    parity class p (in {0,1}^D, quad units p/2) over coarse vertex
    offsets: [(offset_tuple, weight)].  Drives structured refinement
    and grid transfers; any containing cell type gives the same values
    (P1 continuity across shared entities)."""
    D = len(p)
    pt = np.asarray(p, dtype=np.float64) / 2.0
    for verts in tverts:
        V = np.asarray(verts, dtype=np.float64)
        if len(V) == D + 1:
            E = (V[1:] - V[:1]).T
            lam = np.linalg.solve(E, pt - V[0])
            if lam.min() < -1e-12 or lam.sum() > 1 + 1e-12:
                continue
            w = np.concatenate([[1.0 - lam.sum()], lam])
        else:
            w = np.ones(len(V))
            for c in range(len(V)):
                for ax in range(D):
                    w[c] *= pt[ax] if V[c, ax] > 0.5 else 1.0 - pt[ax]
        out = {}
        for c in range(len(V)):
            if abs(w[c]) > 1e-14:
                key = tuple(int(round(x)) for x in V[c])
                out[key] = out.get(key, 0.0) + w[c]
        return sorted(out.items())
    raise AssertionError(f"parity class {p} not inside any cell type")


class _SpaceGrid:
    """Grid-affine dof layout of a function space on a structured mesh:
    node id = sum_ax gi_ax * prod(gdims[:ax]), with per-cell-type
    fine-grid slot offsets."""

    def __init__(self, gdims, k, offs, bs):
        self.gdims = tuple(gdims)          # (gnx, gny[, gnz]) axis order
        self.k, self.offs, self.bs = k, offs, bs

    @property
    def plane_shape(self):                 # device plane: reversed axes
        return tuple(reversed(self.gdims))

    # 2D-compat accessors (bench/scripts introspection)
    @property
    def gnx(self):
        return self.gdims[0]

    @property
    def gny(self):
        return self.gdims[1]


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
    tverts = type_vertex_offsets(V.mesh_obj)
    offs = grid_slot_offsets(elem, tverts)
    if offs is None:
        return None
    dims = struct_dims(s)
    gdims = tuple(k * n + 1 for n in dims)
    sg = _SpaceGrid(gdims, k, offs, V.block_size)
    if not _verify_grid(V, s, sg):
        return None
    return sg


def _cell_grid_index(q, dims):
    """Decompose mesh quad/cube index q (x slowest, last axis fastest —
    mesh/utility.py meshgrid 'ij' ravel order) into per-axis indices."""
    idx = [None] * len(dims)
    rem = q
    for ax in reversed(range(len(dims))):
        idx[ax] = rem % dims[ax]
        rem = rem // dims[ax]
    return idx


def _verify_grid(V, s, sg):
    """Full vectorized check that cell_node_map matches the grid
    prediction (guards against any cell/vertex renumbering).  Cache
    keyed by the map's identity: RestrictedFunctionSpace shares sdata
    with its base space but carries a different (renumbered) map."""
    cnm_id = id(V.cell_node_map)
    cache = getattr(V.sdata, "_grid_ok", None)
    if cache is not None and cache[0] == cnm_id:
        return cache[1]
    dims = struct_dims(s)
    D = len(dims)
    ntypes = len(sg.offs)
    cnm = V.cell_node_map                                # (ncell, nd)
    ok = cnm.shape[0] == ntypes * int(np.prod(dims))
    if ok:
        c = np.arange(cnm.shape[0])
        t = c % ntypes
        qidx = _cell_grid_index(c // ntypes, dims)       # per-axis (ncell,)
        offs = np.asarray(sg.offs)                       # (nt, nd, D)
        strides = np.cumprod((1,) + sg.gdims[:-1])       # (D,)
        pred = np.zeros_like(cnm, dtype=np.int64)
        for ax in range(D):
            o = offs[t][:, :, ax]                        # (ncell, nd)
            pred += (qidx[ax][:, None] * sg.k + o) * strides[ax]
        ok = bool(np.array_equal(cnm.astype(np.int64), pred))
    V.sdata._grid_ok = (cnm_id, ok)
    return ok


# ------------------------------------------------------------------ plan
class StencilPlan:
    """Static slice/pad schedule for one form on a structured mesh."""

    def __init__(self, asm, s, test_g, trial_g, coeff_g):
        self.mesh = asm.mesh
        self.s = s
        self.dims = struct_dims(s)               # (nx, ny[, nz])
        self.D = len(self.dims)
        tverts = type_vertex_offsets(asm.mesh)
        self.ntypes = len(tverts)
        self.test_g = test_g
        self.trial_g = trial_g
        self.coeff_g = coeff_g                   # {count: _SpaceGrid}
        self.rank = asm.rank
        # coordinates are vector P1 on the vertex grid
        self.coord_g = _SpaceGrid(tuple(n + 1 for n in self.dims), 1,
                                  tverts, asm.mesh.geometric_dimension)
        if self.rank == 2:
            self._plan_channels()

    # 2D-compat accessors
    @property
    def nx(self):
        return self.dims[0]

    @property
    def ny(self):
        return self.dims[1]

    def _plan_channels(self):
        """Channel = fine-grid offset (col - row).  Contributions grouped
        per channel: (t, i, j, row_off_tuple)."""
        chans = {}
        nd_r = len(self.test_g.offs[0])
        nd_c = len(self.trial_g.offs[0])
        for t in range(self.ntypes):
            for i in range(nd_r):
                oR = self.test_g.offs[t][i]
                for j in range(nd_c):
                    oC = self.trial_g.offs[t][j]
                    ch = tuple(oC[ax] - oR[ax] for ax in range(self.D))
                    chans.setdefault(ch, []).append((t, i, j, oR))
        self.channels = sorted(chans)            # list of offset tuples
        self.contribs = [chans[ch] for ch in self.channels]
        self.diag_channel = self.channels.index((0,) * self.D)

    # --------------------------------------------------- device programs
    def _planes(self, dat, sg):
        """Flat dof vector -> list of bs component planes (reversed-axis
        shape)."""
        bs = sg.bs
        shape = sg.plane_shape
        if bs == 1:
            return [dat.reshape(shape)]
        return [dat[d::bs].reshape(shape) for d in range(bs)]

    def _slot(self, plane, off, k):
        """Dof-grid plane -> flat (C,) cell-slot values via a strided
        static slice (the zero-gather replacement for dof-map gathers)."""
        starts = tuple(off[ax] for ax in reversed(range(self.D)))
        limits = tuple(off[ax] + k * (self.dims[ax] - 1) + 1
                       for ax in reversed(range(self.D)))
        v = jax.lax.slice(plane, starts, limits, (k,) * self.D)
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

    def _cell_plane_shape(self):
        return tuple(reversed(self.dims))

    def _place(self, v, off, sg):
        """Place a per-cell plane at fine offset tuple `off` with stride
        k into the dof grid — ONE lax.pad (interior padding = the
        stride), no scatter."""
        k = sg.k
        cfg = tuple(
            (off[ax], sg.gdims[ax] - (off[ax] + k * (self.dims[ax] - 1) + 1),
             k - 1)
            for ax in reversed(range(self.D)))
        return jax.lax.pad(v, jnp.zeros((), v.dtype), cfg)

    def accumulate_rank2(self, locs):
        """locs[t]: (ni, nj, C) local tensors -> (nch, *plane_shape)."""
        sg = self.test_g
        cshape = self._cell_plane_shape()
        planes = []
        for contribs in self.contribs:
            acc = None
            for (t, i, j, oR) in contribs:
                v = self._place(locs[t][i, j].reshape(cshape), oR, sg)
                acc = v if acc is None else acc + v
            planes.append(acc)
        return jnp.stack(planes)

    def accumulate_rank1(self, locs):
        sg = self.test_g
        cshape = self._cell_plane_shape()
        acc = None
        for t in range(self.ntypes):
            ni = locs[t].shape[0]
            for i in range(ni):
                v = self._place(locs[t][i, 0].reshape(cshape),
                                sg.offs[t][i], sg)
                acc = v if acc is None else acc + v
        return acc.reshape(-1)

    def accumulate_diag(self, locs):
        """Only the (0,...,0) channel — the operator diagonal as a flat
        dof vector, without materializing the other channels (feeds
        matrix-free Jacobi/Chebyshev smoothing, assembly/matfree.py)."""
        sg = self.test_g
        cshape = self._cell_plane_shape()
        acc = None
        for (t, i, j, oR) in self.contribs[self.diag_channel]:
            v = self._place(locs[t][i, j].reshape(cshape), oR, sg)
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
    tverts = type_vertex_offsets(mesh)
    if tverts is None:
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
            cshape = (len(tverts[0]), g, C)
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
    planes (nch, *grid).  Fills the Matrix role (matvec/diagonal/
    with_dirichlet/to_scipy) with shift-based, gather-free kernels
    (reference semantics: firedrake/matrix.py:48 over pyop2 Mat)."""

    def __init__(self, plan: StencilPlan, channels, row_space=None,
                 col_space=None, bcs=()):
        self.plan = plan
        self.channels = channels                  # (nch, *plane) device
        self.offsets = plan.channels              # [offset tuples]
        self.row_space = row_space
        self.col_space = col_space
        self.bcs = tuple(bcs)
        self.gdims = plan.test_g.gdims            # (gnx, gny[, gnz])
        self.D = plan.D

    @property
    def gnx(self):
        return self.gdims[0]

    @property
    def gny(self):
        return self.gdims[1]

    @property
    def plane_shape(self):
        return tuple(reversed(self.gdims))

    @property
    def shape(self):
        n = int(np.prod(self.gdims))
        return (n, n)

    @property
    def dtype(self):
        return self.channels.dtype

    def _margins(self):
        """Per (reversed) axis, the max |offset| over channels."""
        return tuple(max(abs(o[ax]) for o in self.offsets)
                     for ax in reversed(range(self.D)))

    # ---------------------------------------------------------------- ops
    def matvec(self, x):
        x = jnp.asarray(x)
        X = x.reshape(self.plane_shape)
        m = self._margins()
        Xp = jnp.pad(X, tuple((mm, mm) for mm in m))
        y = None
        for ch, off in enumerate(self.offsets):
            starts = tuple(m[a] + off[ax]
                           for a, ax in enumerate(reversed(range(self.D))))
            limits = tuple(st + g for st, g in zip(starts, self.plane_shape))
            sl = jax.lax.slice(Xp, starts, limits)
            term = self.channels[ch] * sl
            y = term if y is None else y + term
        return y.reshape(-1)

    __matmul__ = matvec

    def transpose_matvec(self, y):
        """(A^T y)[p] = sum_off A[off][p - off] * y[p - off] — shifted
        planes, still gather-free."""
        y = jnp.asarray(y)
        Y = y.reshape(self.plane_shape)
        m = self._margins()
        pad = tuple((mm, mm) for mm in m)
        Yp = jnp.pad(Y, pad)
        Cp = jnp.pad(self.channels, ((0, 0),) + pad)
        out = None
        for ch, off in enumerate(self.offsets):
            starts = tuple(m[a] - off[ax]
                           for a, ax in enumerate(reversed(range(self.D))))
            limits = tuple(st + g for st, g in zip(starts, self.plane_shape))
            a = jax.lax.slice(Cp[ch], starts, limits)
            v = jax.lax.slice(Yp, starts, limits)
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
        n = int(np.prod(self.gdims))
        mask = jnp.zeros(n, dtype=self.channels.dtype).at[
            jnp.asarray(bc_rows)].set(1.0).reshape(self.plane_shape)
        keep_r = 1.0 - mask
        m = self._margins()
        Mp = jnp.pad(mask, tuple((mm, mm) for mm in m))
        planes = []
        for ch, off in enumerate(self.offsets):
            a = self.channels[ch] * keep_r
            if symmetric:
                starts = tuple(
                    m[ax_i] + off[ax]
                    for ax_i, ax in enumerate(reversed(range(self.D))))
                limits = tuple(st + g
                               for st, g in zip(starts, self.plane_shape))
                cm = jax.lax.slice(Mp, starts, limits)
                a = a * (1.0 - cm)
            if ch == self.plan.diag_channel:
                a = a + mask                      # unit diagonal on bc rows
            planes.append(a)
        return StencilMatrix(self.plan, jnp.stack(planes), self.row_space,
                             self.col_space, self.bcs)

    # -------------------------------------------------------------- export
    def _index_pairs(self):
        """Host (rows, cols, ch-indices) triplets of in-band entries.
        chs stacks (channel, *reversed-axis grid indices)."""
        grids = np.meshgrid(*[np.arange(g) for g in self.plane_shape],
                            indexing="ij")        # reversed-axis order
        strides = np.cumprod((1,) + self.gdims[:-1])   # per axis
        rows_l, cols_l, chs_l = [], [], []
        for ch, off in enumerate(self.offsets):
            ok = np.ones(self.plane_shape, dtype=bool)
            row = np.zeros(self.plane_shape, dtype=np.int64)
            col = np.zeros(self.plane_shape, dtype=np.int64)
            for ax_i, ax in enumerate(reversed(range(self.D))):
                gi = grids[ax_i]
                cidx = gi + off[ax]
                ok &= (cidx >= 0) & (cidx < self.gdims[ax])
                row += gi * strides[ax]
                col += np.clip(cidx, 0, self.gdims[ax] - 1) * strides[ax]
            rows_l.append(row[ok])
            cols_l.append(col[ok])
            chs_l.append(np.concatenate(
                [np.full((1, ok.sum()), ch)]
                + [g[ok][None] for g in grids], axis=0))
        return (np.concatenate(rows_l), np.concatenate(cols_l),
                np.concatenate(chs_l, axis=1))

    def to_scipy(self):
        from scipy.sparse import coo_matrix
        rows, cols, chs = self._index_pairs()
        dat = np.asarray(self.channels)
        vals = dat[tuple(chs)]
        n = int(np.prod(self.gdims))
        return coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()

    def to_dense(self):
        return self.to_scipy().toarray()

    @property
    def M(self):
        from .matrix import MatView
        return MatView(self)

    def to_dense_device(self):
        n = int(np.prod(self.gdims))
        rows, cols, chs = self._index_pairs()
        vals = self.channels[tuple(jnp.asarray(c) for c in chs)]
        return jnp.zeros((n, n), dtype=self.channels.dtype).at[
            jnp.asarray(rows), jnp.asarray(cols)].add(vals)

    @property
    def nnz(self):
        """CSR-equivalent nonzero count (pattern entries actually touched
        by assembly), for honest flop accounting in benches."""
        if getattr(self.plan, "_nnz", None) is None:
            total = 0
            k = self.plan.test_g.k
            dims = self.plan.dims
            for contribs in self.plan.contribs:
                touched = np.zeros(self.plane_shape, dtype=bool)
                for (t, i, j, oR) in contribs:
                    sl = tuple(
                        slice(oR[ax], oR[ax] + k * (dims[ax] - 1) + 1, k)
                        for ax in reversed(range(self.D)))
                    touched[sl] = True
                total += int(touched.sum())
            self.plan._nnz = total
        return self.plan._nnz

    def __repr__(self):
        return (f"StencilMatrix({self.shape}, nch={len(self.offsets)}, "
                f"grid={self.plane_shape})")
