"""Extruded-mesh column assembly: the TPU dense-axis fast path.

On an extruded mesh every dof column is structured: with the column
renumbering (functionspace.py _maybe_column_renumber) a CG_k node id is
``base_node * Hd + z`` where ``Hd = k*nlay + 1`` is the vertical dof
count and ``z = layer*k + sz`` the vertical fine-lattice position.  The
reference keeps exactly this O(base) metadata instead of materializing
the 3D numbering (reference: pyop2/types/set.py:307 ExtrudedSet layer
extents; firedrake/cython/extrusion_numbering.pyx:222 column offsets;
pyop2 walks columns in the generated wrapper, global_kernel.py:29).

TPU-native consequences (SURVEY §5.7 names the column the dense axis):
  * dof gathers become ROW gathers of whole (Hd,) columns — the per-row
    cost of XLA's element-serial gather is amortized over the dense
    layer minor axis (PERF_NOTES round 2b: random element gathers cost
    ~16-43 ns/element; row gathers with a long minor axis do not);
  * the vertical dof offset is a static strided `lax.slice` — zero
    index arrays on the layer axis;
  * matrix accumulation needs ndof_base^2 scatters of (ncell_base,
    ndz*Hd) ROWS instead of ndof^2 scatters of single elements;
  * the assembled operator (`ColumnMatrix`) is base-ELL x layer-DIA:
    data (nbase, NB, ndz, Hd); SpMV is a row gather plus shifted
    elementwise multiply-adds on the dense layer axis.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


# ------------------------------------------------------- factorization
def column_factorization(elem, base_elem, kz):
    """Factor each local dof of `elem` (on an extruded cell, extrusion
    axis = LAST reference coordinate for quad/hex/prism) into
    (base local dof, vertical fine-lattice index).  Returns (sb, sz)
    int arrays or None when the element does not factor."""
    nodes = np.asarray(getattr(elem, "nodes", None), dtype=np.float64)
    bnodes = np.asarray(getattr(base_elem, "nodes", None),
                        dtype=np.float64)
    if nodes is None or bnodes is None or nodes.ndim != 2:
        return None
    if bnodes.ndim == 1:
        bnodes = bnodes[:, None]
    if nodes.shape[1] != bnodes.shape[1] + 1:
        return None
    zf = nodes[:, -1] * kz
    sz = np.rint(zf).astype(np.int64)
    if not np.allclose(zf, sz, atol=1e-9) or (sz < 0).any() \
            or (sz > kz).any():
        return None
    xy = nodes[:, :-1]
    d2 = np.abs(xy[:, None, :] - bnodes[None, :, :]).max(axis=2)
    sb = d2.argmin(axis=1)
    if (d2[np.arange(len(sb)), sb] > 1e-9).any():
        return None
    # (sb, sz) pairs must be distinct (a bijection onto the product set)
    key = sb * (kz + 1) + sz
    if np.unique(key).size != len(key):
        return None
    return sb.astype(np.int64), sz


class ColumnLayout:
    """O(base) column metadata of a function space on an extruded mesh:
    node id == base_node * Hd + z (the extrusion_numbering.pyx role)."""

    def __init__(self, base_sdata, sb, sz, kz, nlay):
        self.base_sdata = base_sdata
        self.base_map = base_sdata.cell_node_map.astype(np.int64)
        self.sb, self.sz = sb, sz
        self.kz = kz                       # vertical dof stride per layer
        self.nlay = nlay
        self.Hd = kz * nlay + 1
        self.nbase = base_sdata.num_nodes


# ------------------------------------------------------------------ plan
def _space_column(V):
    """ColumnLayout of V, or None (column-numbered scalar spaces only;
    RestrictedFunctionSpace renumbers its map and must fall back)."""
    sd = V.sdata
    col = getattr(sd, "column", None)
    if col is None or not getattr(sd, "column_numbered", False):
        return None
    if V.cell_node_map is not sd.cell_node_map:
        return None
    return col


class ColumnPlan:
    """Device schedule for one form on an extruded mesh: column row
    gathers + strided z-slices in, row scatters out."""

    def __init__(self, asm, test_c, trial_c, coeff_c, coord_c):
        self.mesh = asm.mesh
        self.nlay = int(self.mesh._layers)
        self.ncell_b = self.mesh.num_cells // self.nlay
        self.rank = asm.rank
        self.test_c = test_c
        self.trial_c = trial_c
        self.coeff_c = coeff_c            # {count: (ColumnLayout, bs)}
        self.coord_c = coord_c            # (ColumnLayout, gdim)
        if self.rank == 2:
            self._plan_adjacency()

    # ----------------------------------------------------- host planning
    def _plan_adjacency(self):
        """Base-mesh ELL adjacency + per-cell slot-pair positions."""
        r, c = self.test_c, self.trial_c
        rmap, cmap = r.base_map, c.base_map
        nbr, nbc = r.nbase, c.nbase
        key = (rmap[:, :, None] * nbc + cmap[:, None, :]).ravel()
        uk = np.unique(key)
        row_of, col_of = uk // nbc, uk % nbc
        row_start = np.searchsorted(row_of, np.arange(nbr))
        counts = np.diff(np.append(row_start, len(uk)))
        self.NB = int(counts.max())
        cols_tbl = np.zeros((nbr, self.NB), dtype=np.int64)
        cols_tbl[row_of, np.arange(len(uk)) - row_start[row_of]] = col_of
        self.cols_tbl = cols_tbl
        self.row_counts = counts
        ui = np.searchsorted(uk, key).reshape(rmap.shape[0],
                                              rmap.shape[1], cmap.shape[1])
        self.pos = (ui - row_start[row_of[ui]]).astype(np.int64)
        self.ndz = 2 * max(r.kz, c.kz) + 1
        # diagonal position (row == col) when square
        if nbr == nbc:
            k2 = np.arange(nbr) * nbc + np.arange(nbr)
            di = np.searchsorted(uk, k2)
            ok = (di < len(uk)) & (uk[np.minimum(di, len(uk) - 1)] == k2)
            dpos = np.where(ok, di - row_start, 0)
            self.diag_pos = dpos.astype(np.int64)
        else:
            self.diag_pos = None

    # --------------------------------------------------- device programs
    def _planes(self, dat, col, bs):
        if bs == 1:
            return [dat.reshape(col.nbase, col.Hd)]
        return [dat[d::bs].reshape(col.nbase, col.Hd) for d in range(bs)]

    def _window(self, rows, sz, kz):
        """(ncb, Hd) column rows -> flat (C,) cell-slot values via ONE
        static strided slice on the dense layer axis."""
        ncb, nlay = rows.shape[0], self.nlay
        v = jax.lax.slice(rows, (0, sz),
                          (ncb, sz + kz * (nlay - 1) + 1), (1, kz))
        return v.reshape(-1)

    def gather_cell_inputs(self, coords_dat, coeff_dats, ci):
        """Kernel inputs: coords (ndofc, g, C), coeffs tuple (nslots, C).
        One row gather per base slot, shared across vertical offsets."""
        col, g = self.coord_c
        planes = self._planes(coords_dat, col, g)
        rows = {}                           # (plane id, sb) -> row gather

        def rg(planes, col, d, sb):
            k = (id(planes), d, sb)
            if k not in rows:
                rows[k] = planes[d][jnp.asarray(col.base_map[:, sb])]
            return rows[k]

        ce = jnp.stack([
            jnp.stack([self._window(rg(planes, col, d, int(col.sb[s])),
                                    int(col.sz[s]), col.kz)
                       for d in range(g)])
            for s in range(len(col.sb))])
        ws = []
        for c in ci.coefficients:
            ccol, bs = self.coeff_c[c.count]
            p = self._planes(coeff_dats[c.count], ccol, bs)
            ws.append(jnp.stack([
                self._window(rg(p, ccol, d, int(ccol.sb[s])),
                             int(ccol.sz[s]), ccol.kz)
                for s in range(len(ccol.sb)) for d in range(bs)]))
        return ce, tuple(ws)

    def _place(self, v, sz, col):
        """(ncb, nlay) per-cell values -> (ncb, Hd) at vertical offset sz
        with stride kz: ONE lax.pad, no scatter on the layer axis."""
        hi = col.Hd - (sz + col.kz * (self.nlay - 1) + 1)
        return jax.lax.pad(v, jnp.zeros((), v.dtype),
                           ((0, 0, 0), (sz, hi, col.kz - 1)))

    def accumulate_rank1(self, loc):
        """(ni, 1, C) local values -> flat (nbase*Hd,) dof vector."""
        col = self.test_c
        ncb, nlay = self.ncell_b, self.nlay
        acc = {}
        for i in range(loc.shape[0]):
            v = loc[i, 0].reshape(ncb, nlay)
            sb, sz = int(col.sb[i]), int(col.sz[i])
            p = self._place(v, sz, col)
            acc[sb] = p if sb not in acc else acc[sb] + p
        out = jnp.zeros((col.nbase, col.Hd), dtype=loc.dtype)
        for sb, p in acc.items():
            out = out.at[jnp.asarray(col.base_map[:, sb])].add(p)
        return out.reshape(-1)

    def accumulate_rank2(self, loc):
        """(ni, nj, C) local tensors -> (nbase, NB, ndz, Hd) band data."""
        r, c = self.test_c, self.trial_c
        ncb, nlay = self.ncell_b, self.nlay
        kz = max(r.kz, c.kz)
        groups = {}                        # (sbr, sbc) -> {dz: plane}
        for i in range(loc.shape[0]):
            sbr, szr = int(r.sb[i]), int(r.sz[i])
            for j in range(loc.shape[1]):
                sbc, szc = int(c.sb[j]), int(c.sz[j])
                v = loc[i, j].reshape(ncb, nlay)
                p = self._place(v, szr, r)
                dz = szc - szr + kz
                g = groups.setdefault((sbr, sbc), {})
                g[dz] = p if dz not in g else g[dz] + p
        zero = jnp.zeros((ncb, r.Hd))
        data = jnp.zeros((r.nbase * self.NB, self.ndz * r.Hd))
        for (sbr, sbc), g in groups.items():
            plane = jnp.stack([g.get(dz, zero) for dz in range(self.ndz)],
                              axis=1)                  # (ncb, ndz, Hd)
            idx = (r.base_map[:, sbr] * self.NB + self.pos[:, sbr, sbc])
            data = data.at[jnp.asarray(idx)].add(plane.reshape(ncb, -1))
        return data.reshape(r.nbase, self.NB, self.ndz, r.Hd)


def build_column_plan(asm):
    """ColumnPlan for a FormAssembler, or None when inapplicable."""
    if os.environ.get("FDTPU_NO_COLUMN") == "1":
        return None
    mesh = asm.mesh
    if not getattr(mesh, "_extruded", False) or asm.rank not in (1, 2):
        return None
    if getattr(mesh, "_var_layers", None) is not None:
        return None     # ragged columns: generic gather executor
    test_c = _space_column(asm.test.space) if asm.test is not None \
        else None
    if asm.rank >= 1 and (test_c is None
                          or asm.test.space.block_size != 1):
        return None
    trial_c = None
    if asm.rank == 2:
        if asm.trial.space.block_size != 1:
            return None
        trial_c = _space_column(asm.trial.space)
        if trial_c is None:
            return None
    coord_space = mesh.coordinates.space
    coord_c = _space_column(coord_space)
    if coord_c is None:
        return None
    coeff_c = {}
    for ci in asm._compiled:
        if ci.integral_type != "cell":
            return None
        if ci.subdomain_id not in ("everywhere", None):
            return None
        for c in ci.coefficients:
            if c.count not in coeff_c:
                cs = getattr(c, "space", None)
                if cs is None or getattr(cs, "mesh_obj", None) is not mesh:
                    return None
                cc = _space_column(cs)
                if cc is None:
                    return None
                coeff_c[c.count] = (cc, cs.block_size)
        try:                     # batched lowering must cover the form
            C = 4
            g = mesh.geometric_dimension
            kb = ci.cell_kernel_batched()
            nvc = mesh.cell.num_vertices
            cfshapes = tuple(jax.ShapeDtypeStruct(
                (c.space.cell_dof_map.shape[1], C), jnp.float64)
                for c in ci.coefficients)
            cvals = tuple(jax.ShapeDtypeStruct(
                np.asarray(c.values()).shape, jnp.float64)
                for c in ci.constants)
            jax.eval_shape(kb, jax.ShapeDtypeStruct((nvc, g, C),
                                                    jnp.float64),
                           cfshapes, cvals)
        except NotImplementedError:
            return None
    try:
        return ColumnPlan(asm, test_c, trial_c, coeff_c,
                          (coord_c, coord_space.block_size))
    except Exception:
        return None


# --------------------------------------------------------------- matrix
class ColumnMatrix:
    """Assembled operator on an extruded mesh: base-ELL x layer-DIA.

    data (nbase, NB, ndz, Hd): for base row node i, its nb-th base
    neighbor j = cols_tbl[i, nb], the entry A[(i, z), (j, z + dz - kz)]
    sits at data[i, nb, dz, z].  SpMV = one row gather of x columns +
    shifted dense multiply-adds (reference semantics: firedrake/
    matrix.py:48 over a pyop2 Mat with an extruded iteration set)."""

    def __init__(self, plan: ColumnPlan, data, row_space=None,
                 col_space=None, bcs=()):
        self.plan = plan
        self.data = data                    # (nbase, NB, ndz, Hd)
        self.row_space = row_space
        self.col_space = col_space
        self.bcs = tuple(bcs)
        r, c = plan.test_c, plan.trial_c
        self.Hd, self.kz = r.Hd, max(r.kz, c.kz)
        self.nbase_r, self.nbase_c = r.nbase, c.nbase

    @property
    def shape(self):
        return (self.nbase_r * self.Hd, self.nbase_c * self.plan.trial_c.Hd)

    @property
    def dtype(self):
        return self.data.dtype

    # ---------------------------------------------------------------- ops
    def matvec(self, x):
        x = jnp.asarray(x)
        X = x.reshape(self.nbase_c, self.plan.trial_c.Hd)
        xn = X[jnp.asarray(self.plan.cols_tbl)]     # (nbase_r, NB, Hd)
        kz = self.kz
        xp = jnp.pad(xn, ((0, 0), (0, 0), (kz, kz)))
        y = None
        for dz in range(self.plan.ndz):
            sl = jax.lax.slice_in_dim(xp, dz, dz + self.Hd, axis=2)
            term = (self.data[:, :, dz, :] * sl).sum(axis=1)
            y = term if y is None else y + term
        return y.reshape(-1)

    __matmul__ = matvec

    def transpose_matvec(self, y):
        y = jnp.asarray(y)
        Y = y.reshape(self.nbase_r, self.Hd)
        kz = self.kz
        out = jnp.zeros((self.nbase_c, self.plan.trial_c.Hd + 2 * kz),
                        dtype=y.dtype)
        cols = jnp.asarray(self.plan.cols_tbl)
        for dz in range(self.plan.ndz):
            contrib = self.data[:, :, dz, :] * Y[:, None, :]
            out = out.at[cols, dz:dz + self.Hd].add(contrib)
        return out[:, kz:kz + self.plan.trial_c.Hd].reshape(-1)

    def diagonal(self):
        dp = self.plan.diag_pos
        if dp is None:
            raise ValueError("diagonal of a non-square ColumnMatrix")
        return self.data[jnp.arange(self.nbase_r), jnp.asarray(dp),
                         self.kz, :].reshape(-1)

    def copy(self):
        return ColumnMatrix(self.plan, self.data, self.row_space,
                            self.col_space, self.bcs)

    # ----------------------------------------------------------------- bcs
    def with_dirichlet(self, bc_rows, symmetric=True):
        n = self.nbase_r * self.Hd
        mask = jnp.zeros(n, dtype=self.data.dtype).at[
            jnp.asarray(bc_rows)].set(1.0).reshape(self.nbase_r, self.Hd)
        data = self.data * (1.0 - mask)[:, None, None, :]
        if symmetric:
            cm = mask[jnp.asarray(self.plan.cols_tbl)]  # (nbr, NB, Hd)
            kz = self.kz
            cmp_ = jnp.pad(cm, ((0, 0), (0, 0), (kz, kz)))
            keep = jnp.stack([
                1.0 - jax.lax.slice_in_dim(cmp_, dz, dz + self.Hd, axis=2)
                for dz in range(self.plan.ndz)], axis=2)
            data = data * keep
        dp = self.plan.diag_pos
        data = data.at[jnp.arange(self.nbase_r), jnp.asarray(dp),
                       self.kz, :].add(mask)
        return ColumnMatrix(self.plan, data, self.row_space,
                            self.col_space, self.bcs)

    # -------------------------------------------------------------- export
    def _band_indices(self):
        """Host (rows, cols, (nb, dz, z)) triplets of in-band entries."""
        p = self.plan
        nbr, NB, ndz, Hd = self.nbase_r, p.NB, p.ndz, self.Hd
        i = np.arange(nbr)[:, None, None, None]
        nb = np.arange(NB)[None, :, None, None]
        dz = np.arange(ndz)[None, None, :, None]
        z = np.arange(Hd)[None, None, None, :]
        zc = z + dz - self.kz
        valid = ((nb < p.row_counts[:, None, None, None])
                 & (zc >= 0) & (zc < p.trial_c.Hd))
        ii, nn, dd, zz = np.broadcast_arrays(i, nb, dz, z)
        ii, nn, dd, zz = (a[valid] for a in (ii, nn, dd, zz))
        rows = ii * Hd + zz
        cols = p.cols_tbl[ii, nn] * p.trial_c.Hd + (zz + dd - self.kz)
        return rows, cols, (ii, nn, dd, zz)

    def to_scipy(self):
        from scipy.sparse import coo_matrix
        rows, cols, (ii, nn, dd, zz) = self._band_indices()
        dat = np.asarray(self.data)
        return coo_matrix((dat[ii, nn, dd, zz], (rows, cols)),
                          shape=self.shape).tocsr()

    def to_dense(self):
        return self.to_scipy().toarray()

    @property
    def M(self):
        from .matrix import MatView
        return MatView(self)

    def to_dense_device(self):
        rows, cols, (ii, nn, dd, zz) = self._band_indices()
        vals = self.data[jnp.asarray(ii), jnp.asarray(nn),
                         jnp.asarray(dd), jnp.asarray(zz)]
        return jnp.zeros(self.shape, dtype=self.data.dtype).at[
            jnp.asarray(rows), jnp.asarray(cols)].add(vals)

    @property
    def nnz(self):
        """Band entries actually addressable (honest flop accounting)."""
        if getattr(self.plan, "_nnz", None) is None:
            rows, _, _ = self._band_indices()
            self.plan._nnz = int(len(rows))
        return self.plan._nnz

    def __repr__(self):
        return (f"ColumnMatrix({self.shape}, NB={self.plan.NB}, "
                f"ndz={self.plan.ndz}, Hd={self.Hd})")
