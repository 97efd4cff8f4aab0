"""Assembled sparse matrix over a Sparsity (reference: firedrake/matrix.py:48
wrapping pyop2.Mat / PETSc AIJ; here data is ONE flat jnp array over nnz
with static index metadata, and SpMV runs in ELL form on device)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .sparsity import Sparsity


def ell_matvec(data, x, ell_cols, ell_pos, nrows, kmax):
    """y = A @ x with A given by flat CSR data scattered into ELL.
    (Legacy 2D form — csr_matvec below is the TPU production path.)"""
    flat = jnp.zeros(nrows * kmax, dtype=data.dtype).at[ell_pos].set(data)
    ell_data = flat.reshape(nrows, kmax)
    return jnp.sum(ell_data * x[ell_cols], axis=1)


def csr_matvec(data, x, coo_cols, coo_rows, nrows):
    """y = A @ x in FLAT form: one 1-D gather + one sorted segment_sum.
    On the v5e the ELL (nrows, kmax) layout pays tiny-trailing-dim tile
    padding + a 2-D gather (~43 ms at 263k rows) where the flat form is
    bandwidth-bound (PERF_NOTES round 2b)."""
    return jax.ops.segment_sum(data * x[coo_cols], coo_rows,
                               num_segments=nrows,
                               indices_are_sorted=True)


class MatView:
    """Reference-compat `A.M` handle (pyop2 Mat role): `.values` is the
    dense array; mixed matrices support `A.M[i, j].values` per block
    (reference: pyop2/types/mat.py Mat.values / MatBlock)."""

    def __init__(self, mat, getblock=None):
        self._mat = mat
        self._getblock = getblock

    @property
    def values(self):
        return self._mat.to_dense()

    def __getitem__(self, ij):
        if self._getblock is None:
            raise TypeError("not a mixed matrix")
        return MatView(self._getblock(ij))

    @property
    def handle(self):
        return self._mat


class Matrix:
    """Sparse matrix: static Sparsity + device data (nnz,)."""

    def __init__(self, sparsity: Sparsity, data=None, row_space=None,
                 col_space=None, bcs=()):
        self.sparsity = sparsity
        self.data = (jnp.zeros(sparsity.nnz)
                     if data is None else data)
        self.row_space = row_space
        self.col_space = col_space
        self.bcs = tuple(bcs)
        ell_cols, ell_pos, _ = sparsity.ell
        self._ell_cols = jnp.asarray(ell_cols)
        self._ell_pos = jnp.asarray(ell_pos)
        self._coo_cols = jnp.asarray(sparsity.coo_cols)
        self._coo_rows = jnp.asarray(sparsity.coo_rows)

    @property
    def shape(self):
        return (self.sparsity.nrows, self.sparsity.ncols)

    @property
    def M(self):
        return MatView(self)

    # --------------------------------------------------------------- ops
    def matvec(self, x):
        # ELL form: the honest A/B measured it 43 ms vs 234 ms for the
        # flat gather+segment_sum form at 263k rows (segment_sum lowers
        # slowly on the v5e — PERF_NOTES round 2b)
        s = self.sparsity
        return ell_matvec(self.data, jnp.asarray(x), self._ell_cols,
                          self._ell_pos, s.nrows, s.kmax)

    __matmul__ = matvec

    def diagonal(self):
        pos = self.sparsity.diag_positions
        d = jnp.where(jnp.asarray(pos) >= 0,
                      self.data[jnp.clip(jnp.asarray(pos), 0)], 0.0)
        return d

    def transpose_matvec(self, y):
        """A^T @ y via COO scatter (for adjoint solves)."""
        s = self.sparsity
        rows = jnp.asarray(s.coo_rows)
        cols = jnp.asarray(s.coo_cols)
        contrib = self.data * jnp.asarray(y)[rows]
        return jnp.zeros(s.ncols, dtype=self.data.dtype).at[cols].add(contrib)

    def to_dense_device(self):
        """Dense (nrows, ncols) ON DEVICE — no d2h readback (any
        readback through the axon tunnel permanently degrades the
        process's dispatch; PERF_NOTES round 2b)."""
        s = self.sparsity
        return jnp.zeros((s.nrows, s.ncols), dtype=self.data.dtype).at[
            jnp.asarray(s.coo_rows), jnp.asarray(s.coo_cols)].add(
            self.data)

    # ------------------------------------------------------------- export
    def to_scipy(self):
        from scipy.sparse import csr_matrix
        s = self.sparsity
        return csr_matrix((np.asarray(self.data), np.asarray(s.coo_cols),
                           np.asarray(s.indptr)), shape=self.shape)

    def to_dense(self):
        return self.to_scipy().toarray()

    def copy(self):
        return Matrix(self.sparsity, self.data, self.row_space,
                      self.col_space, self.bcs)

    # ----------------------------------------------------- bc application
    def with_dirichlet(self, bc_rows, symmetric=True):
        """Zero bc rows (and cols), put 1 on the diagonal. Returns new
        Matrix (reference semantics: pyop2 lgmap negative-index trick +
        diag set, pyop2/types/mat.py; firedrake/assemble.py:1243-1268)."""
        s = self.sparsity
        rows = jnp.asarray(s.coo_rows)
        cols = jnp.asarray(s.coo_cols)
        mask = jnp.zeros(s.nrows, dtype=bool).at[jnp.asarray(bc_rows)].set(
            True)
        keep = ~mask[rows]
        if symmetric:
            keep = keep & ~mask[cols]
        data = jnp.where(keep, self.data, 0.0)
        # unit diagonal on bc rows
        dpos = jnp.asarray(s.diag_positions)
        bc_dpos = dpos[jnp.asarray(bc_rows)]
        data = data.at[jnp.clip(bc_dpos, 0)].set(
            jnp.where(bc_dpos >= 0, 1.0, data[jnp.clip(bc_dpos, 0)]))
        return Matrix(s, data, self.row_space, self.col_space, self.bcs)

    def __repr__(self):
        return f"Matrix({self.shape}, nnz={self.sparsity.nnz})"
