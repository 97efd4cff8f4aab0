"""Sparsity construction: sorted COO -> CSR with precomputed scatter
positions.

Replaces PyOP2's MATPREALLOCATOR-based sparsity build (reference:
pyop2/sparsity.pyx:105 build_sparsity).  Instead of symbolic PETSc
insertion, we enumerate every (row, col) pair each kernel block will write,
unique-sort them once on the host, and keep, per block, the flat position
array mapping local-tensor entries to nnz slots.  Device-side assembly is
then ONE static scatter-add — the shape XLA/TPU wants.

Also precomputes an ELL (padded row) layout for the matvec: rows padded to
the max row length, so SpMV = dense gather + multiply + row-sum (no
dynamic loops; MXU/VPU-friendly).
"""
from __future__ import annotations

import numpy as np
from functools import cached_property

_IDX = np.int32


class Sparsity:
    """CSR structure + per-block scatter positions.

    blocks: list of (row_map (ne, nr), col_map (ne, nc)) index arrays.
    """

    def __init__(self, nrows: int, ncols: int, blocks):
        self.nrows = int(nrows)
        self.ncols = int(ncols)
        keys_per_block = []
        for rm, cm in blocks:
            rm = np.asarray(rm, dtype=np.int64)
            cm = np.asarray(cm, dtype=np.int64)
            ne, nr = rm.shape
            nc = cm.shape[1]
            k = (rm[:, :, None] * self.ncols + cm[:, None, :]).ravel()
            # out-of-range dofs (RestrictedFunctionSpace sentinels) get a
            # sentinel position == nnz: jnp scatters DROP out-of-bounds
            # targets, so their contributions vanish
            bad = ((rm[:, :, None] >= self.nrows)
                   | (cm[:, None, :] >= self.ncols)).ravel()
            k[bad] = -1
            keys_per_block.append(k)
        all_keys = np.concatenate(keys_per_block) if keys_per_block else \
            np.zeros(0, dtype=np.int64)
        # sort/unique/positions in the native C++ kernel when available
        # (2x numpy; dominates host preprocessing at 1M+ cells)
        from ..native import coo_sort_unique
        uniq, inv = coo_sort_unique(all_keys)
        self.nnz = len(uniq)
        self.coo_rows = (uniq // self.ncols).astype(_IDX)
        self.coo_cols = (uniq % self.ncols).astype(_IDX)
        self.indptr = np.zeros(self.nrows + 1, dtype=np.int64)
        np.add.at(self.indptr, self.coo_rows + 1, 1)
        self.indptr = np.cumsum(self.indptr)
        # per-block scatter positions
        self.block_positions = []
        off = 0
        for k in keys_per_block:
            self.block_positions.append(inv[off:off + len(k)].astype(_IDX))
            off += len(k)

    # --------------------------------------------------------- ELL layout
    @cached_property
    def row_lengths(self):
        return np.diff(self.indptr)

    @cached_property
    def kmax(self):
        return int(self.row_lengths.max()) if self.nnz else 1

    @cached_property
    def ell(self):
        """(ell_cols (nrows, kmax) padded with col 0,
            ell_pos (nnz,): position of csr entry i in the flat ELL array,
            ell_mask (nrows, kmax) bool valid)."""
        kmax = self.kmax
        within = np.arange(self.nnz) - self.indptr[self.coo_rows]
        ell_pos = (self.coo_rows.astype(np.int64) * kmax + within).astype(
            np.int64)
        ell_cols = np.zeros((self.nrows, kmax), dtype=_IDX)
        ell_cols.reshape(-1)[ell_pos] = self.coo_cols
        mask = np.zeros((self.nrows, kmax), dtype=bool)
        mask.reshape(-1)[ell_pos] = True
        return ell_cols, ell_pos.astype(_IDX), mask

    @cached_property
    def diag_positions(self):
        """Position in nnz of each diagonal entry (-1 if absent)."""
        n = min(self.nrows, self.ncols)
        pos = np.full(n, -1, dtype=np.int64)
        for r in range(0, 0):
            pass
        # vectorized: diagonal key search
        keys = self.coo_rows.astype(np.int64) * self.ncols + self.coo_cols
        want = np.arange(n, dtype=np.int64) * self.ncols + np.arange(n)
        idx = np.searchsorted(keys, want)
        idx_cl = np.clip(idx, 0, self.nnz - 1)
        hit = keys[idx_cl] == want
        pos[hit] = idx[hit]
        return pos
