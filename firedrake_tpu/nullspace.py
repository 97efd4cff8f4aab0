"""Nullspace bases (reference: firedrake/nullspace.py:17 VectorSpaceBasis,
:206 MixedVectorSpaceBasis -> PETSc MatNullSpace).  Here a basis is a
device matrix of orthonormal columns; Krylov loops project it out of the
operator range/solution on the fly (traceable)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class VectorSpaceBasis:
    def __init__(self, vecs=None, constant=False, comm=None):
        self._vecs = list(vecs or [])
        self._constant = constant
        self._Q = None
        self._n = None

    def _materialize(self, n):
        if self._Q is not None and self._n == n:
            return self._Q
        cols = []
        if self._constant:
            cols.append(np.ones(n))
        for v in self._vecs:
            arr = np.asarray(getattr(v, "dat", v)).reshape(-1)
            assert arr.size == n, "basis vector length mismatch"
            cols.append(arr)
        M = np.stack(cols, axis=1) if cols else np.zeros((n, 0))
        Q, _ = np.linalg.qr(M)
        self._Q = jnp.asarray(Q)
        self._n = n
        return self._Q

    def orthogonalize(self, b):
        """Remove the nullspace component (works on jnp arrays)."""
        n = b.shape[0]
        Q = self._materialize(n)
        return b - Q @ (Q.T @ b)

    project_out = orthogonalize

    def is_trivial(self):
        return not (self._constant or self._vecs)


class MixedVectorSpaceBasis:
    """Per-field bases over a mixed space; None entries are full spaces.
    Reference: nullspace.py:206."""

    def __init__(self, W, bases):
        self.W = W
        self.bases = bases

    def orthogonalize(self, b):
        outs = []
        for i, V in enumerate(self.W.subspaces):
            off = self.W.offsets[i]
            seg = b[off:off + V.dim]
            basis = self.bases[i]
            if isinstance(basis, VectorSpaceBasis):
                seg = basis.orthogonalize(seg)
            outs.append(seg)
        return jnp.concatenate(outs)

    project_out = orthogonalize
