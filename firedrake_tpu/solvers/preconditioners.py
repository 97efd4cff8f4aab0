"""Preconditioner construction (reference: firedrake/preconditioners/ zoo,
PETSc PC composition via solver_parameters).  Round-1 set: none/jacobi +
host-side LU for `preonly` direct solves; the PC protocol is simply a
traceable callable z = pc(r), composable inside jitted Krylov loops."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def identity_pc(r):
    return r


def make_jacobi(diag):
    d = jnp.where(jnp.abs(diag) > 0, diag, 1.0)

    def pc(r):
        return r / d

    return pc


def make_pc(pc_type: str, A=None, params=None):
    """A is an assembled Matrix (or None for matrix-free with no PC)."""
    params = params or {}
    if pc_type in (None, "none"):
        return identity_pc
    if pc_type in ("jacobi", "bjacobi", "sor", "ilu", "icc"):
        # bjacobi/sor/ilu approximated by jacobi until dedicated PCs land
        if A is None:
            raise ValueError(f"pc_type {pc_type!r} needs an assembled "
                             "matrix (got matfree); use 'none'")
        return make_jacobi(A.diagonal())
    raise NotImplementedError(f"pc_type {pc_type!r}")


def direct_solve(A, b):
    """Host-side sparse LU (the PETSc `-pc_type lu` + MUMPS role for
    moderate sizes; a batched device direct solver is future work)."""
    from scipy.sparse.linalg import spsolve
    x = spsolve(A.to_scipy().tocsc(), np.asarray(b))
    return jnp.asarray(x)
