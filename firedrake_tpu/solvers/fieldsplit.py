"""Fieldsplit preconditioning for mixed systems.

Reference: PETSc PCFIELDSPLIT composed through firedrake's DM field
decomposition (dmhooks.create_field_decomposition; solver_parameters
`pc_fieldsplit_type`, `fieldsplit_<i>_*` sub-options).  The PC is a
traceable callable: per-field inner applications are dense inverses (small
blocks), Jacobi sweeps, or fixed-iteration Chebyshev — all jit-safe inside
the outer Krylov loop.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_DENSE_LIMIT = 6000


def _inner_apply(B, params, prefix):
    """Build z = approx(B^{-1}) r for one diagonal block."""
    ksp = params.get(f"{prefix}_ksp_type", "preonly")
    pc = params.get(f"{prefix}_pc_type", "lu")
    n = B.shape[0]
    if ksp == "preonly" and pc in ("lu", "cholesky", "ilu") \
            and n <= _DENSE_LIMIT:
        Binv = jnp.asarray(np.linalg.inv(B.to_dense()))
        return lambda r: Binv @ r
    diag = B.diagonal()
    dinv = jnp.where(jnp.abs(diag) > 0, 1.0 / diag, 1.0)
    if ksp == "preonly" or pc == "jacobi" and ksp == "preonly":
        return lambda r: dinv * r
    # fixed-iteration Chebyshev on D^-1 B (jit-safe stationary method)
    its = int(params.get(f"{prefix}_ksp_max_it", 5))
    # cheap lambda-max estimate
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n))
    lam = 1.0
    for _ in range(10):
        y = dinv * B.matvec(x)
        lam = float(jnp.linalg.norm(y))
        x = y / lam
    emin, emax = 0.25 * lam, 1.05 * lam
    theta, delta = (emax + emin) / 2, (emax - emin) / 2

    def apply(r):
        x = jnp.zeros_like(r)
        alpha = 1.0 / theta
        p = dinv * r
        x = x + alpha * p
        for _ in range(its - 1):
            beta = (delta * alpha / 2) ** 2
            alpha = 1.0 / (theta - beta / alpha)
            z = dinv * (r - B.matvec(x))
            p = z + beta * p
            x = x + alpha * p
        return x

    return apply


class FieldsplitPC:
    def __init__(self, A, W, params):
        self.A = A
        self.W = W
        self.fs_type = params.get("pc_fieldsplit_type", "additive")
        self.inner = []
        for i in range(W.num_sub_spaces):
            B = A.blocks.get((i, i))
            if B is None:
                self.inner.append(lambda r: r)
            else:
                self.inner.append(_inner_apply(B, params,
                                               f"fieldsplit_{i}"))

    def _split(self, r):
        outs = []
        for i, V in enumerate(self.W.subspaces):
            off = self.W.offsets[i]
            outs.append(jax_slice(r, off, V.dim))
        return outs

    def __call__(self, r):
        W = self.W
        rs = self._split(r)
        if self.fs_type == "additive":
            zs = [apply(ri) for apply, ri in zip(self.inner, rs)]
            return jnp.concatenate(zs)
        if self.fs_type == "multiplicative":
            zs = [jnp.zeros_like(ri) for ri in rs]
            for i in range(W.num_sub_spaces):
                # update residual with corrections so far
                ri = rs[i]
                for j in range(i):
                    B = self.A.blocks.get((i, j))
                    if B is not None:
                        ri = ri - B.matvec(zs[j])
                zs[i] = self.inner[i](ri)
            return jnp.concatenate(zs)
        if self.fs_type == "schur":
            assert W.num_sub_spaces == 2, "schur needs exactly 2 fields"
            r0, r1 = rs
            A01 = self.A.blocks.get((0, 1))
            A10 = self.A.blocks.get((1, 0))
            fact = "full"
            z0 = self.inner[0](r0)
            s = r1 - (A10.matvec(z0) if A10 is not None else 0.0)
            z1 = self.inner[1](s)
            c = (A01.matvec(z1) if A01 is not None else 0.0)
            z0 = z0 - self.inner[0](c)
            return jnp.concatenate([z0, z1])
        raise NotImplementedError(self.fs_type)


def jax_slice(x, off, n):
    import jax
    return jax.lax.dynamic_slice(x, (off,), (n,))
