"""Closed-form small-matrix det/inv (batched over leading axes).

XLA:TPU has no f64 LuDecomposition, and LU is overkill for the 1x1/2x2/3x3
Jacobians FEM geometry produces — cofactor formulas are branch-free VPU
code and fuse into the surrounding quadrature kernel.  Falls back to
jnp.linalg for larger blocks (host/CPU paths only)."""
from __future__ import annotations

import jax.numpy as jnp


def det(A):
    n = A.shape[-1]
    assert A.shape[-2] == n
    if n == 1:
        return A[..., 0, 0]
    if n == 2:
        return (A[..., 0, 0] * A[..., 1, 1]
                - A[..., 0, 1] * A[..., 1, 0])
    if n == 3:
        return (
            A[..., 0, 0] * (A[..., 1, 1] * A[..., 2, 2]
                            - A[..., 1, 2] * A[..., 2, 1])
            - A[..., 0, 1] * (A[..., 1, 0] * A[..., 2, 2]
                              - A[..., 1, 2] * A[..., 2, 0])
            + A[..., 0, 2] * (A[..., 1, 0] * A[..., 2, 1]
                              - A[..., 1, 1] * A[..., 2, 0]))
    return jnp.linalg.det(A)


def inv(A):
    n = A.shape[-1]
    assert A.shape[-2] == n
    if n == 1:
        return 1.0 / A
    if n == 2:
        d = det(A)[..., None, None]
        adj = jnp.stack([
            jnp.stack([A[..., 1, 1], -A[..., 0, 1]], axis=-1),
            jnp.stack([-A[..., 1, 0], A[..., 0, 0]], axis=-1),
        ], axis=-2)
        return adj / d
    if n == 3:
        d = det(A)[..., None, None]
        c = lambda i1, j1, i2, j2: (A[..., i1, j1] * A[..., i2, j2]
                                    - A[..., i1, j2] * A[..., i2, j1])
        # adjugate (transposed cofactors)
        adj = jnp.stack([
            jnp.stack([c(1, 1, 2, 2), -c(0, 1, 2, 2), c(0, 1, 1, 2)],
                      axis=-1),
            jnp.stack([-c(1, 0, 2, 2), c(0, 0, 2, 2), -c(0, 0, 1, 2)],
                      axis=-1),
            jnp.stack([c(1, 0, 2, 1), -c(0, 0, 2, 1), c(0, 0, 1, 1)],
                      axis=-1),
        ], axis=-2)
        return adj / d
    return jnp.linalg.inv(A)
