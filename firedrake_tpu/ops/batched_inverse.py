"""Pallas TPU kernel: batched small dense inverse (Gauss-Jordan).

Role: the element-local dense inverses behind Slate / static condensation
/ TinyASM-style block-Jacobi (reference: pyop2/codegen/c/inverse.c LAPACK
getri per element; tinyasm/matinvert.cpp).  On TPU the natural shape is a
BATCH of (n x n) systems with the batch in lanes: one grid step processes
a (BLK, n, n) tile resident in VMEM and runs branch-free Gauss-Jordan
(no pivoting — FEM local matrices are well-conditioned SPD/mass-like;
partial pivoting variant is a follow-up).

`batched_inv(A)` dispatches: Pallas on TPU, closed-form cofactor for
n <= 3, jnp.linalg elsewhere.  CPU tests run the same kernel in
interpreter mode.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:          # pragma: no cover
    _HAS_PALLAS = False

from ..compiler.smallmat import inv as _cofactor_inv

_BLK = 256


def _gj_kernel(a_ref, out_ref):
    """Gauss-Jordan inverse of a (BLK, n, n) tile (batch-major; the
    compiler keeps n*n in sublanes and BLK in lanes after layout
    assignment — n is tiny and static)."""
    A = a_ref[:]                        # (BLK, n, n)
    n = A.shape[-1]
    I = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    M = A
    X = I
    for k in range(n):                  # static unroll — n is small
        piv = M[:, k, k][:, None, None]
        inv_piv = 1.0 / piv
        rowM = M[:, k, :][:, None, :] * inv_piv
        rowX = X[:, k, :][:, None, :] * inv_piv
        colM = M[:, :, k][:, :, None]
        # eliminate column k from every row, then restore the pivot row
        M = M - colM * rowM
        X = X - colM * rowX
        sel = (jnp.arange(n) == k)[None, :, None]
        M = jnp.where(sel, rowM, M)
        X = jnp.where(sel, rowX, X)
    out_ref[:] = X


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_batched_inv(A, interpret=False):
    nb, n, _ = A.shape
    grid = (max(nb // _BLK, 1),)
    return pl.pallas_call(
        _gj_kernel,
        out_shape=jax.ShapeDtypeStruct(A.shape, A.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((_BLK, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_BLK, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A)


def batched_inv(A, force_pallas=False, interpret=False):
    """Inverse over the last two axes of a (..., n, n) batch."""
    A = jnp.asarray(A)
    n = A.shape[-1]
    lead = A.shape[:-2]
    nb = int(np.prod(lead)) if lead else 1
    if n <= 3 and not force_pallas:
        return _cofactor_inv(A)
    use_pallas = _HAS_PALLAS and (force_pallas or
                                  jax.default_backend() == "tpu")
    if not use_pallas:
        return jnp.linalg.inv(A)
    A2 = A.reshape(nb, n, n)
    pad = (-nb) % _BLK
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (pad, n, n))
        A2 = jnp.concatenate([A2, eye])
    out = _pallas_batched_inv(A2, interpret=interpret)
    if pad:
        out = out[:nb]
    return out.reshape(A.shape)


def batched_solve(A, b, **kw):
    """Solve A x = b batched over leading axes (via batched_inv; a fused
    forward/back-substitution kernel is the follow-up)."""
    Ainv = batched_inv(A, **kw)
    if b.ndim == A.ndim - 1:
        return jnp.einsum("...ij,...j->...i", Ainv, b)
    return jnp.einsum("...ij,...jk->...ik", Ainv, b)
