"""Pallas TPU kernels, run in interpreter mode on CPU (reference role:
pyop2/codegen/c/inverse.c + tinyasm/matinvert.cpp batched LAPACK)."""
import numpy as np
import pytest
import jax.numpy as jnp

from firedrake_tpu.ops.batched_inverse import batched_inv, batched_solve


@pytest.mark.parametrize("n", [2, 3, 6, 12, 15])
def test_batched_inverse(n):
    rng = np.random.default_rng(0)
    A = rng.standard_normal((300, n, n))
    A = A @ np.swapaxes(A, 1, 2) + n * np.eye(n)
    Ainv = np.asarray(batched_inv(jnp.asarray(A), force_pallas=True,
                                  interpret=True))
    err = np.abs(np.einsum("bij,bjk->bik", A, Ainv) - np.eye(n)).max()
    assert err < 1e-9


def test_batched_solve_vec_and_mat():
    rng = np.random.default_rng(1)
    n = 8
    A = rng.standard_normal((100, n, n))
    A = A @ np.swapaxes(A, 1, 2) + n * np.eye(n)
    b = rng.standard_normal((100, n))
    x = np.asarray(batched_solve(jnp.asarray(A), jnp.asarray(b),
                                 force_pallas=True, interpret=True))
    assert np.abs(np.einsum("bij,bj->bi", A, x) - b).max() < 1e-8
    B = rng.standard_normal((100, n, 4))
    X = np.asarray(batched_solve(jnp.asarray(A), jnp.asarray(B),
                                 force_pallas=True, interpret=True))
    assert np.abs(np.einsum("bij,bjk->bik", A, X) - B).max() < 1e-8
