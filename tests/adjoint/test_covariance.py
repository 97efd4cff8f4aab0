"""Covariance operators + white noise + CovariancePC
(reference: firedrake/adjoint/covariance_operator.py,
firedrake/preconditioners/covariance.py, tests role:
tests/firedrake/regression/test_white_noise / covariance suites)."""
import numpy as np
import jax.numpy as jnp
import pytest

from firedrake_tpu import (Function, FunctionSpace, TestFunction,
                           TrialFunction, UnitSquareMesh, assemble, dx,
                           inner)
from firedrake_tpu.adjoint import (AutoregressiveCovariance,
                                   CovarianceMat,
                                   MixedCovarianceOperator,
                                   WhiteNoiseGenerator)


@pytest.fixture(scope="module")
def V():
    return FunctionSpace(UnitSquareMesh(6, 6), "CG", 1)


def test_white_noise_covariance_is_mass_matrix(V):
    """E[w w^T] = M exactly under the broken-space Cholesky sampling
    (Croci et al. 2018) — check the sample covariance converges to the
    assembled mass matrix."""
    u, v = TrialFunction(V), TestFunction(V)
    M = np.asarray(assemble(inner(u, v) * dx).to_dense())
    gen = WhiteNoiseGenerator(V, seed=42)
    N = 4000
    samples = np.stack([np.asarray(gen.sample().dat) for _ in range(N)])
    cov = samples.T @ samples / N
    relerr = np.abs(cov - M).max() / np.abs(M).max()
    assert relerr < 0.15          # statistical: ~1/sqrt(N) per entry


def test_white_noise_riesz(V):
    """apply_riesz returns the M^{-1}-image: M w_riesz == w_dual."""
    u, v = TrialFunction(V), TestFunction(V)
    M = assemble(inner(u, v) * dx)
    g1 = WhiteNoiseGenerator(V, seed=7)
    g2 = WhiteNoiseGenerator(V, seed=7)
    wd = np.asarray(g1.sample().dat)
    wr = np.asarray(g2.sample(apply_riesz=True).dat)
    assert np.allclose(np.asarray(M.matvec(jnp.asarray(wr))), wd,
                       atol=1e-8)


@pytest.fixture(scope="module")
def B(V):
    return AutoregressiveCovariance(V, L=0.2, sigma=1.3, m=4, seed=3)


def test_ar_action_inverse_roundtrip(B, V):
    x = Function(V)
    x.dat = np.sin(np.arange(V.dim) * 0.37)
    y = B.apply_action(B.apply_inverse(x))
    err = np.abs(np.asarray(y.dat) - np.asarray(x.dat)).max()
    assert err < 1e-7


def test_ar_norm_matches_inverse(B, V):
    x = Function(V)
    x.dat = np.cos(np.arange(V.dim) * 0.21)
    direct = float(np.asarray(x.dat)
                   @ np.asarray(B.apply_inverse(x).dat))
    assert abs(B.norm(x) - direct) / abs(direct) < 1e-8


def test_ar_sample_has_b_statistics(B, V):
    """B^{1/2} sampling: E[u u^T] = B. Spot-check via the B^{-1}-norm,
    whose expectation is dim(V) for u ~ N(0, B)."""
    vals = [B.norm(B.sample()) for _ in range(60)]
    mean = np.mean(vals)
    assert abs(mean - V.dim) / V.dim < 0.35     # chi^2 concentration


def test_covariance_pc_converges_fast(B, V):
    """Krylov solve of B y = r preconditioned by CovariancePC (which
    applies B^{-1}) must converge in O(1) iterations."""
    from firedrake_tpu.solvers.composition import OpCtx, build_ksp
    mat = CovarianceMat(B, CovarianceMat.ACTION)
    ctx = OpCtx(mat=mat, space=V)
    solve = build_ksp(ctx, {"ksp_type": "cg", "ksp_rtol": 1e-10,
                            "pc_type": "python",
                            "pc_python_type": "CovariancePC"})
    r = jnp.asarray(np.sin(np.arange(V.dim) * 0.11))
    res = solve._full(r)
    assert int(res.iterations) <= 3
    y = B.apply_inverse(r)
    assert np.allclose(np.asarray(res.x), np.asarray(y.dat), atol=1e-6)


def test_zero_iteration_covariance(V):
    """m=0: B = sigma^2 M^{-1} (pure white-noise covariance)."""
    B0 = AutoregressiveCovariance(V, L=0.1, sigma=2.0, m=0, seed=1)
    x = Function(V)
    x.dat = np.linspace(0.0, 1.0, V.dim)
    y = B0.apply_action(B0.apply_inverse(x))
    assert np.allclose(np.asarray(y.dat), np.asarray(x.dat), atol=1e-8)


def test_mixed_covariance(V):
    from firedrake_tpu import MixedFunctionSpace
    W = MixedFunctionSpace([V, V])
    B1 = AutoregressiveCovariance(V, L=0.2, m=2, seed=5)
    B2 = AutoregressiveCovariance(V, L=0.4, sigma=0.5, m=2, seed=6)
    BW = MixedCovarianceOperator(W, [B1, B2])
    x = Function(W)
    x.dat = np.sin(np.arange(W.dim) * 0.13)
    y = BW.apply_action(BW.apply_inverse(x))
    assert np.abs(np.asarray(y.dat) - np.asarray(x.dat)).max() < 1e-7
    n = BW.norm(x)
    xd = np.asarray(x.dat)
    assert abs(n - xd @ np.asarray(BW.apply_inverse(x).dat)) \
        / abs(n) < 1e-8
