"""Slate DSL tail nodes (reference slate.py:766 Factorization, :1044
Reciprocal, :1377 DiagonalTensor) and the two-sided-dS contract.

On the dS contract: the reference's slac pipeline REMOVES restrictions
before compiling Slate terminal tensors (slate/slac/tsfc_driver.py:54
RemoveRestrictions), i.e. it does not genuinely compile cross-cell
jump x jump couplings into element-local tensors either — our compiler
detects those and raises, which is the stricter-correct behaviour."""
import numpy as np
import pytest
import jax.numpy as jnp

from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           TrialFunction, SpatialCoordinate,
                           UnitSquareMesh, inner, grad, dx, dS, jump,
                           assemble, sin)
from firedrake_tpu.slate import (Tensor, AssembledVector, DiagonalTensor,
                                 Reciprocal, Factorization, Solve,
                                 _eval_local, assemble_slate)


@pytest.fixture(scope="module")
def setup():
    mesh = UnitSquareMesh(3, 3)
    V = FunctionSpace(mesh, "CG", 2)
    u, v = TrialFunction(V), TestFunction(V)
    x, y = SpatialCoordinate(mesh)
    f = Function(V).interpolate(1 + x * y + sin(np.pi * x))
    a = inner(grad(u), grad(v)) * dx + u * v * dx
    L = f * v * dx
    return V, a, L, f


def test_diagonal_tensor(setup):
    V, a, L, f = setup
    A = Tensor(a)
    full = np.asarray(_eval_local(A, {}).cell)
    diag = np.asarray(_eval_local(DiagonalTensor(A), {}).cell)
    nc, n, _ = full.shape
    expect = np.zeros_like(full)
    idx = np.arange(n)
    expect[:, idx, idx] = full[:, idx, idx]
    assert np.allclose(diag, expect)
    # global assembly of the diagonal tensor matches the full matrix's
    # diagonal (each is the cell-sum of local diagonals)
    Ad = assemble_slate(DiagonalTensor(A))
    Am = assemble_slate(A)
    assert np.allclose(np.asarray(Ad.diagonal()),
                       np.asarray(Am.diagonal()), atol=1e-12)


def test_reciprocal(setup):
    V, a, L, f = setup
    b = Tensor(L)
    loc = np.asarray(_eval_local(b, {}).cell)
    rec = np.asarray(_eval_local(Reciprocal(b), {}).cell)
    nz = loc != 0
    assert np.allclose(rec[nz], 1.0 / loc[nz])
    assert (rec[~nz] == 0).all()


def test_factorization_solve(setup):
    V, a, L, f = setup
    A, b = Tensor(a), Tensor(L)
    direct = np.asarray(_eval_local(A.solve(b), {}).cell)
    for decomp in ("PartialPivLU", "LLT", "HouseholderQR"):
        fact = np.asarray(_eval_local(
            A.solve(b, decomposition=decomp), {}).cell)
        assert np.allclose(fact, direct, atol=1e-12)
    with pytest.raises(ValueError):
        Factorization(A, "NotADecomposition")
    s = Solve(Factorization(A), b)
    assert np.allclose(np.asarray(_eval_local(s, {}).cell), direct,
                       atol=1e-12)


def test_diag_reciprocal_jacobi(setup):
    """The idiom the tail nodes exist for: a local Jacobi sweep
    D^{-1} b through DiagonalTensor + batched Solve."""
    V, a, L, f = setup
    A, b = Tensor(a), Tensor(L)
    jac = np.asarray(_eval_local(DiagonalTensor(A).solve(b), {}).cell)
    full = np.asarray(_eval_local(A, {}).cell)
    rhs = np.asarray(_eval_local(b, {}).cell)
    idx = np.arange(full.shape[1])
    assert np.allclose(jac, rhs / full[:, idx, idx], atol=1e-12)


def test_two_sided_local_algebra_rejected():
    """Two-sided dS tensors ASSEMBLE (cross blocks carried explicitly)
    but cell-local algebra on them is not defined across cells."""
    mesh = UnitSquareMesh(3, 3)
    V = FunctionSpace(mesh, "DG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    form = inner(jump(u), jump(v)) * dS
    loc = _eval_local(Tensor(form), {})
    assert loc.cross            # cross-cell blocks present
    with pytest.raises(NotImplementedError, match="cross-cell"):
        _eval_local(Tensor(form).inv, {})
