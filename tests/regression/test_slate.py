"""Slate element-local dense algebra (reference: tests/firedrake/slate/)."""
import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           TrialFunction, SpatialCoordinate, UnitSquareMesh,
                           inner, grad, dx, solve, Tensor, AssembledVector,
                           assemble_slate, assemble)


@pytest.fixture
def setup():
    mesh = UnitSquareMesh(4, 4)
    V = FunctionSpace(mesh, "DG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = Function(V).interpolate(X[0] * X[1])
    return mesh, V, u, v, f


def test_tensor_matches_assemble(setup):
    mesh, V, u, v, f = setup
    a = inner(u, v) * dx
    A_sl = assemble_slate(Tensor(a))
    A = assemble(a)
    assert np.abs(A_sl.to_dense() - A.to_dense()).max() < 1e-13
    L = inner(f, v) * dx
    b_sl = assemble_slate(Tensor(L))
    b = assemble(L)
    assert np.abs(np.asarray(b_sl.dat) - np.asarray(b.dat)).max() < 1e-13


def test_local_inverse_solves_dg_mass(setup):
    mesh, V, u, v, f = setup
    a = inner(u, v) * dx
    L = inner(f, v) * dx
    x_inv = assemble_slate(Tensor(a).inv * Tensor(L))
    x_solve = assemble_slate(Tensor(a).solve(Tensor(L)))
    uh = Function(V)
    solve(a == L, uh, solver_parameters={"ksp_type": "preonly",
                                         "pc_type": "lu"})
    assert np.abs(np.asarray(x_inv.dat) - np.asarray(uh.dat)).max() < 1e-11
    assert np.abs(np.asarray(x_solve.dat)
                  - np.asarray(uh.dat)).max() < 1e-11


def test_algebra_identities(setup):
    mesh, V, u, v, f = setup
    a = inner(u, v) * dx
    k = inner(grad(u), grad(v)) * dx
    A, K = Tensor(a), Tensor(k)
    # (A + K)^T == A^T + K^T (both symmetric here)
    lhs = assemble_slate((A + K).T)
    rhs = assemble_slate(A + K)
    assert np.abs(lhs.to_dense() - rhs.to_dense()).max() < 1e-12
    # A * A.inv == identity blocks
    I = assemble_slate(A * A.inv)
    ndof = V.element.ndof
    eye = np.eye(V.dim)
    assert np.abs(I.to_dense() - eye).max() < 1e-10
    # action via AssembledVector
    w = AssembledVector(f)
    Aw = assemble_slate(A * w)
    ref = assemble(a).matvec(np.asarray(f.dat))
    assert np.abs(np.asarray(Aw.dat) - np.asarray(ref)).max() < 1e-12
