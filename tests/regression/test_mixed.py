"""Mixed function spaces (reference: tests/firedrake/regression/
test_stokes_mini.py, test_mixed_interior_facets.py etc.)."""
import math

import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, VectorFunctionSpace,
                           MixedFunctionSpace, Function, TestFunctions,
                           TrialFunctions, TestFunction, SpatialCoordinate,
                           UnitSquareMesh, DirichletBC, Constant, inner,
                           grad, div, dx, solve, errornorm, as_vector,
                           assemble, split, derivative, sin)


@pytest.fixture
def W():
    mesh = UnitSquareMesh(4, 4)
    V = VectorFunctionSpace(mesh, "CG", 2)
    Q = FunctionSpace(mesh, "CG", 1)
    return MixedFunctionSpace([V, Q])


def test_mixed_space_structure(W):
    V, Q = W.subspaces
    assert W.dim == V.dim + Q.dim
    assert W.num_sub_spaces == 2
    assert W.sub(0).dim == V.dim
    assert W.sub(1).offset == V.dim


def test_mixed_function_split(W):
    w = Function(W)
    u, p = w.subfunctions
    u.interpolate(as_vector([1.0 + 0 * SpatialCoordinate(
        W.mesh_obj)[0], 2.0 + 0 * SpatialCoordinate(W.mesh_obj)[1]]))
    p.assign(3.0)
    d = np.asarray(w.dat)
    assert np.allclose(d[:W.subspaces[0].dim:2], 1.0)
    assert np.allclose(d[1:W.subspaces[0].dim:2], 2.0)
    assert np.allclose(d[W.subspaces[0].dim:], 3.0)


def test_mixed_block_assembly(W):
    u, p = TrialFunctions(W)
    v, q = TestFunctions(W)
    a = (inner(u, v) + p * q) * dx
    A = assemble(a)
    # block diagonal: off-diagonal blocks absent
    assert (0, 1) not in A.blocks
    assert (1, 0) not in A.blocks
    # matvec of ones = row sums; total == area * ... sanity via scipy
    As = A.to_scipy()
    x = np.random.default_rng(0).standard_normal(W.dim)
    import jax.numpy as jnp
    y = np.asarray(A.matvec(jnp.asarray(x)))
    assert np.abs(y - As @ x).max() < 1e-12


def test_stokes_poiseuille(W):
    mesh = W.mesh_obj
    V, Q = W.subspaces
    u, p = TrialFunctions(W)
    v, q = TestFunctions(W)
    X = SpatialCoordinate(mesh)
    a = (inner(grad(u), grad(v)) - p * div(v) - q * div(u)) * dx
    L = inner(Constant([0.0, 0.0]), v) * dx
    uex = as_vector([X[1] * (1 - X[1]), 0.0])
    bcs = [DirichletBC(W.sub(0), Function(V).interpolate(uex),
                       (1, 2, 3, 4))]
    w = Function(W)
    solve(a == L, w, bcs=bcs,
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    uh, ph = w.subfunctions
    assert errornorm(uex, uh) < 1e-8
    pex = Function(Q).interpolate(-2 * X[0])
    diff = np.asarray(ph.dat) - np.asarray(pex.dat)
    assert np.std(diff) < 1e-7


def test_mixed_nonlinear_derivative(W):
    w = Function(W)
    u, p = split(w)
    v, q = TestFunctions(W)
    F = (inner(grad(u), grad(v)) + p * p * q - q) * dx
    J = derivative(F, w)
    nums = {a.number for a in J.arguments()}
    assert nums == {0, 1}
    # solve the (decoupled) nonlinear problem: p^2 = 1 -> p = 1 from
    # initial guess 0.5; u = 0
    w.subfunctions[1].assign(0.5)
    solve(F == 0, w, solver_parameters={"snes_rtol": 1e-10,
                                        "ksp_type": "preonly",
                                        "pc_type": "lu"})
    assert np.allclose(np.asarray(w.subfunctions[1].dat), 1.0, atol=1e-8)
    assert np.allclose(np.asarray(w.subfunctions[0].dat), 0.0, atol=1e-8)
