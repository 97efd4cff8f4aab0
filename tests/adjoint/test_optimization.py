"""Optimization drivers: minimize / bounds / UFL constraints
(reference: firedrake/adjoint/__init__.py:30 pyadjoint re-exports;
ufl_constraints.py:140; tests/firedrake/adjoint optimization tests)."""
import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (Constant, DirichletBC, Function, FunctionSpace,
                           SpatialCoordinate, TestFunction, TrialFunction,
                           UnitSquareMesh, dx, grad, inner, solve)
from firedrake_tpu.adjoint import (Control, MinimizationProblem,
                                   ReducedFunctional,
                                   UFLEqualityConstraint, continue_annotation,
                                   get_working_tape, minimize,
                                   pause_annotation)


@pytest.fixture(autouse=True)
def clean_tape():
    get_working_tape().clear_tape()
    pause_annotation()
    yield
    get_working_tape().clear_tape()
    pause_annotation()


def test_minimize_quadratic_functional():
    """min_m 0.5||m - d||^2 -> m = d."""
    mesh = UnitSquareMesh(4, 4)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    d = Function(V).interpolate(X[0] + X[1])
    m = Function(V)
    continue_annotation()
    J = fd.assemble(0.5 * inner(m - d, m - d) * dx)
    pause_annotation()
    rf = ReducedFunctional(J, Control(m))
    mopt = minimize(rf, tol=1e-12)
    assert np.abs(np.asarray(mopt.dat) - np.asarray(d.dat)).max() < 1e-5


def test_minimize_pde_constrained_source():
    """Source inversion: -lap(u) = m, J = 0.5||u - u_d||^2 + alpha/2
    ||m||^2 — gradient descent via scipy must reduce J by orders of
    magnitude and roughly recover the source."""
    mesh = UnitSquareMesh(8, 8)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    mtrue = Function(V).interpolate(X[0] * (1 - X[0]) * X[1] * (1 - X[1]))
    bc = DirichletBC(V, 0.0, "on_boundary")
    u, v = TrialFunction(V), TestFunction(V)

    ud = Function(V)
    solve(inner(grad(u), grad(v)) * dx == mtrue * v * dx, ud, bcs=[bc])

    m = Function(V)
    continue_annotation()
    uh = Function(V)
    solve(inner(grad(u), grad(v)) * dx == m * v * dx, uh, bcs=[bc])
    J = fd.assemble(0.5 * inner(uh - ud, uh - ud) * dx)
    pause_annotation()
    rf = ReducedFunctional(J, Control(m))
    J0 = rf(m)
    mopt = minimize(rf, method="L-BFGS-B", tol=1e-14,
                    options={"maxiter": 50})
    assert rf(mopt) < 1e-6 * max(J0, 1e-30) + 1e-16


def test_minimize_with_bounds():
    """Bound-constrained: min 0.5||m - d||^2 with m <= 0.5 clips d."""
    mesh = UnitSquareMesh(4, 4)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    d = Function(V).interpolate(X[0])
    m = Function(V)
    continue_annotation()
    J = fd.assemble(0.5 * inner(m - d, m - d) * dx)
    pause_annotation()
    rf = ReducedFunctional(J, Control(m))
    ub = Function(V)
    ub.dat = 0.5 * np.ones(V.dim)
    mopt = minimize(rf, method="L-BFGS-B", bounds=(None, ub), tol=1e-12)
    expect = np.minimum(np.asarray(d.dat), 0.5)
    assert np.abs(np.asarray(mopt.dat) - expect).max() < 1e-4


def test_minimize_ufl_equality_constraint():
    """min 0.5||m - d||^2 s.t. integral(m) = 0: solution is d shifted by
    its mean (projection onto the constraint set)."""
    mesh = UnitSquareMesh(4, 4)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    d = Function(V).interpolate(X[0])
    m = Function(V)
    continue_annotation()
    J = fd.assemble(0.5 * inner(m - d, m - d) * dx)
    pause_annotation()
    rf = ReducedFunctional(J, Control(m))
    con = UFLEqualityConstraint(m * dx, Control(m))
    prob = MinimizationProblem(rf, constraints=con)
    mopt = minimize(prob, tol=1e-12)
    intm = float(fd.assemble(mopt * dx))
    assert abs(intm) < 1e-8
    # KKT: m = d - lambda * (dV/dm of the volume form); optimal m is the
    # mass-orthogonal projection, so J must be below unconstrained-at-mean
    assert rf(mopt) <= 0.5 * abs(float(fd.assemble(d * dx))) + 1e-8
