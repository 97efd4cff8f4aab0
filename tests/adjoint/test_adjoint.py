"""Adjoint gradients (reference: tests/firedrake/adjoint/ — e.g.
test_reduced_functional.py, taylor tests)."""
import math

import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           SpatialCoordinate, UnitSquareMesh, DirichletBC,
                           Constant, inner, grad, dx, solve, sin)
from firedrake_tpu.adjoint import (continue_annotation, pause_annotation,
                                   get_working_tape, Control,
                                   ReducedFunctional, taylor_test)


@pytest.fixture(autouse=True)
def clean_tape():
    get_working_tape().clear_tape()
    pause_annotation()
    yield
    get_working_tape().clear_tape()
    pause_annotation()


def test_functional_only_gradient():
    """J(m) = 0.5||m||^2: dJ/dm = M m (mass-weighted gradient)."""
    mesh = UnitSquareMesh(4, 4)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    m = Function(V).interpolate(X[0])
    continue_annotation()
    J = fd.assemble(0.5 * inner(m, m) * dx)
    pause_annotation()
    rf = ReducedFunctional(J, Control(m))
    g = rf.derivative()
    # compare with assembled mass action
    from firedrake_tpu import TrialFunction
    u, v = TrialFunction(V), TestFunction(V)
    M = fd.assemble(inner(u, v) * dx)
    expect = M.to_scipy() @ np.asarray(m.dat)
    assert np.abs(np.asarray(g.dat) - expect).max() < 1e-12


def test_pde_constrained_taylor():
    """J = 0.5||u - d||^2 with -lap(u) = m: Taylor order ~2."""
    mesh = UnitSquareMesh(6, 6)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    m = Function(V, name="control").interpolate(X[0] * X[1])
    u = Function(V, name="state")
    v = TestFunction(V)
    bc = DirichletBC(V, 0.0, "on_boundary")
    d = Function(V).interpolate(sin(math.pi * X[0]) * sin(math.pi * X[1]))

    continue_annotation()
    F = (inner(grad(u), grad(v)) - inner(m, v)) * dx
    solve(F == 0, u, bcs=[bc],
          solver_parameters={"ksp_rtol": 1e-13})
    J = fd.assemble(0.5 * inner(u - d, u - d) * dx)
    pause_annotation()

    rf = ReducedFunctional(J, Control(m))
    h = Function(V)
    h.dat = np.random.default_rng(0).standard_normal(V.dim) * 0.1
    order = taylor_test(rf, m, h)
    assert order > 1.9, order


def test_replay_changes_value():
    mesh = UnitSquareMesh(4, 4)
    V = FunctionSpace(mesh, "CG", 1)
    m = Function(V).assign(1.0)
    u = Function(V)
    v = TestFunction(V)
    bc = DirichletBC(V, 0.0, "on_boundary")
    continue_annotation()
    F = (inner(grad(u), grad(v)) - inner(m, v)) * dx
    solve(F == 0, u, bcs=[bc], solver_parameters={"ksp_rtol": 1e-13})
    J = fd.assemble(inner(u, u) * dx)
    pause_annotation()
    rf = ReducedFunctional(J, Control(m))
    J1 = rf(m)
    m2 = Function(V).assign(2.0)
    J2 = rf(m2)
    # linear PDE: u scales with m, J quadratic -> factor 4
    assert abs(J2 / J1 - 4.0) < 1e-6


def test_time_dependent_adjoint():
    """Variable versioning: a time loop reuses the same Function objects
    (solve + assign hand-off); each block snapshots its step's values so
    the reverse sweep evaluates Jacobians at the right states
    (reference: pyadjoint block variables / firedrake burgers adjoint
    demo)."""
    import math
    from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                               SpatialCoordinate, UnitSquareMesh,
                               DirichletBC, inner, grad, dx, solve, sin,
                               assemble)
    from firedrake_tpu.adjoint import (continue_annotation,
                                       pause_annotation,
                                       get_working_tape,
                                       ReducedFunctional, Control,
                                       taylor_test)
    mesh = UnitSquareMesh(6, 6)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    dt = 0.05
    v = TestFunction(V)
    bcs = [DirichletBC(V, 0.0, "on_boundary")]
    u0 = Function(V).interpolate(
        sin(math.pi * X[0]) * sin(math.pi * X[1]))
    tape = get_working_tape()
    tape.clear_tape()
    continue_annotation()
    u_prev = Function(V)
    u_prev.assign(u0)
    u = Function(V)
    for n in range(3):
        F = ((u - u_prev) / dt * v + inner(grad(u), grad(v))) * dx
        solve(F == 0, u, bcs=bcs)
        u_prev.assign(u)
    J = assemble(u * u * dx)
    pause_annotation()
    rf = ReducedFunctional(J, Control(u0))
    h = Function(V).interpolate(
        0.1 * X[0] * (1 - X[0]) * X[1] * (1 - X[1]))
    assert taylor_test(rf, u0, h) > 1.9


def test_constant_control_gradient():
    """dJ/dConstant via the adjoint matches finite differences
    (reference: pyadjoint Control(Constant))."""
    import numpy as np
    from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                               UnitSquareMesh, DirichletBC, Constant,
                               inner, grad, dx, solve, assemble)
    from firedrake_tpu.adjoint import (continue_annotation,
                                       pause_annotation,
                                       get_working_tape,
                                       ReducedFunctional, Control)
    mesh = UnitSquareMesh(6, 6)
    V = FunctionSpace(mesh, "CG", 1)
    v = TestFunction(V)
    bcs = [DirichletBC(V, 0.0, "on_boundary")]

    def run(cval, annotate=False):
        get_working_tape().clear_tape()
        c = Constant(cval)
        if annotate:
            continue_annotation()
        u = Function(V)
        solve((inner(grad(u), grad(v)) - c * v) * dx == 0, u, bcs=bcs)
        J = assemble(u * u * dx)
        if annotate:
            pause_annotation()
        return float(J), c, J

    _, c, J = run(2.0, annotate=True)
    g = float(ReducedFunctional(J, Control(c)).derivative())
    eps = 1e-6
    fd = (run(2.0 + eps)[0] - run(2.0 - eps)[0]) / (2 * eps)
    assert abs(g - fd) / abs(fd) < 1e-6


def test_form_adjoint_is_transpose():
    """adjoint(a) assembles to the exact matrix transpose, including
    NONSYMMETRIC operators (advection) — regression for the
    number-swap bug that left integrands untransposed."""
    import math
    import numpy as np
    from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                               UnitIntervalMesh, SpatialCoordinate,
                               grad, dx, sin, assemble)
    from firedrake_tpu.language.calculus import derivative, adjoint
    mesh = UnitIntervalMesh(8)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    v = TestFunction(V)
    u = Function(V).interpolate(0.5 + 0.3 * sin(math.pi * X[0]))
    F = (u * v + 0.02 * u * grad(u)[0] * v) * dx
    Ju = derivative(F, u)
    A = assemble(Ju).to_scipy().toarray()
    AT = assemble(adjoint(Ju)).to_scipy().toarray()
    assert np.abs(AT - A.T).max() < 1e-14


def test_time_dependent_burgers_adjoint():
    """Nonlinear (Burgers) time loop: gradients through nonsymmetric
    Jacobians and state hand-offs pass the Taylor test."""
    import math
    from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                               UnitIntervalMesh, SpatialCoordinate,
                               DirichletBC, grad, dx, solve, sin,
                               assemble, inner)
    from firedrake_tpu.adjoint import (continue_annotation,
                                       pause_annotation,
                                       get_working_tape,
                                       ReducedFunctional, Control,
                                       taylor_test)
    mesh = UnitIntervalMesh(20)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    v = TestFunction(V)
    dt, nu = 0.02, 0.05
    u0 = Function(V).interpolate(sin(math.pi * X[0]))
    get_working_tape().clear_tape()
    continue_annotation()
    u_prev = Function(V)
    u_prev.assign(u0)
    u = Function(V)
    for n in range(3):
        F = ((u - u_prev) / dt * v + u * grad(u)[0] * v
             + nu * grad(u)[0] * grad(v)[0]) * dx
        solve(F == 0, u, bcs=[DirichletBC(V, 0.0, "on_boundary")])
        u_prev.assign(u)
    J = assemble(u * u * dx)
    pause_annotation()
    rf = ReducedFunctional(J, Control(u0))
    h = Function(V).interpolate(0.1 * X[0] * (1 - X[0]))
    assert taylor_test(rf, u0, h) > 1.9
