"""Nonlinear solves: Newton path, Burgers time-stepping, matrix-free
Jacobian actions (reference: demos/burgers, demos/matrix_free,
tests/firedrake/regression/test_matrix_free.py)."""
import math

import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, VectorFunctionSpace, Function,
                           TestFunction, TrialFunction, SpatialCoordinate,
                           UnitSquareMesh, DirichletBC, Constant, inner,
                           dot, grad, nabla_grad, dx, solve, errornorm, sin,
                           derivative, NonlinearVariationalProblem,
                           NonlinearVariationalSolver)


def test_nonlinear_poisson_newton():
    """-div((1+u^2) grad u) = 1, homogeneous bcs: converges quadratically
    and matches the assembled-Jacobian reference."""
    mesh = UnitSquareMesh(8, 8)
    V = FunctionSpace(mesh, "CG", 1)
    u = Function(V)
    v = TestFunction(V)
    F = inner((1 + u * u) * grad(u), grad(v)) * dx \
        - inner(Constant(1.0), v) * dx
    bc = DirichletBC(V, 0.0, "on_boundary")
    problem = NonlinearVariationalProblem(F, u, bcs=[bc])
    solver = NonlinearVariationalSolver(
        problem, solver_parameters={"snes_rtol": 1e-10,
                                    "ksp_rtol": 1e-12})
    solver.solve()
    assert solver.converged
    assert solver.snes_iterations <= 6     # Newton should be fast
    umax = float(np.max(np.asarray(u.dat)))
    assert 0.05 < umax < 0.1


def test_nonlinear_matfree_matches_assembled():
    mesh = UnitSquareMesh(6, 6)
    V = FunctionSpace(mesh, "CG", 1)
    bc = DirichletBC(V, 0.0, "on_boundary")

    def run(mat_type):
        u = Function(V)
        v = TestFunction(V)
        F = inner((1 + u * u) * grad(u), grad(v)) * dx \
            - inner(Constant(1.0), v) * dx
        solve(F == 0, u, bcs=[bc],
              solver_parameters={"snes_rtol": 1e-10, "ksp_rtol": 1e-12,
                                 "mat_type": mat_type,
                                 "ksp_type": "cg"})
        return np.asarray(u.dat)

    ua = run("aij")
    um = run("matfree")
    assert np.abs(ua - um).max() < 1e-8


def test_linear_matfree():
    mesh = UnitSquareMesh(8, 8)
    V = FunctionSpace(mesh, "CG", 2)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = Function(V).interpolate(
        2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1]))
    a = inner(grad(u), grad(v)) * dx
    L = inner(f, v) * dx
    bc = DirichletBC(V, 0.0, "on_boundary")
    uh = Function(V)
    solve(a == L, uh, bcs=[bc],
          solver_parameters={"mat_type": "matfree", "ksp_type": "cg",
                             "ksp_rtol": 1e-11})
    # accuracy limited by P2 interpolation of f (~h^3)
    err = errornorm(sin(math.pi * X[0]) * sin(math.pi * X[1]), uh)
    assert err < 1e-3, err
    # and matfree must agree with the assembled path to solver tolerance
    uh2 = Function(V)
    solve(a == L, uh2, bcs=[bc],
          solver_parameters={"ksp_type": "cg", "ksp_rtol": 1e-11})
    assert np.abs(np.asarray(uh.dat) - np.asarray(uh2.dat)).max() < 1e-9


def test_burgers_stability():
    """2D Burgers (demos/burgers/burgers.py.rst): implicit Euler steps with
    Newton; checks energy decay and no blow-up."""
    n = 8
    mesh = UnitSquareMesh(n, n)
    V = VectorFunctionSpace(mesh, "CG", 2)
    X = SpatialCoordinate(mesh)
    u_ = Function(V, name="u_")
    u = Function(V, name="u")
    v = TestFunction(V)
    from firedrake_tpu import as_vector
    ic = as_vector([sin(math.pi * X[0]), 0.0])
    u_.interpolate(ic)
    u.assign(u_)
    nu = Constant(0.0001)
    dt = 1.0 / n
    F = (inner((u - u_) / dt, v)
         + inner(dot(u, nabla_grad(u)), v)
         + nu * inner(grad(u), grad(v))) * dx
    energies = [float(fd.assemble(inner(u, u) * dx))]
    for _ in range(3):
        solve(F == 0, u, solver_parameters={"snes_rtol": 1e-8,
                                            "ksp_rtol": 1e-10})
        u_.assign(u)
        energies.append(float(fd.assemble(inner(u, u) * dx)))
    e = np.array(energies)
    assert np.isfinite(e).all()
    assert (np.diff(e) <= 1e-10).all(), e   # dissipative
