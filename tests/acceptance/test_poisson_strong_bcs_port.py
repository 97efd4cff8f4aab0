"""Acceptance port of reference
tests/firedrake/regression/test_poisson_strong_bcs.py (round-5
directive 8): Laplace with two strong BCs reproducing u = 42*y exactly,
nonlinear and linear interfaces, triangles and quadrilaterals."""
import pytest

from firedrake_tpu import *


def run_test(r, degree, parameters, quadrilateral=False):
    mesh = UnitSquareMesh(2 ** r, 2 ** r, quadrilateral=quadrilateral)
    x = SpatialCoordinate(mesh)
    V = FunctionSpace(mesh, "CG", degree)

    u = Function(V)
    v = TestFunction(V)
    a = inner(grad(u), grad(v)) * dx

    bcs = [DirichletBC(V, Constant(0), 3),
           DirichletBC(V, Constant(42), 4)]

    solve(a == 0, u, solver_parameters=parameters, bcs=bcs)

    f = Function(V)
    f.interpolate(42*x[1])

    return sqrt(assemble(inner(u - f, u - f) * dx))


def run_test_linear(r, degree, parameters, quadrilateral=False):
    mesh = UnitSquareMesh(2 ** r, 2 ** r, quadrilateral=quadrilateral)
    x = SpatialCoordinate(mesh)
    V = FunctionSpace(mesh, "CG", degree)

    u = TrialFunction(V)
    v = TestFunction(V)
    a = inner(grad(u), grad(v)) * dx
    L = inner(Constant(0), v) * dx

    bcs = [DirichletBC(V, Constant(0), 3),
           DirichletBC(V, Constant(42), 4)]

    u = Function(V)
    solve(a == L, u, solver_parameters=parameters, bcs=bcs)

    f = Function(V)
    f.interpolate(42*x[1])

    return sqrt(assemble(inner(u - f, u - f) * dx))


@pytest.mark.parametrize(['params', 'degree', 'quadrilateral'],
                         [(p, d, q)
                          for p in [{}, {'snes_type': 'ksponly',
                                         'ksp_type': 'preonly',
                                         'pc_type': 'lu'}]
                          for d in (1, 2)
                          for q in [False, True]])
def test_poisson_analytic(params, degree, quadrilateral):
    assert (run_test(2, degree, parameters=params,
                     quadrilateral=quadrilateral) < 1.e-9)


@pytest.mark.parametrize(['params', 'degree', 'quadrilateral'],
                         [(p, d, q)
                          for p in [{}, {'snes_type': 'ksponly',
                                         'ksp_type': 'preonly',
                                         'pc_type': 'lu'}]
                          for d in (1, 2)
                          for q in [False, True]])
def test_poisson_analytic_linear(params, degree, quadrilateral):
    assert (run_test_linear(2, degree, parameters=params,
                            quadrilateral=quadrilateral) < 5.e-6)
