"""Poisson with strong Dirichlet BCs (reference:
tests/firedrake/regression/test_poisson_strong_bcs.py — asserts the exact
linear solution is reproduced to solver tolerance)."""
import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           TrialFunction, SpatialCoordinate, UnitSquareMesh,
                           DirichletBC, Constant, inner, grad, dx, solve,
                           errornorm)


@pytest.mark.parametrize("degree", [1, 2])
@pytest.mark.parametrize("params", [
    {"ksp_type": "cg", "pc_type": "jacobi", "ksp_rtol": 1e-12},
    {"ksp_type": "gmres", "pc_type": "jacobi", "ksp_rtol": 1e-12},
    {"ksp_type": "preonly", "pc_type": "lu"},
])
def test_poisson_linear_exact(degree, params):
    """Laplace with u=0 on y=0 and u=42 on y=1 -> u = 42 y exactly."""
    mesh = UnitSquareMesh(8, 8)
    V = FunctionSpace(mesh, "CG", degree)
    u = TrialFunction(V)
    v = TestFunction(V)
    f = Constant(0.0)
    a = inner(grad(u), grad(v)) * dx
    L = inner(f, v) * dx
    bcs = [DirichletBC(V, 0.0, 3), DirichletBC(V, 42.0, 4)]
    uh = Function(V)
    solve(a == L, uh, bcs=bcs, solver_parameters=params)
    X = SpatialCoordinate(mesh)
    assert errornorm(42.0 * X[1], uh) < 1e-9


def test_poisson_analytic_convergence():
    """-Δu = f with u = x(1-x)y(1-y)·? Use manufactured solution
    u = sin(πx)sin(πy), f = 2π² u, homogeneous BCs everywhere."""
    import math
    from firedrake_tpu import sin
    errs = []
    for n in [8, 16, 32]:
        mesh = UnitSquareMesh(n, n)
        V = FunctionSpace(mesh, "CG", 1)
        u, v = TrialFunction(V), TestFunction(V)
        X = SpatialCoordinate(mesh)
        x, y = X[0], X[1]
        f = Function(V).interpolate(
            2 * math.pi ** 2 * sin(math.pi * x) * sin(math.pi * y))
        bc = DirichletBC(V, 0.0, "on_boundary")
        uh = Function(V)
        solve(inner(grad(u), grad(v)) * dx == inner(f, v) * dx, uh,
              bcs=[bc],
              solver_parameters={"ksp_type": "cg", "pc_type": "jacobi",
                                 "ksp_rtol": 1e-12})
        errs.append(errornorm(sin(math.pi * x) * sin(math.pi * y), uh))
    orders = np.log2(np.array(errs[:-1]) / np.array(errs[1:]))
    assert (orders > 1.9).all(), (errs, orders)


def test_nonhomogeneous_bc_function():
    """BC given as a Function; solution == bc field when harmonic."""
    mesh = UnitSquareMesh(6, 6)
    V = FunctionSpace(mesh, "CG", 2)
    X = SpatialCoordinate(mesh)
    g = Function(V).interpolate(1 + X[0] + 2 * X[1])
    u, v = TrialFunction(V), TestFunction(V)
    uh = Function(V)
    solve(inner(grad(u), grad(v)) * dx == inner(Constant(0.0), v) * dx,
          uh, bcs=[DirichletBC(V, g, "on_boundary")],
          solver_parameters={"ksp_type": "cg", "pc_type": "jacobi",
                             "ksp_rtol": 1e-13})
    assert errornorm(1 + X[0] + 2 * X[1], uh) < 1e-9


def test_component_bcs():
    """DirichletBC on V.sub(i) constrains one component (reference:
    ComponentFunctionSpace bcs)."""
    from firedrake_tpu import VectorFunctionSpace, as_vector
    mesh = UnitSquareMesh(6, 6)
    V = VectorFunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    u, v = TrialFunction(V), TestFunction(V)
    bcs = [DirichletBC(V.sub(0), 0.0, 3), DirichletBC(V.sub(1), 0.0, 3),
           DirichletBC(V, Constant([1.0, 0.0]), 4)]
    uh = Function(V)
    solve(inner(grad(u), grad(v)) * dx
          == inner(Constant([0.0, 0.0]), v) * dx,
          uh, bcs=bcs,
          solver_parameters={"ksp_type": "cg", "pc_type": "jacobi",
                             "ksp_rtol": 1e-12})
    assert errornorm(as_vector([X[1], 0.0 * X[0]]), uh) < 1e-9
