"""EquationBC (reference: tests/firedrake/equation_bcs/)."""
import numpy as np

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           SpatialCoordinate, UnitSquareMesh, EquationBC,
                           DirichletBC, inner, grad, dx, ds, solve,
                           errornorm)


def test_equation_bc_weak_dirichlet():
    """Boundary mass equation u = 1 + x reproduces the harmonic exact
    solution to machine precision."""
    mesh = UnitSquareMesh(8, 8)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    u = Function(V)
    v = TestFunction(V)
    F = inner(grad(u), grad(v)) * dx
    ebc = EquationBC(inner(u - (1 + X[0]), v) * ds == 0, u, "on_boundary")
    solve(F == 0, u, bcs=[ebc],
          solver_parameters={"snes_rtol": 1e-12, "ksp_type": "preonly",
                             "pc_type": "lu"})
    assert errornorm(1 + X[0], u) < 1e-8


def test_equation_bc_mixed_with_dirichlet():
    """EquationBC on one side + strong Dirichlet elsewhere."""
    mesh = UnitSquareMesh(8, 8)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    u = Function(V)
    v = TestFunction(V)
    F = inner(grad(u), grad(v)) * dx
    ebc = EquationBC(inner(u - X[1], v) * ds(1) == 0, u, 1)
    bcs = [ebc,
           DirichletBC(V, Function(V).interpolate(X[1]), (2, 3, 4))]
    solve(F == 0, u, bcs=bcs,
          solver_parameters={"snes_rtol": 1e-12, "ksp_type": "preonly",
                             "pc_type": "lu"})
    assert errornorm(X[1], u) < 1e-8
