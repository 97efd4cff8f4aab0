"""FDMPC + P1PC (reference: firedrake/preconditioners/fdm.py,
low_order.py; exercised there by tests/firedrake/regression/test_fdm.py).

The FDM additive-Schwarz + Q1-coarse preconditioner must give
mesh-independent CG iteration counts on variable-coefficient Poisson
for Q_k on quads/hexes, and match a direct solve."""
import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (UnitSquareMesh, UnitCubeMesh, FunctionSpace,
                           Function, TestFunction, TrialFunction,
                           SpatialCoordinate, DirichletBC, Constant,
                           LinearVariationalProblem,
                           LinearVariationalSolver,
                           inner, grad, dx, sin, cos, errornorm)

pi = np.pi


def poisson_problem(mesh, degree, alpha):
    V = FunctionSpace(mesh, "CG", degree)
    u, v = TrialFunction(V), TestFunction(V)
    a = alpha * inner(grad(u), grad(v)) * dx
    X = SpatialCoordinate(mesh)
    f = Constant(1.0) + X[0]
    L = f * v * dx
    bcs = [DirichletBC(V, 0.0, "on_boundary")]
    return V, a, L, bcs


def solve_with(mesh, degree, params, appctx=None):
    X = SpatialCoordinate(mesh)
    alpha = 1.0 + 0.7 * sin(pi * X[0]) * cos(pi * X[1])
    V, a, L, bcs = poisson_problem(mesh, degree, alpha)
    uh = Function(V)
    prob = LinearVariationalProblem(a, L, uh, bcs=bcs)
    s = LinearVariationalSolver(prob, solver_parameters=params,
                                appctx=dict(appctx or {},
                                            fdm_coef=alpha))
    s.solve()
    return uh, s


FDM_PARAMS = {"ksp_type": "cg", "ksp_rtol": 1e-10, "ksp_max_it": 200,
              "pc_type": "python", "pc_python_type": "firedrake.FDMPC"}


def test_fdm_quad_mesh_independent():
    its, errs = [], []
    for n in (8, 16, 32):
        mesh = UnitSquareMesh(n, n, quadrilateral=True)
        uh, s = solve_with(mesh, 3, FDM_PARAMS)
        assert s.converged
        its.append(int(s.ksp_iterations))
        ulu, _ = solve_with(mesh, 3, {"ksp_type": "preonly",
                                      "pc_type": "lu"})
        errs.append(errornorm(ulu, uh))
    # two-level FDM: iteration counts do not grow with refinement
    assert its[2] <= its[0] + 3, its
    assert max(its) < 60, its
    assert max(errs) < 1e-8, errs


def test_fdm_hex():
    its = []
    for n in (3, 5):
        mesh = UnitCubeMesh(n, n, n, hexahedral=True)
        uh, s = solve_with(mesh, 3, FDM_PARAMS)
        assert s.converged
        its.append(int(s.ksp_iterations))
        ulu, _ = solve_with(mesh, 3, {"ksp_type": "preonly",
                                      "pc_type": "lu"})
        assert errornorm(ulu, uh) < 1e-8
    assert its[1] <= its[0] + 5, its


def test_fdm_anisotropic_cells():
    # stretched grid: per-axis extents differ 8x; FDM absorbs the
    # anisotropy through the 1/h_d^2 eigen-scalings
    mesh = fd.RectangleMesh(24, 3, 1.0, 1.0, quadrilateral=True)
    uh, s = solve_with(mesh, 2, FDM_PARAMS)
    assert s.converged
    ulu, _ = solve_with(mesh, 2, {"ksp_type": "preonly", "pc_type": "lu"})
    assert errornorm(ulu, uh) < 1e-8
    # cell-wise AS degrades under inter-cell anisotropic coupling (the
    # regime the reference treats with ASM line smoothers); the FDM
    # eigen-scalings keep it convergent
    assert int(s.ksp_iterations) < 150


def test_fdm_reaction_term():
    mesh = UnitSquareMesh(12, 12, quadrilateral=True)
    V = FunctionSpace(mesh, "CG", 3)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    a = inner(grad(u), grad(v)) * dx + 10.0 * u * v * dx
    L = (1.0 + X[1]) * v * dx
    uh = Function(V)
    prob = LinearVariationalProblem(a, L, uh, bcs=[])
    s = LinearVariationalSolver(prob, solver_parameters=FDM_PARAMS,
                                appctx={"fdm_mass_coef": Constant(10.0)})
    s.solve()
    assert s.converged
    u2 = Function(V)
    LinearVariationalSolver(
        LinearVariationalProblem(a, L, u2, bcs=[]),
        solver_parameters={"ksp_type": "preonly",
                           "pc_type": "lu"}).solve()
    assert errornorm(u2, uh) < 1e-8


def test_p1pc():
    its = []
    for n in (8, 16):
        mesh = UnitSquareMesh(n, n)
        V = FunctionSpace(mesh, "CG", 4)
        u, v = TrialFunction(V), TestFunction(V)
        a = inner(grad(u), grad(v)) * dx
        X = SpatialCoordinate(mesh)
        L = sin(pi * X[0]) * sin(pi * X[1]) * v * dx
        bcs = [DirichletBC(V, 0.0, "on_boundary")]
        uh = Function(V)
        prob = LinearVariationalProblem(a, L, uh, bcs=bcs)
        s = LinearVariationalSolver(prob, solver_parameters={
            "ksp_type": "cg", "ksp_rtol": 1e-10, "ksp_max_it": 300,
            "pc_type": "python", "pc_python_type": "firedrake.P1PC"})
        s.solve()
        assert s.converged
        its.append(int(s.ksp_iterations))
        ex = sin(pi * X[0]) * sin(pi * X[1]) / (2 * pi ** 2)
        assert errornorm(ex, uh) < 5e-4
    assert its[1] <= its[0] + 6, its
