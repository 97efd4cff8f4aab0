"""Solver composition: nullspaces, fieldsplit, ksp variants (reference:
tests/firedrake/regression/test_nullspace.py, test_fieldsplit_*.py)."""
import math

import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, VectorFunctionSpace,
                           MixedFunctionSpace, Function, TestFunction,
                           TrialFunction, TestFunctions, TrialFunctions,
                           SpatialCoordinate, UnitSquareMesh, DirichletBC,
                           Constant, inner, grad, div, dx, solve, cos,
                           errornorm, as_vector, VectorSpaceBasis,
                           LinearVariationalProblem,
                           LinearVariationalSolver)


def test_neumann_poisson_nullspace():
    mesh = UnitSquareMesh(12, 12)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = Function(V).interpolate(cos(2 * math.pi * X[0]))
    uh = Function(V)
    prob = LinearVariationalProblem(inner(grad(u), grad(v)) * dx,
                                    inner(f, v) * dx, uh)
    s = LinearVariationalSolver(
        prob, solver_parameters={"ksp_type": "cg", "pc_type": "jacobi",
                                 "ksp_rtol": 1e-11},
        nullspace=VectorSpaceBasis(constant=True))
    s.solve()
    assert s.converged
    # the algebraic constant component is removed (PETSc MatNullSpace
    # semantics): dof-sum is zero
    assert abs(float(np.asarray(uh.dat).sum())) < 1e-8
    # compare against the exact solution modulo constants
    ex = cos(2 * math.pi * X[0]) / (4 * math.pi ** 2)
    c = float(fd.assemble((uh - ex) * dx))
    assert errornorm(ex + Constant(c), uh) < 0.01


@pytest.mark.parametrize("fs_type,max_its", [("additive", 200),
                                             ("schur", 60)])
def test_stokes_fieldsplit(fs_type, max_its):
    mesh = UnitSquareMesh(6, 6)
    Vv = VectorFunctionSpace(mesh, "CG", 2)
    Q = FunctionSpace(mesh, "CG", 1)
    W = MixedFunctionSpace([Vv, Q])
    u, p = TrialFunctions(W)
    v, q = TestFunctions(W)
    X = SpatialCoordinate(mesh)
    a = (inner(grad(u), grad(v)) - p * div(v) - q * div(u)) * dx
    L = inner(Constant([0.0, 0.0]), v) * dx
    uex = as_vector([X[1] * (1 - X[1]), 0.0])
    bcs = [DirichletBC(W.sub(0), Function(Vv).interpolate(uex),
                       (1, 2, 3, 4))]
    w = Function(W)
    prob = LinearVariationalProblem(a, L, w, bcs=bcs)
    s = LinearVariationalSolver(prob, solver_parameters={
        "ksp_type": "gmres", "pc_type": "fieldsplit",
        "pc_fieldsplit_type": fs_type,
        "fieldsplit_0_ksp_type": "preonly", "fieldsplit_0_pc_type": "lu",
        "fieldsplit_1_ksp_type": "preonly",
        "fieldsplit_1_pc_type": "jacobi",
        "ksp_rtol": 1e-11, "ksp_max_it": 3000,
        "ksp_gmres_restart": 100})
    s.solve()
    uh, ph = w.subfunctions
    assert errornorm(uex, uh) < 1e-8
    assert s.ksp_iterations <= max_its


@pytest.mark.parametrize("ksp", ["cg", "gmres", "bicgstab", "minres"])
def test_ksp_variants(ksp):
    mesh = UnitSquareMesh(8, 8)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    from firedrake_tpu import sin
    f = Function(V).interpolate(sin(math.pi * X[0]) * sin(math.pi * X[1]))
    bc = DirichletBC(V, 0.0, "on_boundary")
    uh = Function(V)
    solve(inner(grad(u), grad(v)) * dx == inner(f, v) * dx, uh, bcs=[bc],
          solver_parameters={"ksp_type": ksp, "pc_type": "jacobi",
                             "ksp_rtol": 1e-11})
    ex = sin(math.pi * X[0]) * sin(math.pi * X[1]) / (2 * math.pi ** 2)
    assert errornorm(ex, uh) < 2e-3


def test_star_patch_pc():
    """Vertex-star additive Schwarz (reference: ASMStarPC /
    preconditioners/asm.py): one batched dense solve over all patches;
    converges faster than jacobi and to the same solution."""
    import math
    import numpy as np
    from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                               TrialFunction, SpatialCoordinate,
                               UnitSquareMesh, DirichletBC, inner, grad,
                               dx, sin, LinearVariationalProblem,
                               LinearVariationalSolver)
    mesh = UnitSquareMesh(10, 10)
    V = FunctionSpace(mesh, "CG", 2)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = 2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1])
    a = inner(grad(u), grad(v)) * dx
    L = f * v * dx
    bcs = [DirichletBC(V, 0.0, "on_boundary")]
    sols, its = [], []
    for pc in ("patch", "jacobi"):
        uh = Function(V)
        s = LinearVariationalSolver(
            LinearVariationalProblem(a, L, uh, bcs=bcs),
            solver_parameters={"ksp_type": "cg", "pc_type": pc,
                               "ksp_rtol": 1e-10})
        s.solve()
        sols.append(np.asarray(uh.dat))
        its.append(int(s.ksp_iterations))
    assert np.abs(sols[0] - sols[1]).max() < 1e-8
    assert its[0] < its[1], its
