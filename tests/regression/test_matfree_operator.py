"""MatrixFreeOperator (assembly/matfree.py): action-assembly operators
with diagonal-only assembly, composing with jacobi/chebyshev/mg.
Reference: firedrake/matrix_free/operators.py:211 ImplicitMatrix and
the demos/matrix_free/ configuration."""
import numpy as np
import jax.numpy as jnp
import pytest

from firedrake_tpu import (
    DirichletBC, Function, FunctionSpace, LinearVariationalProblem,
    LinearVariationalSolver, MeshHierarchy, SpatialCoordinate,
    TestFunction, TrialFunction, UnitCubeMesh, UnitSquareMesh, assemble,
    dx, errornorm, grad, inner, interpolate, sin, solve,
)
from firedrake_tpu.assembly.matfree import MatrixFreeOperator


def test_matvec_and_diagonal_match_assembled():
    m = UnitCubeMesh(3, 3, 2)
    V = FunctionSpace(m, "CG", 2)
    u, v = TrialFunction(V), TestFunction(V)
    x, y, z = SpatialCoordinate(m)
    w = interpolate(1 + x * y, V)
    a = (inner(grad(u), grad(v)) + w * u * v) * dx
    A, M = assemble(a), MatrixFreeOperator(a)
    xv = np.random.default_rng(1).standard_normal(V.dim)
    assert np.abs(np.asarray(A.matvec(xv))
                  - np.asarray(M.matvec(xv))).max() < 1e-12
    assert np.abs(np.asarray(A.diagonal())
                  - np.asarray(M.diagonal())).max() < 1e-13
    rows = jnp.asarray(DirichletBC(V, 0.0, "on_boundary").dof_indices)
    Ab, Mb = A.with_dirichlet(rows), M.with_dirichlet(rows)
    assert np.abs(np.asarray(Ab.matvec(xv))
                  - np.asarray(Mb.matvec(xv))).max() < 1e-12
    assert np.abs(np.asarray(Ab.diagonal())
                  - np.asarray(Mb.diagonal())).max() < 1e-13


def test_matfree_jacobi_cg_solve():
    # mat_type matfree now supports pc jacobi (diagonal-only assembly)
    import math
    m = UnitSquareMesh(12, 12)
    V = FunctionSpace(m, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    x, y = SpatialCoordinate(m)
    uex = sin(math.pi * x) * sin(math.pi * y)
    sol = Function(V)
    solve(inner(grad(u), grad(v)) * dx == 2 * math.pi ** 2 * uex * v * dx,
          sol, bcs=[DirichletBC(V, 0.0, "on_boundary")],
          solver_parameters={"mat_type": "matfree", "ksp_type": "cg",
                             "pc_type": "jacobi", "ksp_rtol": 1e-10})
    assert errornorm(uex, sol) < 2e-2


def test_matfree_gmg_matches_assembled():
    # the north-star solver configuration: matrix-free fine level inside
    # geometric multigrid — identical V-cycle, no materialized operator
    import math
    mh = MeshHierarchy(UnitSquareMesh(4, 4), 2)
    V = FunctionSpace(mh[-1], "CG", 2)
    u, v = TrialFunction(V), TestFunction(V)
    x, y = SpatialCoordinate(mh[-1])
    uex = sin(math.pi * x) * sin(math.pi * y)
    a = inner(grad(u), grad(v)) * dx
    L = 2 * math.pi ** 2 * uex * v * dx
    its = {}
    for tag, sp in {
        "assembled": {"ksp_type": "cg", "pc_type": "mg",
                      "ksp_rtol": 1e-10},
        "matfree": {"ksp_type": "cg", "pc_type": "mg", "ksp_rtol": 1e-10,
                    "mat_type": "matfree",
                    "mg_fine_mat_type": "matfree"},
    }.items():
        sol = Function(V)
        solver = LinearVariationalSolver(
            LinearVariationalProblem(
                a, L, sol, bcs=DirichletBC(V, 0.0, "on_boundary")),
            solver_parameters=sp)
        solver.solve()
        its[tag] = solver.ksp_iterations
        assert errornorm(uex, sol) < 1e-3
    assert its["matfree"] == its["assembled"]
