"""FAS nonlinear multigrid (snes_type 'fas', solvers/fas.py) — the
SNES-level multigrid composition (PETSc SNESFAS role; reference
exposes it through the options database on hierarchy meshes).

Bratu: -lap(u) = lam * exp(u), u=0 on the boundary (lam below the
critical value) — the canonical FAS test problem.
"""
import numpy as np

from firedrake_tpu import (Function, FunctionSpace, MeshHierarchy,
                           TestFunction, UnitSquareMesh, DirichletBC,
                           dx, exp, grad, inner, solve)


def _bratu(mesh, lam=2.0):
    V = FunctionSpace(mesh, "CG", 1)
    u = Function(V)
    v = TestFunction(V)
    F = (inner(grad(u), grad(v)) - lam * exp(u) * v) * dx
    bc = DirichletBC(V, 0.0, "on_boundary")
    return u, F, bc


def test_fas_matches_newton():
    hier = MeshHierarchy(UnitSquareMesh(4, 4), 2)
    mesh = hier.meshes[-1]
    u_new, F_new, bc = _bratu(mesh)
    solve(F_new == 0, u_new, bcs=bc, solver_parameters={
        "snes_rtol": 1e-10, "ksp_type": "preonly", "pc_type": "lu"})
    assert np.asarray(u_new.dat).max() > 0.1   # nontrivial solution

    u_fas, F_fas, bc2 = _bratu(mesh)
    solve(F_fas == 0, u_fas, bcs=bc2, solver_parameters={
        "snes_type": "fas", "snes_rtol": 1e-9})
    np.testing.assert_allclose(np.asarray(u_fas.dat),
                               np.asarray(u_new.dat), atol=5e-8)


def test_fas_cycle_count_mesh_independent():
    """FAS cycles should not blow up as the hierarchy deepens."""
    from firedrake_tpu.solving import NonlinearVariationalProblem, \
        NonlinearVariationalSolver
    counts = []
    for levels in (1, 2):
        hier = MeshHierarchy(UnitSquareMesh(4, 4), levels)
        u, F, bc = _bratu(hier.meshes[-1])
        prob = NonlinearVariationalProblem(F, u, bcs=[bc])
        s = NonlinearVariationalSolver(prob, solver_parameters={
            "snes_type": "fas", "snes_rtol": 1e-8})
        s.solve()
        assert s.converged
        counts.append(s.snes_iterations)
    assert counts[-1] <= counts[0] + 3, counts
