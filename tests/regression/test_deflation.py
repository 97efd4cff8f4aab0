"""Deflated Newton (deflation.py) + nonlinear patch smoothing
(npc_snes_type "patch", the PatchSNES/SNESPATCH role).

Reference: firedrake/deflation.py, tests/firedrake/deflation/
test_bratu.py, firedrake/preconditioners/patch.py (PatchSNES)."""
import numpy as np

from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           SpatialCoordinate, UnitIntervalMesh,
                           UnitSquareMesh, DirichletBC, Constant,
                           Deflation, inner, grad, exp, dx, norm,
                           errornorm)
from firedrake_tpu.solving import (NonlinearVariationalProblem,
                                   NonlinearVariationalSolver)


def test_bratu_two_solutions():
    """The 1D Bratu problem at lambda=2 has two solutions; deflation of
    the first from the same initial guess finds the second (mirrors
    tests/firedrake/deflation/test_bratu.py)."""
    mesh = UnitIntervalMesh(10)
    V = FunctionSpace(mesh, "CG", 3)
    x = SpatialCoordinate(mesh)[0]
    u = Function(V)
    guess = Function(V).interpolate(6 * x * (1 - x))
    v = TestFunction(V)
    lmbda = Constant(2)
    F = -inner(grad(u), grad(v)) * dx + lmbda * inner(exp(u), v) * dx
    bcs = DirichletBC(V, 0, "on_boundary")
    problem = NonlinearVariationalProblem(F, u, bcs)
    sp = {"snes_type": "deflated", "snes_linesearch_type": "basic",
          "ksp_type": "preonly", "pc_type": "lu", "snes_max_it": 100}
    deflation = Deflation(op=lambda a, b: inner(a - b, a - b) * dx)
    solver = NonlinearVariationalSolver(problem, solver_parameters=sp,
                                        appctx={"deflation": deflation})
    u.dat = np.asarray(guess.dat).copy()
    solver.solve()
    assert solver.converged
    # first solution deflated; same guess now converges elsewhere
    u.dat = np.asarray(guess.dat).copy()
    solver.solve()
    assert solver.converged
    first, second = deflation.roots
    assert norm(first - second) > 1


def test_deflation_pointwise_roots():
    """F = (u^2 - 1) v dx has u = +1 and u = -1; deflating the branch
    Newton finds first yields the other from the SAME initial guess."""
    mesh = UnitSquareMesh(4, 4)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = Function(V), TestFunction(V)
    F = (u * u - 1) * v * dx
    problem = NonlinearVariationalProblem(F, u)
    deflation = Deflation()
    solver = NonlinearVariationalSolver(
        problem, solver_parameters={"ksp_type": "preonly",
                                    "pc_type": "lu",
                                    "snes_max_it": 100},
        appctx={"deflation": deflation})
    u.dat = 0.5 * np.ones(V.dim)
    solver.solve()
    assert solver.converged
    assert abs(float(np.asarray(u.dat).mean()) - 1.0) < 1e-6
    u.dat = 0.5 * np.ones(V.dim)
    solver.solve()
    assert solver.converged
    assert abs(float(np.asarray(u.dat).mean()) + 1.0) < 1e-6
    assert len(deflation) == 2


def _nonlinear_poisson(n=8):
    mesh = UnitSquareMesh(n, n)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = Function(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = X[0] * X[1]
    F = (1 + 4 * u * u) * inner(grad(u), grad(v)) * dx - f * v * dx
    bc = DirichletBC(V, 0.0, "on_boundary")
    return V, u, F, bc


def test_npc_patch_smoother_reduces_newton_iterations():
    """Nonlinear patch relaxation before each Newton step (left
    nonlinear preconditioning) must not increase and should reduce the
    outer Newton count, converging to the same solution."""
    V, u_plain, F, bc = _nonlinear_poisson()
    prob = NonlinearVariationalProblem(F, u_plain, bcs=[bc])
    tight = {"snes_rtol": 1e-10, "ksp_type": "preonly", "pc_type": "lu"}
    s0 = NonlinearVariationalSolver(prob, solver_parameters=tight)
    s0.solve()
    its_plain = s0.snes_iterations

    V, u_pat, F2, bc2 = _nonlinear_poisson()
    prob2 = NonlinearVariationalProblem(F2, u_pat, bcs=[bc2])
    s1 = NonlinearVariationalSolver(prob2, solver_parameters={
        **tight, "npc_snes_type": "patch", "npc_snes_max_it": 2})
    s1.solve()
    assert s1.converged
    assert s1.snes_iterations <= its_plain
    assert errornorm(u_plain, u_pat) < 1e-8


def test_npc_patch_preserves_dirichlet():
    V, u, F, bc = _nonlinear_poisson(4)
    g = Function(V).interpolate(SpatialCoordinate(V.mesh_obj)[0])
    bcg = DirichletBC(V, g, "on_boundary")
    prob = NonlinearVariationalProblem(F, u, bcs=[bcg])
    s = NonlinearVariationalSolver(prob, solver_parameters={
        "snes_rtol": 1e-10, "ksp_type": "preonly", "pc_type": "lu",
        "npc_snes_type": "patch"})
    s.solve()
    assert s.converged
    idx = np.asarray(bcg.dof_indices)
    assert np.abs(np.asarray(u.dat)[idx]
                  - np.asarray(g.dat)[idx]).max() < 1e-12
