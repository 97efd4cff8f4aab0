"""AdaptiveMeshHierarchy: GMG over NVB-bisected levels (reference:
firedrake/mg/mesh.py:433 AdaptiveMeshHierarchy via netgen)."""
import math

import numpy as np
import jax.numpy as jnp

from firedrake_tpu import (UnitSquareMesh, UnitCubeMesh, FunctionSpace,
                           Function, TrialFunction, TestFunction,
                           SpatialCoordinate, DirichletBC, dx, inner,
                           grad, sin, solve, errornorm,
                           AdaptiveMeshHierarchy,
                           LinearVariationalProblem,
                           LinearVariationalSolver)
from firedrake_tpu.mg.transfer import get_transfer, prolong


def _hierarchy_2d(seed=0, nref=2):
    amh = AdaptiveMeshHierarchy(UnitSquareMesh(8, 8))
    rng = np.random.default_rng(seed)
    for _ in range(nref):
        amh.refine(rng.random(amh.finest.num_cells) < 0.4)
    return amh


def test_adaptive_transfer_exact_linears():
    amh = _hierarchy_2d()
    Vc = FunctionSpace(amh[1], "CG", 1)
    Vf = FunctionSpace(amh[2], "CG", 1)
    t = get_transfer(Vc, Vf)
    xc, yc = SpatialCoordinate(amh[1])
    fc = Function(Vc).interpolate(1 + 2 * xc - yc)
    ff = Function(Vf)
    prolong(fc, ff)
    xf, yf = SpatialCoordinate(amh[2])
    assert errornorm(1 + 2 * xf - yf, ff) < 1e-12
    # injection of the prolonged function returns the original
    back = np.asarray(t.inject_fn(jnp.asarray(ff.dat)))
    assert np.abs(back - np.asarray(fc.dat)).max() < 1e-12
    # restriction is the exact transpose of prolongation
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal(Vc.dim))
    w = jnp.asarray(rng.standard_normal(Vf.dim))
    lhs = float(jnp.vdot(w, t.prolong_fn(u)))
    rhs = float(jnp.vdot(t.restrict_fn(w), u))
    assert abs(lhs - rhs) < 1e-11 * max(1, abs(lhs))


def test_adaptive_gmg_solve():
    """pc_type 'mg' across NVB levels: few iterations, matches LU."""
    amh = _hierarchy_2d()
    V = FunctionSpace(amh.finest, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    x, y = SpatialCoordinate(amh.finest)
    f = 2 * math.pi ** 2 * sin(math.pi * x) * sin(math.pi * y)
    a = inner(grad(u), grad(v)) * dx
    L = f * v * dx
    bcs = [DirichletBC(V, 0.0, "on_boundary")]
    uh = Function(V)
    solver = LinearVariationalSolver(
        LinearVariationalProblem(a, L, uh, bcs=bcs),
        solver_parameters={"ksp_type": "cg", "ksp_rtol": 1e-10,
                           "pc_type": "mg"})
    solver.solve()
    assert solver.ksp_iterations <= 15, solver.ksp_iterations
    ulu = Function(V)
    solve(a == L, ulu, bcs=bcs,
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    assert errornorm(ulu, uh) < 1e-8


def test_adaptive_hierarchy_3d_transfer():
    amh = AdaptiveMeshHierarchy(UnitCubeMesh(2, 2, 2))
    rng = np.random.default_rng(1)
    amh.refine(rng.random(amh.finest.num_cells) < 0.3)
    Vc = FunctionSpace(amh[0], "CG", 1)
    Vf = FunctionSpace(amh[1], "CG", 1)
    fc = Function(Vc)
    xc, yc, zc = SpatialCoordinate(amh[0])
    fc.interpolate(xc - 2 * yc + 3 * zc)
    ff = Function(Vf)
    prolong(fc, ff)
    xf, yf, zf = SpatialCoordinate(amh[1])
    assert errornorm(xf - 2 * yf + 3 * zf, ff) < 1e-12
