"""p-multigrid (reference: firedrake/preconditioners/pmg.py PMGPC)."""
import math

import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           TrialFunction, SpatialCoordinate, UnitSquareMesh,
                           DirichletBC, inner, grad, dx, sin, errornorm,
                           LinearVariationalProblem,
                           LinearVariationalSolver)


@pytest.mark.parametrize("degree", [3, 4])
def test_pmg_poisson(degree):
    mesh = UnitSquareMesh(12, 12)
    V = FunctionSpace(mesh, "CG", degree)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = Function(V).interpolate(
        2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1]))
    bc = DirichletBC(V, 0.0, "on_boundary")
    uh = Function(V)
    prob = LinearVariationalProblem(inner(grad(u), grad(v)) * dx,
                                    inner(f, v) * dx, uh, bcs=[bc])
    s = LinearVariationalSolver(
        prob, solver_parameters={"ksp_type": "cg", "pc_type": "pmg",
                                 "ksp_rtol": 1e-10})
    s.solve()
    assert s.ksp_iterations <= 20
    assert errornorm(sin(math.pi * X[0]) * sin(math.pi * X[1]),
                     uh) < 1e-4


def test_p_transfer_exact():
    """P1->P3 prolongation reproduces P1 functions exactly; restriction
    is the transpose."""
    from firedrake_tpu.mg.pmg import PLevelTransfer
    import jax.numpy as jnp
    mesh = UnitSquareMesh(3, 3)
    Vc = FunctionSpace(mesh, "CG", 1)
    Vf = FunctionSpace(mesh, "CG", 3)
    t = PLevelTransfer(Vc, Vf)
    X = SpatialCoordinate(mesh)
    fc = Function(Vc).interpolate(1 + X[0] - 2 * X[1])
    ff = Function(Vf).interpolate(1 + X[0] - 2 * X[1])
    up = np.asarray(t.prolong_fn(jnp.asarray(fc.dat)))
    assert np.abs(up - np.asarray(ff.dat)).max() < 1e-12
    rng = np.random.default_rng(3)
    r = rng.standard_normal(Vf.dim)
    c = rng.standard_normal(Vc.dim)
    lhs = np.dot(np.asarray(t.restrict_fn(jnp.asarray(r))), c)
    rhs = np.dot(r, np.asarray(t.prolong_fn(jnp.asarray(c))))
    assert abs(lhs - rhs) < 1e-10 * max(abs(lhs), 1)
