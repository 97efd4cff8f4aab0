"""End-to-end SPMD conjugate gradients over the owner-computes halo
layer (reference: the PETSc KSP MatMult/VecDot distributed path;
SURVEY §2.10).  Runs on the 8-virtual-device CPU mesh."""
import math

import numpy as np
import jax

from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           TrialFunction, SpatialCoordinate,
                           UnitSquareMesh, inner, grad, dx, solve, sin,
                           assemble)
from firedrake_tpu.parallel.solve import distributed_solve


def test_distributed_cg_matches_serial():
    assert len(jax.devices()) >= 8
    mesh = UnitSquareMesh(12, 12)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = (1 + 2 * math.pi ** 2) * sin(math.pi * X[0]) \
        * sin(math.pi * X[1])
    a = (inner(grad(u), grad(v)) + u * v) * dx
    L = f * v * dx

    ud = Function(V)
    distributed_solve(a, L, ud, nshards=8, rtol=1e-12)

    us = Function(V)
    solve(a == L, us, solver_parameters={
        "ksp_type": "cg", "pc_type": "none", "ksp_rtol": 1e-12})

    d = np.abs(np.asarray(ud.dat) - np.asarray(us.dat)).max()
    assert d < 1e-8, d
    assert ud._dist_iterations > 0


def test_distributed_cg_with_coefficient():
    """Operator with an extra (non-unknown) coefficient distributes."""
    assert len(jax.devices()) >= 8
    mesh = UnitSquareMesh(10, 10)
    V = FunctionSpace(mesh, "CG", 2)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    kappa = Function(V).interpolate(1.0 + X[0] * X[1])
    a = (kappa * inner(grad(u), grad(v)) + u * v) * dx
    L = v * dx
    ud = Function(V)
    distributed_solve(a, L, ud, nshards=8, rtol=1e-12)
    us = Function(V)
    solve(a == L, us, solver_parameters={
        "ksp_type": "cg", "pc_type": "none", "ksp_rtol": 1e-12})
    assert np.abs(np.asarray(ud.dat) - np.asarray(us.dat)).max() < 1e-8
