"""Distributed geometric multigrid (parallel/dmg.py): the V-cycle runs
per shard inside the dsolve shard_map program with hierarchy-consistent
partitions, in-program diagonals, and psum-based Chebyshev bounds
(reference role: PETSc PCMG over a distributed DMPlex hierarchy,
firedrake/mg/ under mpiexec)."""
import math

import numpy as np
import pytest

from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           TrialFunction, SpatialCoordinate,
                           UnitSquareMesh, MeshHierarchy, DirichletBC,
                           inner, grad, dx, sin, errornorm)
from firedrake_tpu.parallel.dsolve import distributed_solve
from firedrake_tpu.solving import (LinearVariationalProblem,
                                   LinearVariationalSolver)


def _setup(quad=False):
    hier = MeshHierarchy(UnitSquareMesh(4, 4, quadrilateral=quad), 3)
    mesh = hier[-1]
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = 2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1])
    return mesh, V, u, v, X, f


def _serial(a, L, bcs, V):
    us = Function(V)
    prob = LinearVariationalProblem(a, L, us, bcs=bcs)
    s = LinearVariationalSolver(prob, solver_parameters={
        "ksp_type": "cg", "pc_type": "mg", "ksp_rtol": 1e-9})
    s.solve()
    return us, s.ksp_iterations


def test_distributed_mg_matches_serial():
    mesh, V, u, v, X, f = _setup()
    a = inner(grad(u), grad(v)) * dx
    L = f * v * dx
    bc = DirichletBC(V, 0.0, "on_boundary")
    us, its_s = _serial(a, L, [bc], V)
    ud = Function(V)
    distributed_solve(a, L, ud, bcs=[bc], nshards=8, rtol=1e-9,
                      pc_type="mg")
    assert ud._dist_iterations == its_s
    assert np.abs(np.asarray(ud.dat) - np.asarray(us.dat)).max() < 1e-9
    ex = sin(math.pi * X[0]) * sin(math.pi * X[1])
    assert errornorm(ex, ud) < 2e-3


def test_distributed_mg_variable_coefficient_nonzero_bc():
    mesh, V, u, v, X, f = _setup()
    w = Function(V).interpolate(1 + X[0] * X[1])
    a = w * inner(grad(u), grad(v)) * dx
    L = f * v * dx
    g = Function(V).interpolate(X[0] + X[1])
    bc = DirichletBC(V, g, "on_boundary")
    us, its_s = _serial(a, L, [bc], V)
    ud = Function(V)
    distributed_solve(a, L, ud, bcs=[bc], nshards=8, rtol=1e-9,
                      pc_type="mg")
    assert ud._dist_iterations == its_s
    assert np.abs(np.asarray(ud.dat) - np.asarray(us.dat)).max() < 1e-8


def test_distributed_mg_via_solver_parameters():
    mesh, V, u, v, X, f = _setup(quad=True)
    from firedrake_tpu import solve
    a = inner(grad(u), grad(v)) * dx
    L = f * v * dx
    bc = DirichletBC(V, 0.0, "on_boundary")
    uh = Function(V)
    solve(a == L, uh, bcs=[bc], solver_parameters={
        "distributed": 8, "ksp_type": "cg", "pc_type": "mg",
        "ksp_rtol": 1e-9})
    ex = sin(math.pi * X[0]) * sin(math.pi * X[1])
    assert errornorm(ex, uh) < 2e-3
