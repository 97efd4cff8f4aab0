"""Ensemble x spatial 2-axis device mesh (reference: firedrake.Ensemble
— ensemble.py:31-60 splits COMM_WORLD into spatial x ensemble comms so
each member's PDE is itself MPI-distributed).  Here: one shard_map
program over a jax Mesh of shape (members, shards); spatial collectives
name only the inner axis."""
import math

import numpy as np
import pytest
import jax

from firedrake_tpu import (UnitSquareMesh, FunctionSpace, Function,
                           TrialFunction, TestFunction,
                           SpatialCoordinate, DirichletBC, dx, inner,
                           grad, sin, solve)
from firedrake_tpu.parallel.densemble import ensemble_distributed_solve


def _setup(n=10):
    mesh = UnitSquareMesh(n, n)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    f = Function(V, name="f")
    a = (inner(grad(u), grad(v)) + inner(u, v)) * dx
    L = inner(f, v) * dx
    bcs = [DirichletBC(V, 0.0, "on_boundary")]
    return V, f, a, L, bcs


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_ensemble_distributed_matches_serial(shape):
    M, S = shape
    assert len(jax.devices()) >= M * S
    V, f, a, L, bcs = _setup()
    rng = np.random.default_rng(3)
    fvals = rng.standard_normal((M, V.dim))
    us = [Function(V) for _ in range(M)]
    ensemble_distributed_solve(a, L, us, bcs=bcs,
                               varying=[(f, fvals)], nshards=S,
                               rtol=1e-12)
    for m in range(M):
        f.dat = fvals[m]
        ur = Function(V)
        solve(a == L, ur, bcs=bcs, solver_parameters={
            "ksp_type": "cg", "pc_type": "jacobi", "ksp_rtol": 1e-12})
        d = np.abs(np.asarray(us[m].dat) - np.asarray(ur.dat)).max()
        assert d < 1e-9, (m, d)


def test_ensemble_distributed_shared_rhs():
    """No varying coefficients: all members identical (degenerate but
    exercises replicated-coefficient specs)."""
    V, f, a, L, bcs = _setup(8)
    X = SpatialCoordinate(V.mesh_obj)
    f.interpolate(sin(math.pi * X[0]) * X[1])
    us = [Function(V) for _ in range(2)]
    ensemble_distributed_solve(a, L, us, bcs=bcs, nshards=4,
                               rtol=1e-12)
    ur = Function(V)
    solve(a == L, ur, bcs=bcs, solver_parameters={
        "ksp_type": "cg", "pc_type": "jacobi", "ksp_rtol": 1e-12})
    for u in us:
        assert np.abs(np.asarray(u.dat) - np.asarray(ur.dat)).max() < 1e-9
