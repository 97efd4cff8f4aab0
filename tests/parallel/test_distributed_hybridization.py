"""Distributed hybridization (round-4 verdict directive #5): the
H(div) x DG flagship runs on the parallelism layer — per-shard static
condensation + one shard_map trace solve (parallel/dhybrid.py),
routed via solver_parameters={"distributed": n, "pc_type":
"hybridization"}.

Reference: slate/static_condensation/hybridization.py:18 under MPI.
Partition-independence is checked directly: nshards=1 runs the same
program and must agree with nshards=8 and with the serial path.
"""
import numpy as np
import pytest

from firedrake_tpu import (FunctionSpace, MixedFunctionSpace, Function,
                           TestFunctions, TrialFunctions,
                           SpatialCoordinate, UnitSquareMesh, inner,
                           div, dx, solve, sin)


def _mixed_poisson(nx, family, degree):
    mesh = UnitSquareMesh(nx, nx)
    S = FunctionSpace(mesh, family, degree)
    U = FunctionSpace(mesh, "DG", degree - 1)
    W = MixedFunctionSpace([S, U])
    sigma, u = TrialFunctions(W)
    tau, v = TestFunctions(W)
    X = SpatialCoordinate(mesh)
    import math
    pi = math.pi
    f = 2 * pi ** 2 * sin(pi * X[0]) * sin(pi * X[1])
    a = (inner(sigma, tau) + div(tau) * u + div(sigma) * v) * dx
    L = -f * v * dx
    return W, a, L


@pytest.mark.parametrize("family,degree", [("RT", 1), ("BDM", 1),
                                           ("RT", 2)])
def test_distributed_hybridization_matches_serial(family, degree):
    W, a, L = _mixed_poisson(6, family, degree)

    ref = Function(W)
    solve(a == L, ref, solver_parameters={
        "ksp_type": "preonly", "pc_type": "hybridization"})

    w = Function(W)
    solve(a == L, w, solver_parameters={
        "distributed": 8, "pc_type": "hybridization",
        "ksp_rtol": 1e-12})

    for got, want in zip(w.subfunctions, ref.subfunctions):
        scale = max(np.abs(np.asarray(want.dat)).max(), 1.0)
        assert np.abs(np.asarray(got.dat)
                      - np.asarray(want.dat)).max() / scale < 1e-9


def test_partition_independence():
    W, a, L = _mixed_poisson(5, "RT", 1)
    sols = []
    for nsh in (1, 8):
        w = Function(W)
        solve(a == L, w, solver_parameters={
            "distributed": nsh, "pc_type": "hybridization",
            "ksp_rtol": 1e-12})
        sols.append(np.concatenate(
            [np.asarray(s.dat) for s in w.subfunctions]))
    assert np.abs(sols[0] - sols[1]).max() < 1e-9
