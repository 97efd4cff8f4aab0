"""SPMD determinism guards (SURVEY §5.2; reference pyop2
PYOP2_SPMD_STRICT / check_src_hashes roles): reduction-order
reproducibility under resharding, bitwise run-to-run determinism, and
stable kernel lowering."""
import math
import os

import numpy as np
import pytest
import jax

from firedrake_tpu import (UnitSquareMesh, FunctionSpace, Function,
                           TrialFunction, TestFunction,
                           SpatialCoordinate, DirichletBC, dx, inner,
                           grad, sin, solve)
from firedrake_tpu.parallel.dsolve import distributed_solve
from firedrake_tpu.utils.guards import kernel_fingerprint


def _problem(n=12):
    mesh = UnitSquareMesh(n, n)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = 2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1])
    a = inner(grad(u), grad(v)) * dx
    L = f * v * dx
    bcs = [DirichletBC(V, 0.0, "on_boundary")]
    return V, a, L, bcs


def test_resharding_reproducibility():
    """The f64 1e-10 gate: the same solve over 2, 4, and 8 shards
    agrees with the serial answer regardless of how the psum reduction
    tree regroups."""
    V, a, L, bcs = _problem()
    us = Function(V)
    solve(a == L, us, bcs=bcs, solver_parameters={
        "ksp_type": "cg", "pc_type": "jacobi", "ksp_rtol": 1e-13})
    ref = np.asarray(us.dat)
    for ns in (2, 4, 8):
        ud = Function(V)
        distributed_solve(a, L, ud, bcs=bcs, nshards=ns, rtol=1e-13)
        d = np.abs(np.asarray(ud.dat) - ref).max()
        assert d < 1e-10, (ns, d)


def test_bitwise_run_to_run_determinism():
    """Two executions of the identical distributed program are
    bitwise equal (XLA collectives are deterministic for a fixed
    program + topology)."""
    V, a, L, bcs = _problem()
    u1, u2 = Function(V), Function(V)
    distributed_solve(a, L, u1, bcs=bcs, nshards=8, rtol=1e-12)
    distributed_solve(a, L, u2, bcs=bcs, nshards=8, rtol=1e-12)
    assert np.array_equal(np.asarray(u1.dat), np.asarray(u2.dat))


def test_spmd_strict_mode(monkeypatch):
    """FDTPU_SPMD_STRICT=1 double-executes and passes on a
    deterministic program."""
    monkeypatch.setenv("FDTPU_SPMD_STRICT", "1")
    V, a, L, bcs = _problem(8)
    ud = Function(V)
    distributed_solve(a, L, ud, bcs=bcs, nshards=4, rtol=1e-12)
    us = Function(V)
    solve(a == L, us, bcs=bcs, solver_parameters={
        "ksp_type": "cg", "pc_type": "jacobi", "ksp_rtol": 1e-12})
    assert np.abs(np.asarray(ud.dat) - np.asarray(us.dat)).max() < 1e-9


def test_kernel_fingerprint_stable():
    """check_src_hashes analogue: two independent lowerings of equal
    forms produce the identical program hash; a different form does
    not."""
    mesh = UnitSquareMesh(6, 6)
    V = FunctionSpace(mesh, "CG", 2)
    u, v = TrialFunction(V), TestFunction(V)
    a1 = inner(grad(u), grad(v)) * dx
    a2 = inner(grad(u), grad(v)) * dx
    m = inner(u, v) * dx
    f1 = kernel_fingerprint(a1)
    f2 = kernel_fingerprint(a2)
    fm = kernel_fingerprint(m)
    assert f1 == f2
    assert f1 != fm


def test_check_replicated_inside_shard_map():
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from firedrake_tpu.utils.guards import check_replicated
    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("shards",))

    def body(x):
        rep = jax.lax.psum(jnp.sum(x), "shards")   # replicated
        dev_rep = check_replicated(rep, "shards")
        dev_div = check_replicated(jnp.sum(x), "shards")  # divergent
        return dev_rep, dev_div

    x = jnp.arange(8.0)
    f = shard_map(body, mesh=mesh, in_specs=(P("shards"),),
                  out_specs=(P(), P()))
    rep, div = jax.jit(f)(x)
    assert float(rep) == 0.0
    assert float(div) > 0.0
