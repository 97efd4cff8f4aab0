"""Distributed (multi-device) assembly — replicated-psum and
owner-computes halo-exchange paths, on the 8-device virtual CPU mesh
(reference analogue: mpi-pytest parallel marks, SURVEY §4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           SpatialCoordinate, UnitSquareMesh, inner, grad,
                           dx)
from firedrake_tpu.assemble import get_assembler


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 devices")


@pytest.fixture
def residual_setup():
    mesh = UnitSquareMesh(10, 10)
    V = FunctionSpace(mesh, "CG", 1)
    v = TestFunction(V)
    u = Function(V)
    X = SpatialCoordinate(mesh)
    u.interpolate(X[0] * X[1] + 2)
    F = (inner(grad(u), grad(v)) + inner(u * u, v)) * dx
    asm = get_assembler(F)
    coords = jnp.asarray(mesh.coordinates.dat)
    cd = {c.count: jnp.asarray(c.dat) for c in asm.coefficients}
    r_serial = np.asarray(asm.assemble().dat)
    return mesh, V, asm, coords, cd, r_serial


@needs_8
def test_replicated_psum_assembly(residual_setup):
    mesh, V, asm, coords, cd, r_serial = residual_setup
    from firedrake_tpu.parallel.spmd import sharded_residual_fn
    fn = sharded_residual_fn(asm, 8)
    cv = {}
    r = np.asarray(fn(coords, cd, cv))
    assert np.abs(r - r_serial).max() < 1e-12


@needs_8
def test_owner_computes_halo_assembly(residual_setup):
    mesh, V, asm, coords, cd, r_serial = residual_setup
    from firedrake_tpu.parallel.halo import (StripPartition,
                                             distributed_residual_fn)
    part = StripPartition(V, 8)
    # memory scalability: local arrays are much smaller than global
    assert part.max_local < V.dim / 2
    # spatially-coherent strips only ghost to immediate neighbors
    assert all(abs(h) == 1 for h in part.hops)
    fn = distributed_residual_fn(asm, part, 8)
    r = np.asarray(fn(coords, cd))
    assert np.abs(r - r_serial).max() < 1e-12


@needs_8
def test_partition_covers_dofs(residual_setup):
    mesh, V, asm, coords, cd, r_serial = residual_setup
    from firedrake_tpu.parallel.halo import StripPartition
    part = StripPartition(V, 8)
    owned = np.concatenate([part.local_dofs[s][:part.n_owned[s]]
                            for s in range(8)])
    # every dof owned exactly once
    assert len(owned) == V.dim
    assert len(np.unique(owned)) == V.dim
