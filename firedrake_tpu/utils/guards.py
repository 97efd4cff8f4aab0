"""SPMD correctness guards (SURVEY §5.2; reference: pyop2's
PYOP2_SPMD_STRICT barrier guards, mpi.py:159, and check_src_hashes
divergent-codegen detection, pyop2/configuration.py).

The reference's SPMD hazard class is per-rank divergence: ranks
compiling different kernels or reaching collectives in different
orders.  Here one process traces ONE program for all shards, so
divergent codegen is structurally impossible — the remaining hazards
are (a) nondeterministic collective reductions and (b) unstable
lowering (the same form producing different programs across rebuilds,
which would poison the persistent compile cache).  Guards:

- ``FDTPU_SPMD_STRICT=1``: DistributedLinearSolver.solve() executes
  the jitted shard_map program twice and asserts BITWISE identical
  results — XLA collectives are deterministic for a fixed program and
  topology, so any difference means a real nondeterminism bug.
- ``kernel_fingerprint(form)``: stable hash of the form's lowered
  jaxpr (the check_src_hashes analogue) — two independent
  FormAssembler builds of equal forms must agree.
- ``check_replicated(x, axis)``: inside a shard_map body, the maximum
  cross-shard deviation of a value that must be replicated (use as a
  returned diagnostic; 0.0 when consistent).
"""
from __future__ import annotations

import hashlib
import os

import jax
import jax.numpy as jnp


def spmd_strict() -> bool:
    return bool(os.environ.get("FDTPU_SPMD_STRICT"))


def check_replicated(x, axis_name):
    """Max deviation of `x` from its cross-shard mean (traceable; call
    inside a shard_map body over `axis_name`).  Replicated values
    return exactly 0.0."""
    n = jax.lax.psum(1, axis_name)
    mean = jax.lax.psum(x, axis_name) / n
    return jax.lax.pmax(jnp.max(jnp.abs(x - mean)), axis_name)


def kernel_fingerprint(form, bcs=()) -> str:
    """Stable hash of the form's lowered device program (reference
    check_src_hashes role: detect divergent codegen for what should be
    the same kernel).  Two FormAssembler builds of structurally equal
    forms on the same mesh must produce identical fingerprints."""
    from ..assemble import FormAssembler

    asm = FormAssembler(form, bcs=bcs)
    coords = jnp.asarray(asm.mesh.coordinates.dat)
    coeffs = {c.count: jnp.asarray(c.dat) for c in asm.coefficients}
    consts = {c.count: jnp.asarray(c.values()) for c in asm.constants}
    statics = (None if (asm._stencil is not None
                        or asm._column is not None)
               else asm._arg_statics)
    jaxpr = jax.make_jaxpr(asm._run)(coords, coeffs, consts, statics,
                                     asm._acc_args)
    return hashlib.sha256(str(jaxpr).encode()).hexdigest()
