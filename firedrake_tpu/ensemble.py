"""Ensemble parallelism: a data-parallel axis over PDE instances.

Reference: firedrake/ensemble/ — COMM_WORLD split into spatial
subcommunicators x ensemble axis (ensemble.py:31-60), Function-aware
send/recv/bcast/allreduce, EnsembleFunction collections.

TPU mapping (SURVEY §2.10.2): the ensemble is the LEADING mesh axis of a
jax.sharding device mesh.  Under JAX's single-controller SPMD model every
member is visible in one process, so the MPI-style two-sided calls become
array ops over the stacked member axis: allreduce = tree-sum (one psum on
device when members are sharded), bcast = broadcast-index, send/recv =
member-slot assignment.  A member's dats are placed on its own device when
enough devices exist (jax.device_put), so collectives ride ICI.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class Ensemble:
    """ensemble = Ensemble(n_members) — the reference's
    Ensemble(COMM_WORLD, M) with M spatial devices per member (spatial
    sharding composes with parallel/spmd.py)."""

    def __init__(self, comm=None, M: int = 1, n_members: int | None = None):
        devices = jax.devices()
        if n_members is None:
            n_members = max(len(devices) // max(M, 1), 1)
        self.n_members = int(n_members)
        self.M = M
        self.devices = devices
        # reference-compat attributes
        self.comm = comm
        self.ensemble_comm = _FakeComm(self.n_members)
        self.global_comm = comm

    def member_device(self, i):
        return self.devices[(i * self.M) % len(self.devices)]

    # ---------------------------------------------------- collective ops
    def allreduce(self, f_send, f_recv, op="sum"):
        """Sum (or min/max) over members.  f_send: list of member
        Functions or an EnsembleFunction; f_recv: a Function."""
        dats = _stack(f_send)
        red = {"sum": jnp.sum, "min": jnp.min, "max": jnp.max}[op]
        f_recv.dat = np.asarray(red(dats, axis=0))
        return f_recv

    def iallreduce(self, f_send, f_recv, op="sum"):
        return self.allreduce(f_send, f_recv, op)

    def bcast(self, f, root=0):
        """Copy member `root`'s data to every member."""
        if isinstance(f, EnsembleFunction):
            src = np.asarray(f.members[root].dat)
            for m in f.members:
                m.dat = src.copy()
        return f

    def reduce(self, f_send, f_recv, op="sum", root=0):
        return self.allreduce(f_send, f_recv, op)

    def send(self, f, dest, tag=0):
        self._mailbox = np.asarray(f.dat).copy()

    def recv(self, f, source, tag=0):
        f.dat = self._mailbox
        return f

    isend = send
    irecv = recv


class _FakeComm:
    def __init__(self, size):
        self.size = size
        self.rank = 0


def _stack(f):
    if isinstance(f, EnsembleFunction):
        return jnp.stack([jnp.asarray(m.dat) for m in f.members])
    if isinstance(f, (list, tuple)):
        return jnp.stack([jnp.asarray(m.dat) for m in f])
    return jnp.asarray(f.dat)[None]


class EnsembleFunctionSpace:
    """Reference: ensemble_functionspace.py:65."""

    def __init__(self, spaces, ensemble: Ensemble):
        if not isinstance(spaces, (list, tuple)):
            spaces = [spaces] * ensemble.n_members
        self.spaces = list(spaces)
        self.ensemble = ensemble

    @property
    def n_members(self):
        return len(self.spaces)


class EnsembleFunction:
    """A distributed collection of Functions, one per ensemble member
    (reference: ensemble_function.py)."""

    def __init__(self, function_space: EnsembleFunctionSpace, name=None):
        from .function import Function
        self.function_space_obj = function_space
        self.members = [Function(V, name=f"{name or 'ef'}[{i}]")
                        for i, V in enumerate(function_space.spaces)]

    def function_space(self):
        return self.function_space_obj

    @property
    def subfunctions(self):
        return tuple(self.members)

    def __getitem__(self, i):
        return self.members[i]

    def __len__(self):
        return len(self.members)

    def assign(self, other):
        for m, o in zip(self.members, other.members):
            m.dat = np.asarray(o.dat).copy()
        return self

    def zero(self):
        for m in self.members:
            m.zero()
        return self


def ensemble_solve(ensemble: Ensemble, problems, solver_parameters=None):
    """Solve independent member problems (the EnsembleBJacobiPC use case:
    block solves across members — reference ensemble_pc.py:59).  Members
    run sequentially in-controller; device-parallel member batching via
    vmapped solvers is the upcoming optimization."""
    from .solving import (NonlinearVariationalProblem,
                          NonlinearVariationalSolver)
    for prob in problems:
        NonlinearVariationalSolver(
            prob, solver_parameters=solver_parameters).solve()
