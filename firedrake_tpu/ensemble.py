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
    """Solve independent member problems given as a heterogeneous list
    (the general EnsembleBJacobiPC shape — reference ensemble_pc.py:59).
    Heterogeneous problems cannot share one XLA program, so they run
    sequentially; for the homogeneous case (same forms, per-member
    coefficient values) use `ensemble_batched_solve`, which runs ALL
    members as one jitted program sharded over the member axis."""
    from .solving import (NonlinearVariationalProblem,
                          NonlinearVariationalSolver)
    for prob in problems:
        NonlinearVariationalSolver(
            prob, solver_parameters=solver_parameters).solve()


def ensemble_batched_solve(ensemble: Ensemble, a, L, u: EnsembleFunction,
                           bcs=(), varying=(), solver_parameters=None):
    """Device-parallel ensemble: ONE jitted vmapped Krylov solve over the
    member axis, sharded across the ensemble devices (XLA partitions the
    embarrassingly-parallel member dimension; each member's while_loop
    runs on its own device, collectives-free).

    a, L       shared forms; Functions listed in `varying` take
               per-member values.
    u          EnsembleFunction receiving the member solutions.
    varying    iterable of (function_in_forms, EnsembleFunction | array
               (n_members, ndof)) pairs.
    Reference role: firedrake ensemble solves where each ensemble rank
    solves its member's PDE concurrently (ensemble.py:31-60)."""
    import jax
    from jax.sharding import Mesh as JMesh, PartitionSpec as P
    from jax.sharding import NamedSharding
    from .solving import _action_cached, _bc_data, _merged_params
    from .assemble import get_assembler
    from .solvers.krylov import KSP_METHODS

    params = _merged_params(solver_parameters)
    n_members = len(u.members)
    V = u.members[0].function_space()
    n = V.dim

    af = _action_cached(a)
    aasm = get_assembler(af)
    xf = af._mf_coeff
    Lasm = get_assembler(L)
    coords = jnp.asarray(V.mesh_obj.coordinates.dat)

    var_counts = {}
    stacked = {}
    for fn_, ef in varying:
        dats = _stack(ef)
        assert dats.shape[0] == n_members
        var_counts[fn_.count] = True
        stacked[fn_.count] = dats

    bc_idx, g = _bc_data(bcs, n)
    gj = jnp.asarray(g)
    idx = jnp.asarray(bc_idx) if len(bc_idx) else None

    ksp = KSP_METHODS[params.get("ksp_type", "cg")]
    rtol = params.get("ksp_rtol", 1e-7)
    maxit = int(params.get("ksp_max_it", 10000))

    fixed_a = {c.count: jnp.asarray(c.dat) for c in aasm.coefficients
               if c is not xf and c.count not in var_counts}
    fixed_L = {c.count: jnp.asarray(c.dat) for c in Lasm.coefficients
               if c.count not in var_counts}
    cv_a = {c.count: jnp.asarray(c.values()) for c in aasm.constants}
    cv_L = {c.count: jnp.asarray(c.values()) for c in Lasm.constants}

    def member_solve(vdats):
        """One member: assemble rhs + matrix-free constrained CG."""
        cd_L = dict(fixed_L)
        for cnt in var_counts:
            if any(c.count == cnt for c in Lasm.coefficients):
                cd_L[cnt] = vdats[cnt]
        b = Lasm._run(coords, cd_L, cv_L)

        def raw_op(x):
            cd = dict(fixed_a)
            for cnt in var_counts:
                if any(c.count == cnt for c in aasm.coefficients):
                    cd[cnt] = vdats[cnt]
            cd[xf.count] = x
            return aasm._run(coords, cd, cv_a)

        if idx is not None:
            mask = jnp.zeros(n).at[idx].set(1.0)
            free = 1.0 - mask

            def op(x):
                return free * raw_op(x * free) + x * mask
            bv = free * (b - raw_op(gj * mask)) + gj * mask
        else:
            op = raw_op
            bv = b
        res = ksp(op, bv, rtol=rtol, max_it=maxit)
        return res.x, res.iterations

    if not stacked:
        # identical members: one solve, broadcast
        x, it = jax.jit(member_solve)({})
        for m in u.members:
            m.dat = np.asarray(x)
        return u, np.full(n_members, int(it))

    vm = jax.vmap(member_solve)
    # shard the member axis over the ensemble devices: XLA runs members
    # concurrently (ICI-free embarrassing parallelism)
    devs = np.array(ensemble.devices[:max(
        1, min(len(ensemble.devices), n_members))])
    vdats_in = {cnt: jnp.asarray(v) for cnt, v in stacked.items()}
    if len(devs) > 1 and n_members % len(devs) == 0:
        jm = JMesh(devs, ("members",))
        sh = NamedSharding(jm, P("members"))
        vdats_in = {cnt: jax.device_put(v, sh)
                    for cnt, v in vdats_in.items()}
    xs, its = jax.jit(vm)(vdats_in)
    xs = np.asarray(xs)
    for i, m in enumerate(u.members):
        m.dat = xs[i]
    return u, np.asarray(its)
