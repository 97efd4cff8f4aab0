"""Ensemble x spatial composition: ONE shard_map program over a 2-axis
device mesh ("ens", "shards").

Reference: firedrake.Ensemble splits COMM_WORLD into a spatial
communicator times an ensemble communicator (ensemble.py:31-60), so M
ensemble members each solve their PDE distributed over S ranks.  Here
the same composition is a single jitted program over a jax Mesh of
shape (M, S): the member axis is the outer (DCN-ready) mesh axis, the
spatial axis the inner (ICI) one, spatial collectives (psum/ppermute)
name only the "shards" axis so members never synchronize except the
final replicated iteration-count pmax.

This IS the multi-host layout on real hardware: jax orders devices
host-major, so the outer mesh axis maps across hosts (DCN) and the
inner axis to intra-host ICI — member solves never cross DCN, and the
spatial halo exchange rides ICI.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .dsolve import DistributedLinearSolver, _localize


class EnsembleDistributedSolver(DistributedLinearSolver):
    """M member solves of the same (a, L) family, each SPMD over S
    spatial shards; Functions in `varying` take per-member values."""

    def __init__(self, a, L, V, n_members, bcs=(), varying_counts=(),
                 nshards=None, devices=None, **kw):
        from jax.sharding import Mesh as JMesh
        nsh = nshards or (len(jax.devices()) // n_members)
        devs = (devices if devices is not None
                else jax.devices()[:n_members * nsh])
        if len(devs) < n_members * nsh:
            raise ValueError(f"need {n_members * nsh} devices")
        super().__init__(a, L, V, bcs=bcs, nshards=nsh,
                         devices=devs[:nsh], **kw)
        self.n_members = n_members
        self._ens = n_members
        self._var_counts = set(varying_counts)
        self.jmesh = JMesh(np.array(devs).reshape(n_members, nsh),
                           ("ens", "shards"))

    def solve_members(self, us, varying=()):
        """us: list of M Functions receiving the solutions.  varying:
        [(Function_in_forms, (M, ndof) array)] per-member values."""
        if self._jitted is None:
            self._jitted = self._build()
        M, S = self.n_members, self.nshards
        vp = self.vpart
        var = {fn.count: np.asarray(dats) for fn, dats in varying}
        assert set(var) == self._var_counts, (set(var), self._var_counts)

        def loc_var(dats, part):
            # (M, ndof) -> (M*S, max_local), member-major
            return jnp.concatenate(
                [_localize(dats[m], part) for m in range(M)])

        clocals = {}
        for c in self.dact.asm.coefficients:
            if c is self.xf:
                continue
            part = self.dact.coeff_parts[c.count]
            clocals[c.count] = (loc_var(var[c.count], part)
                                if c.count in var
                                else _localize(c.dat, part))
        if self.dres is not None:
            for c in self.dres.asm.coefficients:
                if c.count in clocals:
                    continue
                part = self.dres.coeff_parts[c.count]
                clocals[c.count] = (loc_var(var[c.count], part)
                                    if c.count in var
                                    else _localize(c.dat, part))
        dlocals = {}
        if self.ddiag is not None:
            for c in self.ddiag.asm.coefficients:
                part = self.ddiag.coeff_parts[c.count]
                dlocals[c.count] = (loc_var(var[c.count], part)
                                    if c.count in var
                                    else _localize(c.dat, part))
        cvals = {c.count: jnp.asarray(c.values())
                 for c in self.dact.asm.constants}
        if self.dres is not None:
            for c in self.dres.asm.constants:
                cvals.setdefault(c.count, jnp.asarray(c.values()))
        if self.ddiag is not None:
            for c in self.ddiag.asm.constants:
                cvals.setdefault(c.count, jnp.asarray(c.values()))
        mesh = self.V.mesh_obj
        coords_blk = _localize(mesh.coordinates.dat, self.cpart)
        x0_blk = jnp.zeros((M * S, vp.max_local))
        dres_st = self.dres.statics if self.dres else []
        dres_acc = self.dres.acc if self.dres else \
            {"perm": jnp.zeros((S, 1), jnp.int32),
             "seg": jnp.zeros((S, 1), jnp.int32)}
        ddiag_st = self.ddiag.statics if self.ddiag else []
        ddiag_acc = self.ddiag.acc if self.ddiag else \
            {"perm": jnp.zeros((S, 1), jnp.int32),
             "seg": jnp.zeros((S, 1), jnp.int32)}
        mg_data = self.dmg.data if self.dmg is not None else 0.0
        dmat_st = self.dmat.statics if self.dmat else []
        dmat_acc = self.dmat.acc if self.dmat else \
            {"perm": jnp.zeros((S, 1), jnp.int32),
             "seg": jnp.zeros((S, 1), jnp.int32)}
        ecols = self.dmat.ell_cols if self.dmat else \
            jnp.zeros((S, 1), jnp.int32)
        xowned, it = self._jitted(
            coords_blk, clocals, cvals, dlocals, self.g_loc,
            x0_blk, jnp.asarray(self.freemask), self.ex,
            self.dact.statics, self.dact.acc, dres_st, dres_acc,
            ddiag_st, ddiag_acc, dmat_st, dmat_acc, ecols, mg_data)
        xarr = np.asarray(xowned).reshape(M, S, vp.max_owned)
        m = vp.owned_mask.astype(bool)
        for i, u in enumerate(us):
            out = np.zeros(self.V.dim)
            out[vp.owned_global[m]] = xarr[i][m]
            u.dat = out
        self.iterations = int(it)
        return us


def ensemble_distributed_solve(a, L, us, bcs=(), varying=(),
                               nshards=None, rtol=1e-10, maxit=5000,
                               pc_type="jacobi"):
    """Solve M = len(us) members of a == L, each distributed over
    `nshards` spatial shards, as one program on an (M, nshards) device
    mesh.  `varying`: [(Function_in_forms, (M, ndof) array)]."""
    V = us[0].function_space()
    solver = EnsembleDistributedSolver(
        a, L, V, len(us), bcs=bcs,
        varying_counts=[fn.count for fn, _ in varying],
        nshards=nshards, rtol=rtol, maxit=maxit, pc_type=pc_type)
    return solver.solve_members(us, varying=varying)
