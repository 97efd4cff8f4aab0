"""Distributed linear solves: one shard_map program containing the
whole preconditioned CG loop over general partitions, with Dirichlet
BCs, every integral type (cell/ds/dS), and Jacobi or geometric-
multigrid preconditioning.

Reference role: firedrake's `solve()` running on an MPI communicator —
PETSc KSP with VecDot = allreduce over owned dofs, MatMult = halo
exchange + local kernels (firedrake/halo.py, pyop2/parloop.py:245-260),
PCMG over the distributed hierarchy (firedrake/mg/).

TPU shape:
- vectors live SHARDED as padded [owned | ghost] blocks; Krylov dot
  products are `psum` of owned partials;
- EVERY input to the jitted program is a per-shard block (coords,
  coefficients, bc values, x0 are host-localized once per solve) —
  no O(global) array enters the iteration program;
- the Jacobi diagonal is assembled IN PROGRAM (DistributedForm diag
  mode) — not from a serial host assembly;
- the operator application is the serial assembler's own jitted
  program run per shard on localized statics (dassemble.py), wrapped in
  ghost-refresh (bcast) / ghost-sum (reduce) ppermute legs;
- Dirichlet rows are identity through free/bc masks:
      A_c = P A P + (I - P),  b_c = P (b - A g) + (I - P) g
  matching the serial `_constrained_op` (solving.py);
- pc_type "mg" runs a per-shard V-cycle (parallel/dmg.py) whose levels
  share the hierarchy-consistent partition;
- the result is collected ONCE at the end (owned blocks out, host
  scatter to global numbering).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh as JMesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .partition import MeshPartition
from .dassemble import DistributedForm, halo_reduce, halo_bcast


def _specs_like(tree):
    return jax.tree_util.tree_map(lambda _: P("shards"), tree)


def _localize(dat, sp):
    """Host: global vector -> (nshards, max_local) padded blocks."""
    return jnp.asarray(np.asarray(dat)[sp.local_global] * sp.local_mask)


class DistributedLinearSolver:
    """CG (+ Jacobi/GMG) over an n-device 'shards' mesh for a == L with
    DirichletBCs.  Built once per (form, partition); solve() is one
    jitted shard_map call."""

    def __init__(self, a, L, V, bcs=(), nshards=None, devices=None,
                 rtol=1e-10, atol=1e-50, maxit=5000, pc_type="jacobi",
                 ksp_type="cg", mat_type="action", restart=30):
        from ..solving import _action_cached, _bc_data
        from ..solvers.krylov import KSP_METHODS

        nshards = nshards or len(jax.devices())
        self.nshards = nshards
        mesh = V.mesh_obj
        self.V = V
        self.pc_type = pc_type
        if ksp_type not in KSP_METHODS:
            raise NotImplementedError(
                f"distributed ksp_type {ksp_type!r}")
        self.ksp_type = ksp_type
        self.restart = restart
        parts = {}
        self.dmg = None
        if pc_type == "mg":
            from .dmg import DistributedGMG
            self.dmg = DistributedGMG(a, bcs, V, nshards, parts)
            self.mpart = self.dmg.mparts[-1]
        elif pc_type in ("jacobi", "none"):
            self.mpart = MeshPartition(mesh, nshards)
        else:
            raise NotImplementedError(
                f"distributed pc_type {pc_type!r} (jacobi/none/mg)")
        af = _action_cached(a)
        self.xf = af._mf_coeff
        self.dact = DistributedForm(af, self.mpart, parts)
        # assembled operator: the shard-local ELL block is built ONCE
        # inside the program; each matvec is then SpMV + halo instead
        # of a per-iteration action assembly
        self.dmat = DistributedForm(a, self.mpart, parts, matrix=True) \
            if mat_type == "assembled" else None
        self.dres = DistributedForm(L, self.mpart, parts) \
            if L is not None else None
        self.ddiag = DistributedForm(a, self.mpart, parts, diag=True) \
            if pc_type == "jacobi" else None
        vp = self.dact.vpart
        self.vpart = vp
        self.cpart = self.dact.cpart
        self.rtol, self.atol, self.maxit = rtol, atol, maxit

        n = V.dim
        bc_idx, g = _bc_data(bcs, n)
        g_glob = np.zeros(n)
        if len(bc_idx):
            g_glob = np.asarray(g)
        # per-shard local bc mask + values (host, setup-static)
        freemask = np.ones((nshards, vp.max_local))
        for s in range(nshards):
            if len(bc_idx):
                loc, ok = vp.g2l(s, np.asarray(bc_idx))
                freemask[s, loc[ok]] = 0.0
            freemask[s] *= vp.local_mask[s]   # padding slots inert
        self.freemask = freemask
        self.g_loc = _localize(g_glob, vp)

        self.ex = vp.exchange_arrays()

        devices = devices if devices is not None \
            else jax.devices()[:nshards]
        self.jmesh = JMesh(np.array(devices), ("shards",))
        # ensemble (2-axis mesh) hooks: subclass sets _ens = n_members
        # and the member-varying coefficient counts
        self._ens = None
        self._var_counts = set()
        self._jitted = None

    # -------------------------------------------------------- program
    def _build(self):
        vp = self.vpart
        nsh = self.nshards
        hops = vp.hops
        maxit, rtol, atol = self.maxit, self.rtol, self.atol
        dact, dres, ddiag, xf = self.dact, self.dres, self.ddiag, self.xf
        nloc, nown = vp.max_local, vp.max_owned
        dmg = self.dmg
        mg_fns = dmg.make() if dmg is not None else None

        dmat = self.dmat

        def body(coords_blk, clocal_blks, cvals, dlocal_blks, g_blk,
                 x0_blk, freemask_blk, ex, st_a, acc_a, st_L, acc_L,
                 st_d, acc_d, st_m, acc_m, ecols_blk, mg_data):
            ex = jax.tree_util.tree_map(lambda a: a[0], ex)
            free = freemask_blk[0]
            own = ex["local_owned_mask"]
            bc = (1.0 - free) * ex["local_mask"]

            coords_local = coords_blk[0]
            clocals = {cnt: blk[0] for cnt, blk in clocal_blks.items()}
            dlocals = {cnt: blk[0] for cnt, blk in dlocal_blks.items()}
            g_loc = g_blk[0]

            if dmat is not None:
                # assemble the shard-local ELL block ONCE; matvecs are
                # then SpMV + the same halo legs as action assembly
                ell = dmat.run_local(coords_local, clocals, cvals,
                                     st_m, acc_m)       # (nloc, K)
                ec = ecols_blk[0].reshape(nloc, dmat.K)

                def raw_apply(xl):
                    y = jnp.sum(ell * xl[ec], axis=1)
                    return halo_reduce(y, ex, hops, nsh)
            else:
                def raw_apply(xl):
                    """A @ x from a ghost-complete local x."""
                    cd = dict(clocals)
                    cd[xf.count] = xl
                    y = dact.run_local(coords_local, cd, cvals, st_a,
                                       acc_a)
                    return halo_reduce(y, ex, hops, nsh)

            def matvec(x):
                """Constrained P A P + (I-P) on owned-valid x."""
                xl = halo_bcast(x * free, ex, hops, nsh)
                y = raw_apply(xl * free)
                return y * free + x * bc

            def pdot(u_, v_):
                return jax.lax.psum(jnp.sum(u_ * v_ * own), "shards")

            # preconditioner setup (once per solve, inside the program)
            if dmg is not None:
                lv_mg = mg_fns[0](mg_data)

                def pc(r_):
                    return mg_fns[1](r_, lv_mg, mg_data)
            elif ddiag is not None:
                d = ddiag.run_local(coords_local, dlocals, cvals,
                                    st_d, acc_d)
                d = halo_reduce(d, ex, hops, nsh)
                dc = d * free + bc
                dinv = jnp.where(jnp.abs(dc) > 0, 1.0 / dc, 1.0) \
                    * own * ex["local_mask"]

                def pc(r_):
                    return r_ * dinv
            else:
                def pc(r_):
                    return r_

            # rhs: P(b - A g) + g  on owned slots
            if dres is not None:
                b = halo_reduce(
                    dres.run_local(coords_local, clocals, cvals,
                                   st_L, acc_L), ex, hops, nsh)
            else:
                b = jnp.zeros(nloc)
            Ag = raw_apply(g_loc)     # g ghost-complete by construction
            b = (b - Ag) * free * own + g_loc * bc * own

            x = x0_blk[0] * free * own + g_loc * bc * own
            # the SAME serial Krylov loops (solvers/krylov.py), made
            # collective by the psum dot — cg/gmres/bicgstab/... all
            # run distributed through one code path
            from ..solvers.krylov import KSP_METHODS
            kw = {}
            if self.ksp_type in ("gmres", "fgmres"):
                kw["restart"] = self.restart
            res = KSP_METHODS[self.ksp_type](
                matvec, b, x0=x, pc=pc, rtol=rtol, atol=atol,
                max_it=maxit, dot=pdot, **kw)
            x, it = res.x, res.iterations
            it_axes = ("ens", "shards") if self._ens else "shards"
            return x[:nown], jax.lax.pmax(it, it_axes)

        S = P("shards")
        # member-varying inputs are stacked member-major over a single
        # leading axis sharded jointly over (ens, shards)
        EN = P(("ens", "shards")) if self._ens else S

        def cspec(counts):
            return {c: (EN if c in self._var_counts else S)
                    for c in counts}

        mg_spec = self.dmg.in_specs() if self.dmg is not None else P()
        in_specs = (S, cspec(self._act_coeffs()),
                    P(), cspec(self._diag_coeffs()),
                    S, EN, S, _specs_like(self.ex),
                    _specs_like(self.dact.statics),
                    _specs_like(self.dact.acc),
                    _specs_like(self.dres.statics if self.dres else []),
                    _specs_like(self.dres.acc if self.dres else
                                {"perm": 0, "seg": 0}),
                    _specs_like(self.ddiag.statics if self.ddiag
                                else []),
                    _specs_like(self.ddiag.acc if self.ddiag else
                                {"perm": 0, "seg": 0}),
                    _specs_like(self.dmat.statics if self.dmat
                                else []),
                    _specs_like(self.dmat.acc if self.dmat else
                                {"perm": 0, "seg": 0}),
                    S,
                    mg_spec)
        smapped = shard_map(body, mesh=self.jmesh,
                            in_specs=in_specs,
                            out_specs=(EN, P()))
        return jax.jit(smapped)

    def _act_coeffs(self):
        out = [c.count for c in self.dact.asm.coefficients
               if c is not self.xf]
        if self.dres is not None:
            out += [c.count for c in self.dres.asm.coefficients
                    if c.count not in out]
        return out

    def _diag_coeffs(self):
        if self.ddiag is None:
            return []
        return [c.count for c in self.ddiag.asm.coefficients]

    # --------------------------------------------------------- public
    def solve(self, u, x0=None):
        if self._jitted is None:
            self._jitted = self._build()
        mesh = self.V.mesh_obj
        vp = self.vpart
        # host-localize per-solve inputs (numpy gathers, O(ndof) once)
        clocals = {}
        for c in self.dact.asm.coefficients:
            if c is not self.xf:
                clocals[c.count] = _localize(
                    c.dat, self.dact.coeff_parts[c.count])
        if self.dres is not None:
            for c in self.dres.asm.coefficients:
                clocals.setdefault(c.count, _localize(
                    c.dat, self.dres.coeff_parts[c.count]))
        dlocals = {}
        if self.ddiag is not None:
            for c in self.ddiag.asm.coefficients:
                dlocals[c.count] = _localize(
                    c.dat, self.ddiag.coeff_parts[c.count])
        cvals = {c.count: jnp.asarray(c.values())
                 for c in self.dact.asm.constants}
        if self.dres is not None:
            for c in self.dres.asm.constants:
                cvals.setdefault(c.count, jnp.asarray(c.values()))
        if self.ddiag is not None:
            for c in self.ddiag.asm.constants:
                cvals.setdefault(c.count, jnp.asarray(c.values()))
        x0_blk = (_localize(x0, vp) if x0 is not None
                  else jnp.zeros((self.nshards, vp.max_local)))
        coords_blk = _localize(mesh.coordinates.dat, self.cpart)
        dres_st = self.dres.statics if self.dres else []
        dres_acc = self.dres.acc if self.dres else \
            {"perm": jnp.zeros((self.nshards, 1), jnp.int32),
             "seg": jnp.zeros((self.nshards, 1), jnp.int32)}
        ddiag_st = self.ddiag.statics if self.ddiag else []
        ddiag_acc = self.ddiag.acc if self.ddiag else \
            {"perm": jnp.zeros((self.nshards, 1), jnp.int32),
             "seg": jnp.zeros((self.nshards, 1), jnp.int32)}
        dmat_st = self.dmat.statics if self.dmat else []
        dmat_acc = self.dmat.acc if self.dmat else \
            {"perm": jnp.zeros((self.nshards, 1), jnp.int32),
             "seg": jnp.zeros((self.nshards, 1), jnp.int32)}
        ecols = self.dmat.ell_cols if self.dmat else \
            jnp.zeros((self.nshards, 1), jnp.int32)
        mg_data = self.dmg.data if self.dmg is not None else 0.0
        args = (coords_blk, clocals, cvals, dlocals, self.g_loc,
                x0_blk, jnp.asarray(self.freemask), self.ex,
                self.dact.statics, self.dact.acc, dres_st, dres_acc,
                ddiag_st, ddiag_acc, dmat_st, dmat_acc, ecols, mg_data)
        xowned, it = self._jitted(*args)
        from ..utils.guards import spmd_strict
        if spmd_strict():
            # SPMD-strict (SURVEY §5.2, pyop2 PYOP2_SPMD_STRICT role):
            # the collective program must be bitwise deterministic
            x2, it2 = self._jitted(*args)
            if not (np.array_equal(np.asarray(xowned), np.asarray(x2))
                    and int(it) == int(it2)):
                raise RuntimeError(
                    "FDTPU_SPMD_STRICT: nondeterministic distributed "
                    "solve (two executions of the same program "
                    "disagree bitwise)")
        # host collect (once per solve)
        xarr = np.asarray(xowned).reshape(self.nshards, vp.max_owned)
        out = np.zeros(self.V.dim)
        m = vp.owned_mask.astype(bool)
        out[vp.owned_global[m]] = xarr[m]
        u.dat = out
        self.iterations = int(it)
        return u


def distributed_solve(a, L, u, bcs=(), nshards=None, rtol=1e-10,
                      maxit=5000, pc_type="jacobi", x0=None,
                      ksp_type="cg", mat_type="action", restart=30):
    """solve(a == L, u, bcs=...) by SPMD preconditioned Krylov over an
    n-device mesh — general SFC partitions, all integral types,
    Dirichlet BCs, Jacobi or distributed-GMG preconditioning; any
    method in solvers/krylov.py KSP_METHODS; action-assembly or
    assembled-ELL operators (mat_type 'action'/'assembled')."""
    V = u.function_space()
    solver = DistributedLinearSolver(a, L, V, bcs=bcs, nshards=nshards,
                                     rtol=rtol, maxit=maxit,
                                     pc_type=pc_type, ksp_type=ksp_type,
                                     mat_type=mat_type, restart=restart)
    solver.solve(u, x0=x0)
    u._dist_iterations = solver.iterations
    return u
