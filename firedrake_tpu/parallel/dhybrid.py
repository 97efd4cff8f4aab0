"""Distributed hybridization: per-shard static condensation + an SPMD
trace solve in ONE shard_map program.

Reference role: firedrake/slate/static_condensation/hybridization.py:18
running under MPI — every rank condenses its own cells (the Schur
eliminations are cell-local) and the trace system is a PETSc KSP over
the communicator (pyop2/parloop.py:245-260 for the halo legs).

TPU shape (mirrors parallel/dsolve.py):
- the batched per-cell local tensors A_c (nd x nd), K_c (nt x nd),
  F_c (nd) are evaluated once by the serial Slate machinery (pure
  data-parallel vmapped kernels) and SHARDED over owned cells;
- inside the program each shard condenses ITS cells:
      S_c = K_c A_c^{-1} K_c^T,   E_c = K_c A_c^{-1} F_c
  (batched Gauss-Jordan/LU — the flop-heavy elimination is SPMD);
- the trace operator application is owner-computes scatter of
  S_c @ x_c over the shard's cells + the same halo-reduce/bcast
  ppermute legs as dsolve (trace dofs partitioned by
  SpacePartition(T, mesh partition));
- CG with psum dots and Jacobi on the trace diagonal solves S lam = E
  entirely inside the program;
- back-substitution x_c = A_c^{-1} (F_c - K_c^T lam_c) happens
  per shard before the single host collect.

Dirichlet trace rows (exterior boundary multipliers) are identity
rows with zero data, matching the serial path's DirichletBC(T, 0).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh as JMesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .partition import MeshPartition, SpacePartition
from .dassemble import halo_reduce, halo_bcast


def _specs_like(tree):
    return jax.tree_util.tree_map(lambda _: P("shards"), tree)


class DistributedHybridization:
    """Hybridized H(div) x DG solve over an n-device 'shards' mesh."""

    def __init__(self, problem, nshards=None, rtol=1e-10, maxit=5000):
        from ..solvers.hybridization import (_broken_problem,
                                             _trace_coupling)
        from ..slate import Tensor, _eval_local
        from ..bcs import DirichletBC
        from ..mixed import MixedFunctionSpace

        p = problem
        W = p.u.function_space()
        if not isinstance(W, MixedFunctionSpace) or \
                W.num_sub_spaces != 2:
            raise NotImplementedError(
                "HybridizationPC expects a 2-field H(div) x DG problem")
        if p.bcs:
            raise NotImplementedError(
                "distributed HybridizationPC with strong flux bcs")
        nshards = nshards or len(jax.devices())
        self.nshards = nshards
        self.rtol, self.maxit = rtol, maxit
        self.problem = p
        mesh = W.mesh_obj
        a_b, L_b, Wd, T = _broken_problem(p.a, p.L, W)
        k_form = _trace_coupling(Wd, T, mesh)
        self.W, self.Wd, self.T = W, Wd, T

        # batched per-cell local tensors (data-parallel vmapped
        # kernels; sharded below by owned cells)
        cache = {}
        self.A_loc = _eval_local(Tensor(a_b, axes=(Wd, Wd)), cache).cell
        self.K_loc = _eval_local(Tensor(k_form, axes=(T, Wd)),
                                 cache).cell
        self.F_loc = _eval_local(Tensor(L_b, axes=(Wd,)), cache).cell

        # partitions: cells by SFC; trace dofs over the cell partition
        self.mpart = MeshPartition(mesh, nshards)
        tp = SpacePartition(T, self.mpart)
        self.tpart = tp
        self.ex = tp.exchange_arrays()

        MC = self.mpart.max_owned_cells
        tmapg = np.asarray(T.cell_dof_map, dtype=np.int64)
        oc_pad = np.zeros((nshards, MC), dtype=np.int64)
        cmask = np.zeros((nshards, MC))
        tmap_l = np.zeros((nshards, MC, tmapg.shape[1]), dtype=np.int32)
        for s in range(nshards):
            oc = self.mpart.owned_cells[s]
            oc_pad[s, :len(oc)] = oc
            oc_pad[s, len(oc):] = oc[0]          # pad: invertible A_c
            cmask[s, :len(oc)] = 1.0
            loc, ok = tp.g2l(s, tmapg[oc_pad[s]].reshape(-1))
            assert ok.all(), "owned cell touches non-local trace dof"
            tmap_l[s] = loc.reshape(MC, tmapg.shape[1])
        self.oc_pad, self.cmask = oc_pad, cmask
        self.tmap_l = jnp.asarray(tmap_l)

        bc = DirichletBC(T, 0.0, "on_boundary")
        freemask = np.ones((nshards, tp.max_local))
        for s in range(nshards):
            if len(bc.nodes):
                loc, ok = tp.g2l(s, np.asarray(bc.nodes))
                freemask[s, loc[ok]] = 0.0
            freemask[s] *= tp.local_mask[s]
        self.freemask = jnp.asarray(freemask)

        devices = jax.devices()[:nshards]
        self.jmesh = JMesh(np.array(devices), ("shards",))
        self._jitted = None

    # ----------------------------------------------------------- program
    def _build(self):
        tp = self.tpart
        nsh, hops = self.nshards, tp.hops
        nloc, nown = tp.max_local, tp.max_owned
        rtol, maxit = self.rtol, self.maxit
        from ..ops.batched_inverse import batched_inv, batched_solve
        from ..solvers.krylov import cg

        def body(A_blk, K_blk, F_blk, tmap_blk, cmask_blk, free_blk,
                 ex):
            ex = jax.tree_util.tree_map(lambda a: a[0], ex)
            A, K, F = A_blk[0], K_blk[0], F_blk[0]
            tm, cm, free = tmap_blk[0], cmask_blk[0], free_blk[0]
            own = ex["local_owned_mask"]
            bc = (1.0 - free) * ex["local_mask"]

            # per-shard condensation (padded cells masked out)
            Ainv = batched_inv(A)
            KAinv = jnp.einsum("cin,cnm->cim", K, Ainv)
            S_c = jnp.einsum("cim,cjm->cij", KAinv, K) \
                * cm[:, None, None]
            E_c = jnp.einsum("cim,cm->ci", KAinv, F) * cm[:, None]

            flat = tm.reshape(-1)

            def raw(xl):
                yc = jnp.einsum("cij,cj->ci", S_c, xl[tm])
                y = jnp.zeros(nloc).at[flat].add(yc.reshape(-1))
                return halo_reduce(y, ex, hops, nsh)

            def matvec(x):
                xl = halo_bcast(x * free, ex, hops, nsh)
                return raw(xl * free) * free + x * bc

            def pdot(u_, v_):
                return jax.lax.psum(jnp.sum(u_ * v_ * own), "shards")

            dpart = jnp.zeros(nloc).at[flat].add(
                jnp.einsum("cii->ci", S_c).reshape(-1))
            d = halo_reduce(dpart, ex, hops, nsh) * free + bc
            dinv = jnp.where(jnp.abs(d) > 0, 1.0 / d, 1.0) \
                * own * ex["local_mask"]

            b = halo_reduce(
                jnp.zeros(nloc).at[flat].add(E_c.reshape(-1)),
                ex, hops, nsh) * free * own

            res = cg(matvec, b, pc=lambda r: r * dinv, rtol=rtol,
                     max_it=maxit, dot=pdot)

            # back-substitution on this shard's cells
            lam_l = halo_bcast(res.x * free, ex, hops, nsh)
            rhs_c = F - jnp.einsum("cin,ci->cn", K, lam_l[tm])
            xs = batched_solve(A, rhs_c) * cm[:, None]
            return (res.x[:nown], xs,
                    jax.lax.pmax(res.iterations, "shards"))

        S = P("shards")
        smapped = shard_map(
            body, mesh=self.jmesh,
            in_specs=(S, S, S, S, S, S, _specs_like(self.ex)),
            out_specs=(S, S, P()))
        return jax.jit(smapped)

    # ------------------------------------------------------------ public
    def solve(self):
        from ..solvers.hybridization import _broken_to_conforming
        if self._jitted is None:
            self._jitted = self._build()
        oc = jnp.asarray(self.oc_pad)
        lam_own, xs, it = self._jitted(
            self.A_loc[oc], self.K_loc[oc], self.F_loc[oc],
            self.tmap_l, jnp.asarray(self.cmask), self.freemask,
            self.ex)
        # host collect: broken dofs are cell-local -> owned scatter
        Sb, U = self.Wd.subspaces
        nds = Sb.element.ndof
        MC = self.mpart.max_owned_cells
        xs = np.asarray(xs).reshape(self.nshards, MC, -1)
        sigma_b = np.zeros(Sb.dim)
        u_dat = np.zeros(U.dim)
        sb_map = np.asarray(Sb.cell_dof_map)
        u_map = np.asarray(U.cell_dof_map)
        for s in range(self.nshards):
            occ = self.mpart.owned_cells[s]
            k = len(occ)
            sigma_b[sb_map[occ]] = xs[s, :k, :nds]
            u_dat[u_map[occ]] = xs[s, :k, nds:]
        p = self.problem
        Sigma = self.W.subspaces[0]
        p.u.subfunctions[0].dat = _broken_to_conforming(
            Sigma, Sb, sigma_b)
        p.u.subfunctions[1].dat = u_dat
        self.iterations = int(it)
        return self.iterations
