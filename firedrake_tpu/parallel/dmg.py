"""Distributed geometric multigrid: a V-cycle that runs per shard
INSIDE the dsolve shard_map program.

Reference role: PETSc PCMG over a distributed DMPlex hierarchy
(firedrake/mg/ + pyop2 parallel parloops): every level keeps the SAME
domain decomposition so transfers are shard-local, smoothers are
Chebyshev/Jacobi with allreduce dot products, and the coarse problem is
solved redundantly on every rank.

TPU shape:
- the hierarchy is partitioned ONCE at the coarsest level (SFC) and
  ownership propagates to children, so every fine cell lives on its
  parent's shard and transfer tables never cross shards;
- per-level operators are the serial assembler's jitted kernels on
  localized statics (parallel/dassemble.py), applied matrix-free;
- per-level Jacobi/Chebyshev diagonals are assembled IN PROGRAM
  (DistributedForm diag mode) — no host-side global array enters the
  iteration program;
- Chebyshev bounds come from an in-program distributed power iteration
  (psum norms), matching the serial smoother (solvers/composition.py
  cheb_bounds: 12 iterations, margins 0.25/1.05), hoisted out of the
  Krylov loop (computed once per solve);
- the coarse residual is psum-gathered (coarse space is small by
  construction) and hit with a replicated dense inverse.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .partition import MeshPartition
from .dassemble import (DistributedForm, get_space_partition,
                        halo_reduce, halo_bcast)

_SH = P("shards")
_RP = P()


class DistributedGMG:
    """Distributed V(2,2)-cycle data + per-shard prepare/apply.

    Build BEFORE the DistributedLinearSolver and share `mparts[-1]` /
    `parts` with it so the finest-level partition is identical."""

    def __init__(self, a, bcs, V, nshards, parts, smooth_its=2):
        from ..functionspace import FunctionSpace
        from ..bcs import DirichletBC
        from ..mg.vcycle import coarsen_form
        from ..solving import _action_cached
        from ..assemble import assemble

        mesh = V.mesh_obj
        hierarchy = getattr(mesh, "_mg_hierarchy", None)
        if hierarchy is None:
            raise ValueError("pc_type 'mg' needs a MeshHierarchy mesh")
        lvl = mesh._mg_level
        meshes = hierarchy.meshes[:lvl + 1]
        spaces = [FunctionSpace(m, V.element) for m in meshes[:-1]] + [V]
        forms = [a]
        for i in range(len(meshes) - 2, -1, -1):
            forms.insert(0, coarsen_form(
                forms[0], meshes[i + 1], meshes[i],
                lambda Vf, i=i: spaces[i]))

        # ---- hierarchy-consistent partitions: SFC at the coarsest,
        # children inherit their parent's shard
        self.nshards = nshards
        mparts = [MeshPartition(meshes[0], nshards)]
        for m in meshes[1:]:
            c2f = np.asarray(m._c2f_cells)
            shard = np.empty(m.topology.num_cells, dtype=np.int64)
            shard[c2f] = mparts[-1].cell_shard[:, None]
            mparts.append(MeshPartition(m, nshards, cell_shard=shard))
        self.mparts = mparts
        self.parts = parts
        self.smooth_its = smooth_its
        self.nlevels = len(spaces)
        self.spaces = spaces

        data, spec = {}, {}

        def put(path, arr, sharded):
            d, s = data, spec
            for k in path[:-1]:
                d = d.setdefault(k, {})
                s = s.setdefault(k, {})
            d[path[-1]] = arr
            s[path[-1]] = _SH if sharded else _RP

        # ---- per-level forms, diagonals, bc masks, power-start vectors
        self.levels = []
        rng = np.random.default_rng(0)
        for l, (f, V_l, mp) in enumerate(zip(forms, spaces, mparts)):
            key = f"L{l}"
            af = _action_cached(f)
            dact = DistributedForm(af, mp, parts)
            ddiag = DistributedForm(f, mp, parts, diag=True)
            vp = dact.vpart
            lb = [DirichletBC(V_l, 0.0, bc.sub_domain, bc.sub_component)
                  for bc in (bcs or ())]
            bc_idx = (np.unique(np.concatenate(
                [b.dof_indices for b in lb]))
                if lb else np.zeros(0, dtype=np.int64))
            free = np.ones((nshards, vp.max_local))
            for s in range(nshards):
                if len(bc_idx):
                    loc, ok = vp.g2l(s, bc_idx)
                    free[s, loc[ok]] = 0.0
                free[s] *= vp.local_mask[s]
            # setup-static localizations (host, once — the program only
            # ever sees per-shard blocks)
            coords = np.asarray(meshes[l].coordinates.dat)
            cvp = dact.cpart
            put((key, "coords"), jnp.asarray(
                coords[cvp.local_global] * cvp.local_mask), True)
            for c in dact.asm.coefficients:
                if c is af._mf_coeff:
                    continue
                pp = dact.coeff_parts[c.count]
                put((key, "coeffs", c.count), jnp.asarray(
                    np.asarray(c.dat)[pp.local_global] * pp.local_mask),
                    True)
            for c in ddiag.asm.coefficients:
                pp = ddiag.coeff_parts[c.count]
                put((key, "dcoeffs", c.count), jnp.asarray(
                    np.asarray(c.dat)[pp.local_global] * pp.local_mask),
                    True)
            for c in dact.asm.constants:
                put((key, "cvals", c.count), jnp.asarray(c.values()),
                    False)
            for c in ddiag.asm.constants:
                put((key, "dcvals", c.count), jnp.asarray(c.values()),
                    False)
            put((key, "free"), jnp.asarray(free), True)
            x0 = rng.standard_normal(V_l.dim)
            put((key, "pw0"), jnp.asarray(
                x0[vp.local_global] * vp.local_owned_mask), True)
            for k, v in vp.exchange_arrays().items():
                put((key, "ex", k), v, True)
            put((key, "st_a"), dact.statics, True)
            put((key, "acc_a"), dact.acc, True)
            put((key, "st_d"), ddiag.statics, True)
            put((key, "acc_d"), ddiag.acc, True)
            self.levels.append(dict(dact=dact, ddiag=ddiag, vp=vp,
                                    xf=af._mf_coeff))

        # ---- transfers (shard-local by partition construction)
        from ..mg.transfer import LevelTransfer
        self.transfer_meta = []
        for l in range(self.nlevels - 1):
            tkey = f"T{l}"
            Vc, Vf = spaces[l], spaces[l + 1]
            t = LevelTransfer(Vc, Vf)
            mpc = mparts[l]
            vpc = self.levels[l]["vp"]
            vpf = self.levels[l + 1]["vp"]
            nlocf = vpf.max_local
            c2f = np.asarray(Vf.mesh_obj._c2f_cells, dtype=np.int64)
            type_of = getattr(Vf.mesh_obj, "_c2f_type_of", None)
            if type_of is None:
                type_of = np.arange(c2f.shape[0]) % t.ntypes
            cmap = np.asarray(Vc.cell_dof_map, dtype=np.int64)
            fmap = np.asarray(Vf.cell_dof_map, dtype=np.int64)
            fshard = mparts[l + 1].cell_shard
            for tt in range(t.ntypes):
                ncq = [None] * nshards
                for s in range(nshards):
                    cells = mpc.local_cells[s]
                    ncq[s] = cells[type_of[cells] == tt]
                mx = max(max(len(c) for c in ncq), 1)
                cml = np.zeros((nshards, mx, cmap.shape[1]),
                               dtype=np.int32)
                fml = np.full((nshards, mx, c2f.shape[1], fmap.shape[1]),
                              nlocf, dtype=np.int32)
                chown = np.zeros((nshards, mx, c2f.shape[1]))
                for s in range(nshards):
                    cells = ncq[s]
                    n = len(cells)
                    if n == 0:
                        continue
                    cl, ok = vpc.g2l(s, cmap[cells].reshape(-1))
                    assert ok.all(), "coarse dof missing on shard"
                    cml[s, :n] = cl.reshape(n, -1)
                    fg = fmap[c2f[cells]]            # (n, nchild, ndbs)
                    fl, okf = vpf.g2l(s, fg.reshape(-1))
                    fl = np.where(okf, fl, nlocf)
                    fml[s, :n] = fl.reshape(fg.shape)
                    chown[s, :n] = (fshard[c2f[cells]] == s)
                put((tkey, "cmap", tt), jnp.asarray(cml), True)
                put((tkey, "fmap", tt), jnp.asarray(fml), True)
                put((tkey, "chown", tt), jnp.asarray(chown), True)
                put((tkey, "P", tt), t.P[tt], False)
            mult = np.asarray(t.fine_mult)
            put((tkey, "mult"), jnp.asarray(
                mult[vpf.local_global] + (1.0 - vpf.local_mask)), True)
            self.transfer_meta.append(dict(ntypes=t.ntypes, nd=t.nd,
                                           bs=t.bs))

        # ---- replicated coarse dense inverse (coarse assembled with
        # bcs serially at setup; the coarse space is small)
        lb0 = [DirichletBC(spaces[0], 0.0, bc.sub_domain,
                           bc.sub_component) for bc in (bcs or ())]
        A0 = assemble(forms[0], bcs=lb0)
        put(("coarse", "Cinv"),
            jnp.asarray(np.linalg.inv(A0.to_dense())), False)
        self.data, self.spec = data, spec

    # ------------------------------------------------------ device side
    def make(self):
        """Returns (prepare, apply): per-shard closures for use inside
        the dsolve shard_map body.  `prepare(env)` assembles per-level
        diagonals + Chebyshev bounds ONCE per solve; `apply(r, lv, env)`
        runs one V-cycle on the finest-level owned residual."""
        nsh = self.nshards
        its = self.smooth_its
        L = self.nlevels

        def prepare(env):
            lv = [None] * L
            for l in range(L):
                e = env[f"L{l}"]
                ex = jax.tree_util.tree_map(lambda a: a[0], e["ex"])
                coords = e["coords"][0]
                clocals = {c: v[0]
                           for c, v in e.get("coeffs", {}).items()}
                dlocals = {c: v[0]
                           for c, v in e.get("dcoeffs", {}).items()}
                cvals = e.get("cvals", {})
                dcvals = e.get("dcvals", {})
                free = e["free"][0]
                own = ex["local_owned_mask"]
                bc = (1.0 - free) * ex["local_mask"]
                dact = self.levels[l]["dact"]
                ddiag = self.levels[l]["ddiag"]
                xf = self.levels[l]["xf"]
                hops = self.levels[l]["vp"].hops

                def raw(xl, dact=dact, xf=xf, coords=coords,
                        clocals=clocals, cvals=cvals, e=e, ex=ex,
                        hops=hops):
                    cd = dict(clocals)
                    cd[xf.count] = xl
                    y = dact.run_local(coords, cd, cvals,
                                       e["st_a"], e["acc_a"])
                    return halo_reduce(y, ex, hops, nsh)

                def mv(x, raw=raw, free=free, bc=bc, ex=ex, hops=hops):
                    xl = halo_bcast(x * free, ex, hops, nsh)
                    return raw(xl * free) * free + x * bc

                def pdot(u_, v_, own=own):
                    return jax.lax.psum(jnp.sum(u_ * v_ * own), "shards")

                # in-program constrained diagonal
                d = ddiag.run_local(coords, dlocals, dcvals,
                                    e["st_d"], e["acc_d"])
                d = halo_reduce(d, ex, hops, nsh)
                dc = d * free + bc
                dinv = jnp.where(jnp.abs(dc) > 0, 1.0 / dc, 1.0) \
                    * own * ex["local_mask"]
                # chebyshev bounds: distributed power iteration (serial
                # cheb_bounds parity: 12 its, margins 0.25 / 1.05)
                x = e["pw0"][0] * free * own

                def pbody(i, x, mv=mv, dinv=dinv, pdot=pdot):
                    y = dinv * mv(x)
                    return y / jnp.sqrt(pdot(y, y))
                x = jax.lax.fori_loop(0, 12, pbody, x)
                y = dinv * mv(x)
                lam = jnp.sqrt(pdot(y, y))
                lv[l] = dict(mv=mv, pdot=pdot, dinv=dinv, free=free,
                             own=own, ex=ex, hops=hops,
                             emin=0.25 * lam, emax=1.05 * lam)
            return lv

        def apply_(r, lv, env):
            def smooth(l, b, x0):
                """Fixed-iteration Chebyshev + Jacobi (KSPCHEBYSHEV)."""
                d = lv[l]
                theta = (d["emax"] + d["emin"]) / 2
                delta = (d["emax"] - d["emin"]) / 2
                x, p_, alpha = x0, jnp.zeros_like(b), jnp.ones(())
                r_ = (b - d["mv"](x)) * d["own"]
                for it in range(its):
                    z = d["dinv"] * r_
                    beta = (0.0 if it == 0
                            else (delta * alpha / 2) ** 2)
                    alpha = (1.0 / theta if it == 0
                             else 1.0 / (theta - beta / alpha))
                    p_ = z + beta * p_
                    x = x + alpha * p_
                    r_ = (b - d["mv"](x)) * d["own"]
                return x

            def prolong(l, xc):
                """coarse level l -> fine level l+1 (shard-local)."""
                meta = self.transfer_meta[l]
                te = env[f"T{l}"]
                nd, bs = meta["nd"], meta["bs"]
                nlocf = self.levels[l + 1]["vp"].max_local
                cl = halo_bcast(xc, lv[l]["ex"], lv[l]["hops"], nsh)
                clp = jnp.concatenate([cl, jnp.zeros(1)])
                out = jnp.zeros(nlocf + 1)
                for tt in range(meta["ntypes"]):
                    cm = te["cmap"][tt][0]
                    fm = te["fmap"][tt][0]
                    Pt = te["P"][tt]
                    cd = clp[cm].reshape(cm.shape[0], nd, bs)
                    vals = jnp.einsum("kij,njb->nkib", Pt, cd)
                    out = out.at[fm.reshape(-1)].set(vals.reshape(-1))
                return out[:nlocf] * lv[l + 1]["ex"]["local_mask"]

            def restrict_(l, rf):
                """fine level l+1 dual -> coarse level l (owned)."""
                meta = self.transfer_meta[l]
                te = env[f"T{l}"]
                nd, bs = meta["nd"], meta["bs"]
                nlocc = self.levels[l]["vp"].max_local
                fl = halo_bcast(rf, lv[l + 1]["ex"],
                                lv[l + 1]["hops"], nsh)
                fw = fl / te["mult"][0]
                fwp = jnp.concatenate([fw, jnp.zeros(1)])
                out = jnp.zeros(nlocc)
                for tt in range(meta["ntypes"]):
                    cm = te["cmap"][tt][0]
                    fm = te["fmap"][tt][0]
                    co = te["chown"][tt][0]
                    Pt = te["P"][tt]
                    n = fm.shape[0]
                    fd = fwp[fm].reshape(n, fm.shape[1], nd, bs)
                    fd = fd * co[:, :, None, None]
                    vals = jnp.einsum("kij,nkib->njb", Pt, fd)
                    out = out.at[cm.reshape(-1)].add(vals.reshape(-1))
                return halo_reduce(out, lv[l]["ex"], lv[l]["hops"], nsh)

            def coarse_solve(b):
                ex0 = lv[0]["ex"]
                n0 = self.spaces[0].dim
                og = ex0["owned_global"]
                rfull = jnp.zeros(n0).at[og].add(
                    b[:og.shape[0]] * ex0["owned_mask"])
                rfull = jax.lax.psum(rfull, "shards")
                xfull = env["coarse"]["Cinv"] @ rfull
                return xfull[ex0["local_global"]] \
                    * ex0["local_owned_mask"]

            def cycle(l, b):
                if l == 0:
                    return coarse_solve(b)
                x = smooth(l, b, jnp.zeros_like(b))
                r_ = (b - lv[l]["mv"](x)) * lv[l]["free"] * lv[l]["own"]
                rc = restrict_(l - 1, r_) * lv[l - 1]["free"]
                xc = cycle(l - 1, rc)
                x = x + prolong(l - 1, xc) * lv[l]["free"] \
                    * lv[l]["own"]
                x = smooth(l, b, x)
                return x

            return cycle(L - 1, r)

        return prepare, apply_

    def in_specs(self):
        return self.spec
