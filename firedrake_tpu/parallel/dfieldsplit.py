"""Distributed fieldsplit: mixed-space SPMD solves over the device mesh.

Reference role: PETSc PCFIELDSPLIT running transparently over an MPI
communicator (firedrake solver_parameters {"pc_type": "fieldsplit"}
under mpiexec; pyop2/types/mat.py:27 MatBlock, firedrake/
preconditioners/massinv.py for the Schur mass approximation).  The
round-3 verdict's distributed-breadth directive: one composed PC
through the distributed path.

TPU shape:
- every block (i,j) of the mixed bilinear form is extracted
  symbolically (mixed.extract_block — exact by multilinearity) and
  re-rooted on the plain subspaces, then compiled into a
  DistributedForm ACTION over ONE shared MeshPartition, so all fields
  inherit halo structure from the same cell partition;
- the outer Krylov (fgmres by default — the PC contains inner Krylov
  loops, so it is not a fixed linear operator) runs on ONE
  concatenated per-shard local vector [field0 | field1 | ...]; dot
  products are a single psum over the concatenated owned mask;
- the fieldsplit PC composes INSIDE the same shard_map program:
  * additive: per-field inner CG (Jacobi-preconditioned, in-program
    assembled diagonals) on the (i,i) blocks;
  * schur (2 fields, full/diag factorization): inner CG on A00, the
    Schur complement approximated by a user/auto-supplied mass form
    on field 1 (MassInvPC role), scaled by `schur_scale` (-1: Stokes'
    negative-definite Schur complement);
- Dirichlet BCs (field-rooted) eliminate as P A P + (I-P) exactly as
  the serial path (solving.py _constrained_op).

The same program runs at any shard count — nshards=1 reproduces the
serial algorithm, so partition-independence is directly testable.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh as JMesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .partition import MeshPartition
from .dassemble import (DistributedForm, get_space_partition,
                        halo_reduce, halo_bcast)
from .dsolve import _localize, _specs_like


def _reroot(form, W):
    """Re-root the part-carrying Arguments of an extracted block on the
    plain subspaces (the single-space assembler's contract)."""
    from ..language.core import Argument
    from ..language.calculus import map_expr
    from ..language.measure import Form
    mapping = {}
    for it in form.integrals():
        for t in it.integrand.traverse():
            if isinstance(t, Argument) and t.part is not None:
                V = W.subspaces[t.part]
                mapping[t] = Argument(V, t.number, part=None)
    out = [it.reconstruct(map_expr(it.integrand, mapping))
           for it in form.integrals()]
    return Form(tuple(out))


def _field_bcs(bcs, W, i):
    """Dirichlet BCs of mixed field i re-rooted on the plain subspace."""
    from ..bcs import DirichletBC
    out = []
    for b in bcs:
        fs = getattr(b, "function_space_obj", None)
        if getattr(fs, "index", None) == i and \
                getattr(fs, "parent", None) is W:
            out.append(DirichletBC(fs._V, b.g, b.sub_domain,
                                   b.sub_component))
    return tuple(out)


class DistributedFieldSplitSolver:
    """Mixed a == L over an n-device 'shards' mesh with a fieldsplit
    preconditioner composed inside the SPMD program."""

    def __init__(self, a, L, W, bcs=(), nshards=None, devices=None,
                 rtol=1e-9, atol=1e-50, maxit=500, restart=50,
                 ksp_type="fgmres", fs_type="schur", schur_form=None,
                 schur_scale=-1.0, sub_rtol=1e-8, sub_maxit=200):
        from ..mixed import extract_block, is_mixed
        from ..solving import _action_cached, _bc_data

        assert is_mixed(W), "distributed fieldsplit needs a mixed space"
        nshards = nshards or len(jax.devices())
        self.nshards = nshards
        self.W = W
        nf = W.num_sub_spaces
        self.nf = nf
        self.fs_type = fs_type
        if fs_type == "schur" and nf != 2:
            raise ValueError("schur fieldsplit needs exactly 2 fields")
        self.ksp_type = ksp_type
        self.restart = restart
        self.rtol, self.atol, self.maxit = rtol, atol, maxit
        self.sub_rtol, self.sub_maxit = sub_rtol, sub_maxit
        self.schur_scale = schur_scale

        mesh = W.mesh_obj
        self.mpart = MeshPartition(mesh, nshards)
        parts = {}
        self._parts = parts

        # block actions a_ij @ x_j (None where the block is empty)
        self.dact = {}
        self.xf = {}
        for i in range(nf):
            for j in range(nf):
                blk = extract_block(a, i, j)
                if not blk.integrals():
                    continue
                bf = _reroot(blk, W)
                af = _action_cached(bf)
                self.dact[(i, j)] = DistributedForm(af, self.mpart,
                                                    parts)
                self.xf[(i, j)] = af._mf_coeff
        # rhs blocks
        self.dres = {}
        if L is not None:
            for i in range(nf):
                blk = extract_block(L, i, None)
                if blk.integrals():
                    self.dres[i] = DistributedForm(_reroot(blk, W),
                                                   self.mpart, parts)
        # PC diagonals: field (i,i) Jacobi; Schur mass approximation
        self.ddiag = {}
        for i in range(nf):
            blk = extract_block(a, i, i)
            if blk.integrals():
                self.ddiag[i] = DistributedForm(_reroot(blk, W),
                                                self.mpart, parts,
                                                diag=True)
        self.dschur = None
        self.dschur_diag = None
        if fs_type == "schur":
            if schur_form is None:
                # MassInvPC default: the field-1 mass matrix
                from ..language import TestFunction, TrialFunction
                from ..language.measure import dx
                from ..language.tensor_algebra import inner
                Q = W.subspaces[1]
                schur_form = inner(TrialFunction(Q),
                                   TestFunction(Q)) * dx
            saf = _action_cached(schur_form)
            self.dschur = DistributedForm(saf, self.mpart, parts)
            self.sxf = saf._mf_coeff
            self.dschur_diag = DistributedForm(schur_form, self.mpart,
                                               parts, diag=True)

        self.vparts = [get_space_partition(parts, V, self.mpart)
                       for V in W.subspaces]
        self.cpart = get_space_partition(
            parts, mesh.coordinates.function_space(), self.mpart)
        self.exs = [vp.exchange_arrays() for vp in self.vparts]

        # per-field bc masks + values (host, setup-static)
        self.freemasks, self.g_locs = [], []
        for i, (V, vp) in enumerate(zip(W.subspaces, self.vparts)):
            bcs_i = _field_bcs(bcs, W, i)
            bc_idx, g = _bc_data(bcs_i, V.dim)
            g_glob = np.asarray(g) if len(bc_idx) else np.zeros(V.dim)
            fm = np.ones((nshards, vp.max_local))
            for s in range(nshards):
                if len(bc_idx):
                    loc, ok = vp.g2l(s, np.asarray(bc_idx))
                    fm[s, loc[ok]] = 0.0
                fm[s] *= vp.local_mask[s]
            self.freemasks.append(jnp.asarray(fm))
            self.g_locs.append(_localize(g_glob, vp))

        devices = devices if devices is not None \
            else jax.devices()[:nshards]
        self.jmesh = JMesh(np.array(devices), ("shards",))
        self._jitted = None

    # ------------------------------------------------------- program
    def _coeff_counts(self):
        """All non-matvec coefficients across every compiled dform."""
        skip = {w.count for w in self.xf.values()}
        if self.dschur is not None:
            skip.add(self.sxf.count)
        seen = {}
        for df in self._all_dforms():
            for c in df.asm.coefficients:
                if c.count not in skip:
                    seen[c.count] = c
        return seen

    def _all_dforms(self):
        out = list(self.dact.values()) + list(self.dres.values()) \
            + list(self.ddiag.values())
        if self.dschur is not None:
            out += [self.dschur, self.dschur_diag]
        return out

    def _build(self):
        nsh = self.nshards
        nf = self.nf
        vps = self.vparts
        sizes = [vp.max_local for vp in vps]
        starts = np.concatenate([[0], np.cumsum(sizes)])[:-1]
        hops = [vp.hops for vp in vps]
        dact, dres, ddiag = self.dact, self.dres, self.ddiag
        dschur, dschur_diag = self.dschur, self.dschur_diag
        xf, nfld = self.xf, self.nf
        fs_type = self.fs_type
        sub_rtol, sub_maxit = self.sub_rtol, self.sub_maxit
        schur_scale = self.schur_scale
        from ..solvers.krylov import KSP_METHODS

        def split(x):
            return [jax.lax.dynamic_slice(x, (int(starts[i]),),
                                          (sizes[i],))
                    for i in range(nf)]

        def body(coords_blk, clocal_blks, cvals, g_blks, free_blks,
                 ex_blks, st_acc):
            exs = [jax.tree_util.tree_map(lambda a: a[0], e)
                   for e in ex_blks]
            frees = [f[0] for f in free_blks]
            bcs_m = [(1.0 - frees[i]) * exs[i]["local_mask"]
                     for i in range(nf)]
            owns = [exs[i]["local_owned_mask"] for i in range(nf)]
            g_locs = [g[0] for g in g_blks]
            coords_local = coords_blk[0]
            clocals = {cnt: blk[0] for cnt, blk in clocal_blks.items()}

            def run(df, key, extra=None):
                st, acc = st_acc[key]
                cd = dict(clocals)
                if extra is not None:
                    cd[extra[0]] = extra[1]
                return df.run_local(coords_local, cd, cvals, st, acc)

            def act(i, j, xl):
                """Pre-reduce A_ij @ (ghost-complete xl)."""
                return run(dact[(i, j)], ("act", i, j),
                           (xf[(i, j)].count, xl))

            def bcast(i, x):
                return halo_bcast(x, exs[i], hops[i], nsh)

            def reduce_(i, y):
                return halo_reduce(y, exs[i], hops[i], nsh)

            def raw_block(i, xls):
                """Field-i result from ghost-complete field vectors."""
                y = None
                for j in range(nf):
                    if (i, j) not in dact:
                        continue
                    t = act(i, j, xls[j])
                    y = t if y is None else y + t
                return reduce_(i, y) if y is not None \
                    else jnp.zeros(sizes[i])

            def matvec(x):
                xs = split(x)
                xls = [bcast(i, xs[i] * frees[i]) * frees[i]
                       for i in range(nf)]
                ys = [raw_block(i, xls) * frees[i]
                      + xs[i] * bcs_m[i] for i in range(nf)]
                return jnp.concatenate(ys)

            own_cat = jnp.concatenate(owns)

            def pdot(u_, v_):
                return jax.lax.psum(jnp.sum(u_ * v_ * own_cat),
                                    "shards")

            def fdot(i):
                def d(u_, v_):
                    return jax.lax.psum(jnp.sum(u_ * v_ * owns[i]),
                                        "shards")
                return d

            # in-program Jacobi diagonals of the (i,i) blocks
            dinvs = {}
            for i in range(nf):
                if i not in ddiag:
                    continue
                d = reduce_(i, run(ddiag[i], ("diag", i)))
                dc = d * frees[i] + bcs_m[i]
                dinvs[i] = jnp.where(jnp.abs(dc) > 0, 1.0 / dc, 1.0) \
                    * owns[i] * exs[i]["local_mask"]

            def block_cg(i, mv, r, dinv):
                pc = (lambda z: z * dinv) if dinv is not None else None
                res = KSP_METHODS["cg"](mv, r, pc=pc, rtol=sub_rtol,
                                        atol=0.0, max_it=sub_maxit,
                                        dot=fdot(i))
                return res.x

            def diag_solve(i, r):
                """Inner CG on constrained block (i,i)."""
                def mv(x):
                    xl = bcast(i, x * frees[i]) * frees[i]
                    y = reduce_(i, act(i, i, xl))
                    return y * frees[i] + x * bcs_m[i]
                return block_cg(i, mv, r, dinvs.get(i))

            if fs_type == "schur":
                sd = reduce_(1, run(dschur_diag, ("sdiag", 0)))
                sdinv = jnp.where(jnp.abs(sd) > 0, 1.0 / sd, 1.0) \
                    * owns[1] * exs[1]["local_mask"]

                def schur_mv(x):
                    """The SPD mass approximation Mp @ x; the (signed)
                    Schur scale divides the solution instead, so the
                    inner CG always sees an SPD operator."""
                    xl = bcast(1, x)
                    return reduce_(1, run(dschur, ("schur", 0),
                                          (self.sxf.count, xl)))

                def off_apply(i, j, x):
                    """Constrained A_ij x (i != j)."""
                    xl = bcast(j, x * frees[j]) * frees[j]
                    return reduce_(i, act(i, j, xl)) * frees[i]

                def pc(r):
                    """Full Schur factorization: solve A00, correct the
                    field-1 residual, solve ~S = schur_scale * Mp,
                    back-substitute (PETSc schur_fact_type full)."""
                    ru, rp = split(r)
                    zu0 = diag_solve(0, ru)
                    rs = rp - off_apply(1, 0, zu0)
                    zp = block_cg(1, schur_mv, rs, sdinv) / schur_scale
                    zu = zu0 - diag_solve(0, off_apply(0, 1, zp))
                    return jnp.concatenate([zu, zp])
            else:
                def pc(r):
                    rs = split(r)
                    zs = [diag_solve(i, rs[i]) if (i, i) in dact
                          else rs[i] for i in range(nf)]
                    return jnp.concatenate(zs)

            # rhs: P(b - A g) + g
            bs = []
            for i in range(nf):
                if i in dres:
                    b = reduce_(i, run(dres[i], ("res", i)))
                else:
                    b = jnp.zeros(sizes[i])
                bs.append(b)
            g_ls = [g_locs[i] for i in range(nf)]
            Ag = [raw_block(i, g_ls) for i in range(nf)]
            bs = [(bs[i] - Ag[i]) * frees[i] * owns[i]
                  + g_locs[i] * bcs_m[i] * owns[i] for i in range(nf)]
            b_cat = jnp.concatenate(bs)
            x0 = jnp.concatenate(
                [g_locs[i] * bcs_m[i] * owns[i] for i in range(nf)])

            kw = {}
            if self.ksp_type in ("gmres", "fgmres"):
                kw["restart"] = self.restart
            res = KSP_METHODS[self.ksp_type](
                matvec, b_cat, x0=x0, pc=pc, rtol=self.rtol,
                atol=self.atol, max_it=self.maxit, dot=pdot, **kw)
            xs = split(res.x)
            outs = [xs[i][:vps[i].max_owned] for i in range(nf)]
            return tuple(outs) + (jax.lax.pmax(res.iterations,
                                               "shards"),)

        S = P("shards")
        st_acc_spec = {k: (_specs_like(v[0]), _specs_like(v[1]))
                       for k, v in self._st_acc().items()}
        in_specs = (S, {c: S for c in self._coeff_counts()}, P(),
                    [S] * nf, [S] * nf,
                    [_specs_like(e) for e in self.exs], st_acc_spec)
        out_specs = tuple([S] * nf) + (P(),)
        smapped = shard_map(body, mesh=self.jmesh, in_specs=in_specs,
                            out_specs=out_specs)
        return jax.jit(smapped)

    def _st_acc(self):
        out = {}
        for (i, j), df in self.dact.items():
            out[("act", i, j)] = (df.statics, df.acc)
        for i, df in self.dres.items():
            out[("res", i)] = (df.statics, df.acc)
        for i, df in self.ddiag.items():
            out[("diag", i)] = (df.statics, df.acc)
        if self.dschur is not None:
            out[("schur", 0)] = (self.dschur.statics, self.dschur.acc)
            out[("sdiag", 0)] = (self.dschur_diag.statics,
                                 self.dschur_diag.acc)
        return out

    # -------------------------------------------------------- public
    def solve(self, u):
        if self._jitted is None:
            self._jitted = self._build()
        W = self.W
        mesh = W.mesh_obj
        coeffs = self._coeff_counts()
        clocals = {}
        for cnt, c in coeffs.items():
            for df in self._all_dforms():
                if cnt in df.coeff_parts:
                    clocals[cnt] = _localize(c.dat,
                                             df.coeff_parts[cnt])
                    break
        cvals = {}
        for df in self._all_dforms():
            for c in df.asm.constants:
                cvals.setdefault(c.count, jnp.asarray(c.values()))
        coords_blk = _localize(mesh.coordinates.dat, self.cpart)
        args = (coords_blk, clocals, cvals, list(self.g_locs),
                list(self.freemasks), list(self.exs), self._st_acc())
        *xs, it = self._jitted(*args)
        out = np.zeros(W.dim)
        for i, vp in enumerate(self.vparts):
            xarr = np.asarray(xs[i]).reshape(self.nshards,
                                             vp.max_owned)
            m = vp.owned_mask.astype(bool)
            fld = np.zeros(W.subspaces[i].dim)
            fld[vp.owned_global[m]] = xarr[m]
            out[W.offsets[i]:W.offsets[i] + W.subspaces[i].dim] = fld
        u.dat = out
        self.iterations = int(it)
        return u


def distributed_fieldsplit_solve(a, L, u, bcs=(), nshards=None,
                                 **kw):
    """solve(a == L, u) on a mixed space by SPMD outer Krylov with a
    fieldsplit PC composed inside the shard_map program."""
    W = u.function_space()
    solver = DistributedFieldSplitSolver(a, L, W, bcs=bcs,
                                         nshards=nshards, **kw)
    solver.solve(u)
    u._dist_iterations = solver.iterations
    return u
