"""End-to-end distributed Krylov: SPMD conjugate gradients over the
owner-computes halo layer.

Reference: the PETSc KSP path firedrake delegates to — VecDot as
MPI_Allreduce over owned dofs, MatMult as halo-exchanged local products
(petsc vecscatter; firedrake/halo.py SF legs).

TPU mapping: ONE jitted shard_map program contains the whole CG loop
(lax.while_loop).  Per-shard state is a padded LOCAL dof vector
[owned | ghost]; each iteration:
  1. ghost REFRESH of the search direction (owner -> ghost ppermute,
     the SF-bcast leg),
  2. owner-computes matrix-free operator application over the shard's
     cells (the action form's vmapped quadrature kernel),
  3. ghost REDUCE of the partial products (ghost -> owner ppermute,
     the SF-reduce leg),
  4. alpha/beta from psum'd owned-dof dot products.
No host round-trips; collectives are XLA ppermute/psum on the 'shards'
mesh axis (ICI-resident on real hardware).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh as JMesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .halo import StripPartition


def make_distributed_cg(a, nshards, devices=None, rtol=1e-8,
                        maxit=1000):
    """Build fn(b_global, x0_global) -> (x_global, iterations) running
    CG on `a`'s matrix-free action, SPMD over nshards devices."""
    from ..solving import _action_cached
    from ..assemble import FormAssembler

    af = _action_cached(a)
    asm = FormAssembler(af)
    xf = af._mf_coeff
    V = asm.test.space
    mesh = V.mesh_obj
    gdim = mesh.geometric_dimension
    part = StripPartition(V, nshards)
    coords_V = mesh.coordinates.function_space()
    cpart = StripPartition(coords_V, nshards)
    for ci in asm._compiled:
        if ci.integral_type != "cell":
            raise NotImplementedError("distributed facet integrals: "
                                      "halo-overlap milestone")
    other_coeffs = [c for c in asm.coefficients if c is not xf]
    oparts = [StripPartition(c.space, nshards) for c in other_coeffs]

    devices = devices if devices is not None \
        else jax.devices()[:nshards]
    jmesh = JMesh(np.array(devices), ("shards",))

    nloc = part.max_local
    ndof = V.dim
    hops = part.hops

    st = dict(
        lcmap=jnp.asarray(part.local_cmap),
        valid=jnp.asarray(part.cell_valid),
        c_lcmap=jnp.asarray(cpart.local_cmap),
        c_local_global=jnp.asarray(cpart.local_global),
        send_idx=jnp.asarray(part.send_idx),
        send_mask=jnp.asarray(part.send_mask),
        recv_idx=jnp.asarray(part.recv_idx),
        recv_mask=jnp.asarray(part.recv_mask),
        local_global=jnp.asarray(part.local_global),
        local_mask=jnp.asarray(part.local_mask),
        owned_global=jnp.asarray(part.owned_global),
        owned_mask=jnp.asarray(part.owned_mask),
        local_owned_mask=jnp.asarray(part.local_owned_mask),
    )
    ost = [dict(local_global=jnp.asarray(p.local_global),
                lcmap=jnp.asarray(p.local_cmap)) for p in oparts]

    nshards_ = nshards

    def shard_cg(coords_dat, b_glob, x0_glob, stb, ostb, odats):
        s = {k: v[0] for k, v in stb.items()}
        c_local = coords_dat[s["c_local_global"]]
        ce = c_local[s["c_lcmap"]].reshape(part.max_cells, -1, gdim)
        ows = []
        for cst, cdat in zip(ostb, odats):
            cs = {k: v[0] for k, v in cst.items()}
            ows.append(cdat[cs["local_global"]][cs["lcmap"]])

        own = s["local_owned_mask"]

        def refresh(v):
            """Owner -> ghost bcast: ghosts get their owner's value."""
            for dn, d in enumerate(hops):
                buf = v[s["recv_idx"][dn]] * s["recv_mask"][dn]
                perm = [(sh, sh - d) for sh in range(nshards_)
                        if 0 <= sh - d < nshards_]
                recv = jax.lax.ppermute(buf, "shards", perm)
                v = v.at[s["send_idx"][dn]].set(
                    jnp.where(s["send_mask"][dn] > 0, recv,
                              v[s["send_idx"][dn]]))
            return v

        def reduce_(v):
            """Ghost -> owner reduce, then zero the ghost slots."""
            for dn, d in enumerate(hops):
                buf = v[s["send_idx"][dn]] * s["send_mask"][dn]
                perm = [(sh, sh + d) for sh in range(nshards_)
                        if 0 <= sh + d < nshards_]
                recv = jax.lax.ppermute(buf, "shards", perm)
                v = v.at[s["recv_idx"][dn]].add(recv * s["recv_mask"][dn])
            return v * own

        def matvec(p_own):
            """A @ p over this shard's cells (p owned-valid)."""
            pl = refresh(p_own)
            w = pl[s["lcmap"]]
            acc = jnp.zeros(nloc)
            for ci in asm._compiled:
                kern = ci.kernel()
                # coefficient slots: xf replaced by the local vector
                ws = []
                k = 0
                for c in asm.coefficients:
                    if c is xf:
                        ws.append(w)
                    else:
                        ws.append(ows[k])
                        k += 1
                loc = jax.vmap(lambda x, *wv: kern(x, wv, ()))(ce, *ws)
                vals = loc[:, :, 0] * s["valid"][:, None]
                acc = acc.at[s["lcmap"].reshape(-1)].add(
                    vals.reshape(-1))
            return reduce_(acc)

        def pdot(u, v):
            return jax.lax.psum(jnp.sum(u * v * own), "shards")

        b = b_glob[s["local_global"]] * own
        x = x0_glob[s["local_global"]] * own
        r = (b - matvec(x)) * own
        p = r
        rz = pdot(r, r)
        r0 = jnp.sqrt(rz)

        def cond(state):
            x, r, p, rz, it = state
            return (jnp.sqrt(rz) > rtol * jnp.maximum(r0, 1e-300)) \
                & (it < maxit)

        def body(state):
            x, r, p, rz, it = state
            Ap = matvec(p)
            alpha = rz / pdot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            rz_new = pdot(r, r)
            p = r + (rz_new / rz) * p
            return x, r, p, rz_new, it + 1

        x, r, p, rz, it = jax.lax.while_loop(
            cond, body, (x, r, p, rz, jnp.zeros((), jnp.int32)))
        own_vals = x[:part.max_owned] * s["owned_mask"]
        out = jnp.zeros(ndof).at[s["owned_global"]].add(own_vals)
        return jax.lax.psum(out, "shards"), jax.lax.pmax(it, "shards")

    spec = {k: P("shards") for k in st}
    ospecs = [{k: P("shards") for k in c} for c in ost]
    smapped = shard_map(
        shard_cg, mesh=jmesh,
        in_specs=(P(), P(), P(), spec, ospecs, [P()] * len(ost)),
        out_specs=(P(), P()))
    jitted = jax.jit(smapped)

    def fn(b_global, x0_global=None):
        if x0_global is None:
            x0_global = jnp.zeros(ndof)
        odats = [jnp.asarray(c.dat) for c in other_coeffs]
        x, it = jitted(jnp.asarray(mesh.coordinates.dat),
                       jnp.asarray(b_global), jnp.asarray(x0_global),
                       st, ost, odats)
        return x, int(it)

    return fn


def distributed_solve(a, L, u, nshards=None, rtol=1e-10, maxit=2000):
    """solve(a == L) by SPMD matrix-free CG over an n-device mesh
    (no bcs: Helmholtz-type operators; bc support follows the
    distributed lifting milestone)."""
    from ..assemble import assemble
    nshards = nshards or len(jax.devices())
    cg = make_distributed_cg(a, nshards, rtol=rtol, maxit=maxit)
    b = jnp.asarray(assemble(L).dat)
    x, its = cg(b)
    u.dat = np.asarray(x)
    u._dist_iterations = its
    return u
