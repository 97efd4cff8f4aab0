"""Owner-computes distributed assembly with halo exchange.

Reference: the core SPMD machinery — DMPlex partition + 1-cell overlap
(firedrake/mesh.py:616,:621), core/owned/ghost entity classes
(pyop2/types/set.py:36-48), PETSc SF halo exchange with split begin/end
(firedrake/halo.py:125-171, pyop2/parloop.py:245-260).

TPU mapping (SURVEY §2.9 N14, §5.8): a 1-D strip decomposition of the
cell set over the 'shards' axis of a jax device mesh.  Each shard holds a
LOCAL dof vector [owned | ghost]; assembly scatter-adds into it locally,
then ghost contributions ride a fixed-size neighbor `ppermute` to their
owners (the SF-reduce leg).  Owner -> ghost refresh (the SF-bcast leg) is
a second ppermute.  All buffers are statically padded — the XLA-friendly
encoding of PyOP2's variable-degree SF graphs.

v1 scope: 1-D strip partitions (neighbors = left/right), cell integrals.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh as JMesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

_IDX = np.int32


class StripPartition:
    """Static partition data for owner-computes assembly of one space."""

    def __init__(self, V, nshards: int):
        self.V = V
        self.nshards = nshards
        mesh = V.mesh_obj
        ncell = mesh.num_cells
        # contiguous cell strips (cells are built column/row-contiguous by
        # the utility meshes; RCM reordering upgrade later)
        bounds = np.linspace(0, ncell, nshards + 1).astype(np.int64)
        self.cell_shard = np.zeros(ncell, dtype=np.int64)
        for s in range(nshards):
            self.cell_shard[bounds[s]:bounds[s + 1]] = s

        cmap = V.cell_dof_map.astype(np.int64)      # (ncell, nd)
        ndof = V.dim
        # dof owner = min shard among touching cells
        owner = np.full(ndof, nshards, dtype=np.int64)
        np.minimum.at(owner, cmap.reshape(-1),
                      np.repeat(self.cell_shard, cmap.shape[1]))
        self.dof_owner = owner

        # per shard: local dof list = owned first, then ghosts (sorted)
        self.local_dofs = []       # global ids per shard
        self.global_to_local = []  # dict per shard
        self.n_owned = []
        touched = [np.unique(cmap[self.cell_shard == s]) for s
                   in range(nshards)]
        for s in range(nshards):
            t = touched[s]
            own = t[owner[t] == s]
            # also own any dof nobody touches? (none) — plus owned dofs
            # not touched by our cells cannot exist (owner=min toucher)
            ghosts = t[owner[t] != s]
            loc = np.concatenate([own, ghosts])
            self.local_dofs.append(loc)
            self.n_owned.append(len(own))
            self.global_to_local.append(
                {int(g): i for i, g in enumerate(loc)})
        self.max_local = max(len(l) for l in self.local_dofs)
        self.max_owned = max(self.n_owned)

        # per-shard cell lists (padded) and LOCAL dof maps
        counts = [int((self.cell_shard == s).sum()) for s in range(nshards)]
        self.max_cells = max(counts)
        nd = cmap.shape[1]
        self.local_cmap = np.zeros((nshards, self.max_cells, nd),
                                   dtype=_IDX)
        self.cell_valid = np.zeros((nshards, self.max_cells))
        self.shard_cells = np.zeros((nshards, self.max_cells),
                                    dtype=np.int64)
        for s in range(nshards):
            cells = np.nonzero(self.cell_shard == s)[0]
            self.shard_cells[s, :len(cells)] = cells
            self.cell_valid[s, :len(cells)] = 1.0
            g2l = self.global_to_local[s]
            lm = np.vectorize(lambda g: g2l[int(g)])(cmap[cells]) \
                if len(cells) else np.zeros((0, nd))
            self.local_cmap[s, :len(cells)] = lm
            # padding rows point at local slot 0 with zero valid-mask

        # ghost -> owner exchange plan (reduce leg).  General partitions
        # may ghost across any hop distance; we build per-(signed hop)
        # buffers and only keep hops that actually occur (for spatially
        # coherent strips that is just +-1 — the SF graph equivalent).
        send_plans = {}
        hops = set()
        for s in range(nshards):
            loc = self.local_dofs[s]
            gh = loc[self.n_owned[s]:]
            for t in np.unique(owner[gh]) if len(gh) else []:
                d = int(t) - s
                sel = gh[owner[gh] == int(t)]
                send_plans[(s, d)] = sel
                hops.add(d)
        self.hops = sorted(hops)
        self.halo_buf = max([len(v) for v in send_plans.values()] + [1])
        nh = max(len(self.hops), 1)
        self.send_idx = np.zeros((nshards, nh, self.halo_buf), dtype=_IDX)
        self.send_mask = np.zeros((nshards, nh, self.halo_buf))
        self.recv_idx = np.zeros((nshards, nh, self.halo_buf), dtype=_IDX)
        self.recv_mask = np.zeros((nshards, nh, self.halo_buf))
        for (s, d), sel in send_plans.items():
            dn = self.hops.index(d)
            t = s + d
            g2l_s = self.global_to_local[s]
            self.send_idx[s, dn, :len(sel)] = [g2l_s[int(g)] for g in sel]
            self.send_mask[s, dn, :len(sel)] = 1.0
            g2l_t = self.global_to_local[t]
            self.recv_idx[t, dn, :len(sel)] = [g2l_t[int(g)] for g in sel]
            self.recv_mask[t, dn, :len(sel)] = 1.0
        # owned mask over the padded LOCAL layout (Krylov dot products
        # must count every dof exactly once — owners only)
        self.local_owned_mask = np.zeros((nshards, self.max_local))
        for s in range(nshards):
            self.local_owned_mask[s, :self.n_owned[s]] = 1.0
        # owned -> global gather (for collecting the result)
        self.owned_global = np.zeros((nshards, self.max_owned),
                                     dtype=np.int64)
        self.owned_mask = np.zeros((nshards, self.max_owned))
        for s in range(nshards):
            n = self.n_owned[s]
            self.owned_global[s, :n] = self.local_dofs[s][:n]
            self.owned_mask[s, :n] = 1.0
        # local padded dof arrays: global -> (shard, local) scatter for
        # distributing a global vector
        self.local_global = np.zeros((nshards, self.max_local),
                                     dtype=np.int64)
        self.local_mask = np.zeros((nshards, self.max_local))
        for s in range(nshards):
            l = self.local_dofs[s]
            self.local_global[s, :len(l)] = l
            self.local_mask[s, :len(l)] = 1.0


def distributed_residual_fn(assembler, part: StripPartition, n_devices,
                            devices=None):
    """Owner-computes distributed 1-form assembly: returns fn(global dats)
    -> global residual, internally sharded with halo reduce via ppermute.

    (Coefficients are distributed to local [owned|ghost] arrays — the
    SF-bcast leg — computed from the same partition tables.)
    """
    assert n_devices == part.nshards
    devices = devices if devices is not None else jax.devices()[:n_devices]
    jmesh = JMesh(np.array(devices), ("shards",))
    V = assembler.test.space
    mesh = V.mesh_obj
    gdim = mesh.geometric_dimension

    # per-shard static arrays
    coords_V = mesh.coordinates.function_space()
    cpart = StripPartition(coords_V, part.nshards) \
        if coords_V is not V else part
    # reuse cell strips: assume identical (same mesh + same strip bounds)
    cis = [ci for ci in assembler._compiled]
    for ci in cis:
        if ci.integral_type != "cell":
            raise NotImplementedError("distributed facet integrals: "
                                      "halo overlap milestone")

    # kernel over one shard's cells
    nshards = part.nshards
    L = part.halo_buf

    statics = dict(
        lcmap=jnp.asarray(part.local_cmap),
        valid=jnp.asarray(part.cell_valid),
        c_lcmap=jnp.asarray(cpart.local_cmap),
        send_idx=jnp.asarray(part.send_idx),
        send_mask=jnp.asarray(part.send_mask),
        recv_idx=jnp.asarray(part.recv_idx),
        local_global=jnp.asarray(part.local_global),
        local_mask=jnp.asarray(part.local_mask),
        c_local_global=jnp.asarray(cpart.local_global),
        owned_global=jnp.asarray(part.owned_global),
        owned_mask=jnp.asarray(part.owned_mask),
    )

    nloc = part.max_local
    ndof = V.dim

    def shard_fn(coords_dat, statics_blk, coeff_blks, coeff_dats_list):
        """Runs per shard (shard_map body). statics_blk entries carry a
        leading length-1 shard axis — strip it."""
        st = {k: v[0] for k, v in statics_blk.items()}
        c_local = coords_dat[st["c_local_global"]]
        ce = c_local[st["c_lcmap"]].reshape(part.max_cells, -1, gdim)
        ws = []
        for cst, cdat in zip(coeff_blks, coeff_dats_list):
            cs = {k: v[0] for k, v in cst.items()}
            wl = cdat[cs["local_global"]]
            ws.append(wl[cs["lcmap"]])
        acc = jnp.zeros(nloc)
        for ci in cis:
            kern = ci.kernel()
            loc = jax.vmap(lambda x, *w: kern(x, w, ()))(ce, *ws)
            vals = loc[:, :, 0] * st["valid"][:, None]
            acc = acc.at[st["lcmap"].reshape(-1)].add(vals.reshape(-1))
        # halo reduce (SF-reduce leg): ship ghost sums to their owners,
        # one ppermute per occurring hop distance
        for dn, d in enumerate(part.hops):
            buf = acc[st["send_idx"][dn]] * st["send_mask"][dn]
            perm = [(sh, sh + d) for sh in range(nshards)
                    if 0 <= sh + d < nshards]
            recv = jax.lax.ppermute(buf, "shards", perm)
            acc = acc.at[st["recv_idx"][dn]].add(recv)
        # collect: each shard scatters its OWNED dofs; psum concatenates
        own_vals = acc[:part.max_owned] * st["owned_mask"]
        out = jnp.zeros(ndof).at[st["owned_global"]].add(own_vals)
        return jax.lax.psum(out, "shards")

    coeff_parts = [(c, StripPartition(c.space, nshards))
                   for c in assembler.coefficients]
    coeff_statics = [
        {"local_global": jnp.asarray(pp.local_global),
         "lcmap": jnp.asarray(pp.local_cmap)} for _, pp in coeff_parts]

    shard_spec = {k: P("shards") for k in statics}
    cspecs = [{k: P("shards") for k in cst} for cst in coeff_statics]

    smapped = shard_map(
        lambda cd, stat, cstats, cdats: shard_fn(cd, stat, cstats, cdats),
        mesh=jmesh,
        in_specs=(P(), shard_spec, cspecs, [P()] * len(coeff_statics)),
        out_specs=P(),
    )

    def fn(coords_dat, coeff_dats):
        cdats = [jnp.asarray(coeff_dats[c.count]) for c, _ in coeff_parts]
        return smapped(coords_dat, statics, coeff_statics, cdats)

    return fn
