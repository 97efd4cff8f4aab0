"""General cell partitions with one-cell overlap for SPMD assembly.

Reference roles:
- DMPlex partition + 1-cell overlap: firedrake/mesh.py:616-626
  (distribute(overlap_type=FACET, overlap=1)).
- core/owned/ghost entity classes: pyop2/types/set.py:36-48.
- PETSc SF neighbor graphs (halo.py:125-171) -> here: static per-hop
  ppermute plans on the 'shards' mesh axis.

TPU-first shape: the partition is STATIC host data (numpy, fully
vectorized — no Python dict loops) baked into padded int32 arrays that
ride into one shard_map program as jit arguments.  Cells are ordered by
a Morton space-filling curve on centroids so equal-count contiguous
chunks are spatially coherent and the shard-to-shard hop set stays
small (the SFC analogue of graph partitioning without METIS).
"""
from __future__ import annotations

import numpy as np

_IDX = np.int32


def sfc_cell_order(mesh):
    """Morton (Z-curve) order of cells by centroid — vectorized."""
    coords = np.asarray(mesh.coordinates.dat).reshape(
        -1, mesh.geometric_dimension)
    # P1 coords: vertex dofs coincide with vertices; for higher-order
    # coordinate fields fall back to vertex positions
    verts = coords[:mesh.topology.num_vertices] \
        if coords.shape[0] >= mesh.topology.num_vertices else coords
    cent = verts[mesh.topology.cell_vertices].mean(axis=1)   # (nc, g)
    g = cent.shape[1]
    lo, hi = cent.min(axis=0), cent.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    bits = 16 if g <= 2 else 10
    q = np.minimum(((cent - lo) / span * ((1 << bits) - 1)).astype(
        np.uint64), (1 << bits) - 1)
    key = np.zeros(len(cent), dtype=np.uint64)
    for b in range(bits):
        for d in range(g):
            key |= ((q[:, d] >> np.uint64(b)) & np.uint64(1)) << \
                np.uint64(b * g + d)
    return np.argsort(key, kind="stable")


class MeshPartition:
    """Cell ownership + one-layer (facet-adjacent) ghost cells.

    cell_shard[c]   owner shard of cell c
    owned_cells[s]  cells owned by shard s (SFC-contiguous)
    ghost_cells[s]  facet-neighbors of owned cells living elsewhere
    local_cells[s]  owned + ghost (this shard's cell universe)
    facet_shard[f]  owner shard of facet f (shard of its first cell)
    """

    def __init__(self, mesh, nshards, order=None, cell_shard=None):
        self.mesh = mesh
        self.nshards = nshards
        topo = mesh.topology
        ncell = topo.num_cells
        if cell_shard is not None:
            # explicit ownership (hierarchy levels inherit the coarse
            # partition so parent/child cells stay on one shard)
            self.cell_shard = np.asarray(cell_shard, dtype=np.int64)
            assert self.cell_shard.shape == (ncell,)
        else:
            order = sfc_cell_order(mesh) if order is None else order
            bounds = np.linspace(0, ncell, nshards + 1).astype(np.int64)
            self.cell_shard = np.empty(ncell, dtype=np.int64)
            for s in range(nshards):
                self.cell_shard[order[bounds[s]:bounds[s + 1]]] = s

        fc = topo.facet_cells                      # (nf, 2), -1 ext
        interior = topo.interior_facets
        cp, cm = fc[interior, 0], fc[interior, 1]
        sp, sm = self.cell_shard[cp], self.cell_shard[cm]
        # ghost layer: for every interior facet crossing a shard
        # boundary, each side ghosts the other side's cell
        self.owned_cells, self.ghost_cells, self.local_cells = [], [], []
        cross = sp != sm
        for s in range(nshards):
            own = np.nonzero(self.cell_shard == s)[0]
            gh = np.unique(np.concatenate([
                cm[cross & (sp == s)], cp[cross & (sm == s)]]))
            self.owned_cells.append(own)
            self.ghost_cells.append(gh)
            self.local_cells.append(np.concatenate([own, gh]))

        # facet ownership: shard of the facet's plus cell
        nf = fc.shape[0]
        self.facet_shard = np.where(
            fc[:, 0] >= 0, self.cell_shard[np.maximum(fc[:, 0], 0)], -1)

        self.max_owned_cells = max(len(o) for o in self.owned_cells)
        self.max_local_cells = max(len(l) for l in self.local_cells)


class SpacePartition:
    """Local [owned | ghost] dof numbering of one FunctionSpace over a
    MeshPartition, plus static halo-exchange plans.

    Dof owner = min shard among local-cell touchers.  Local dof set =
    every dof touched by the shard's LOCAL cells (owned + ghost) so
    facet integrals and owner-computes matvecs see complete data.
    """

    def __init__(self, V, mpart: MeshPartition):
        self.V = V
        self.mpart = mpart
        nshards = mpart.nshards
        cmap = np.asarray(V.cell_dof_map, dtype=np.int64)  # (nc, nd)
        ndof = V.dim
        nd = cmap.shape[1]

        # dof owner = min owner-shard among OWNED-cell touchers
        owner = np.full(ndof, nshards, dtype=np.int64)
        np.minimum.at(owner, cmap.reshape(-1),
                      np.repeat(mpart.cell_shard, nd))
        self.dof_owner = owner

        # per-shard local dof lists (vectorized: one global sort pass)
        self.local_dofs, self.n_owned = [], []
        self._l2g, self._g2l = [], []
        for s in range(nshards):
            t = np.unique(cmap[mpart.local_cells[s]])
            own = t[owner[t] == s]
            gh = t[owner[t] != s]
            loc = np.concatenate([own, gh])
            self.local_dofs.append(loc)
            self.n_owned.append(len(own))
            # g2l as a searchsorted table over the sorted local list
            sl = np.argsort(loc, kind="stable")
            self._l2g.append(loc)
            self._g2l.append((loc[sl], sl))

        self.max_local = max(len(l) for l in self.local_dofs)
        self.max_owned = max(self.n_owned)

        self._build_exchange()

    def g2l(self, s, gids):
        """Vectorized global -> local dof translation on shard s."""
        keys, perm = self._g2l[s]
        pos = np.searchsorted(keys, gids)
        pos = np.minimum(pos, len(keys) - 1)
        found = keys[pos] == gids
        out = np.where(found, perm[pos], 0)
        return out.astype(_IDX), found

    def _build_exchange(self):
        """Per-hop ppermute plans for the two SF legs.

        reduce leg: ghost partial sums -> owner (hop d = owner - self)
        bcast leg:  owner values -> ghosts (same tables, reversed)
        """
        nshards = self.mpart.nshards
        owner = self.dof_owner
        plans = {}          # (src, hop) -> (local ids on src, on dst)
        hops = set()
        for s in range(nshards):
            loc = self.local_dofs[s]
            gh = loc[self.n_owned[s]:]
            if not len(gh):
                continue
            gown = owner[gh]
            for t in np.unique(gown):
                d = int(t) - s
                sel = gh[gown == t]
                src_l, _ = self.g2l(s, sel)
                dst_l, ok = self.g2l(int(t), sel)
                assert ok.all(), "ghost dof not present on owner shard"
                plans[(s, d)] = (src_l, dst_l)
                hops.add(d)
        self.hops = sorted(hops)
        nh = max(len(self.hops), 1)
        L = max([len(v[0]) for v in plans.values()] + [1])
        self.halo_buf = L
        self.send_idx = np.zeros((nshards, nh, L), dtype=_IDX)
        self.send_mask = np.zeros((nshards, nh, L))
        self.recv_idx = np.zeros((nshards, nh, L), dtype=_IDX)
        self.recv_mask = np.zeros((nshards, nh, L))
        for (s, d), (src_l, dst_l) in plans.items():
            dn = self.hops.index(d)
            t = s + d
            n = len(src_l)
            self.send_idx[s, dn, :n] = src_l
            self.send_mask[s, dn, :n] = 1.0
            self.recv_idx[t, dn, :n] = dst_l
            self.recv_mask[t, dn, :n] = 1.0

        # padded global<->local tables
        nshards_ = nshards
        self.local_global = np.zeros((nshards_, self.max_local),
                                     dtype=np.int64)
        self.local_mask = np.zeros((nshards_, self.max_local))
        self.owned_global = np.zeros((nshards_, self.max_owned),
                                     dtype=np.int64)
        self.owned_mask = np.zeros((nshards_, self.max_owned))
        self.local_owned_mask = np.zeros((nshards_, self.max_local))
        for s in range(nshards_):
            l = self.local_dofs[s]
            self.local_global[s, :len(l)] = l
            self.local_mask[s, :len(l)] = 1.0
            n = self.n_owned[s]
            self.owned_global[s, :n] = l[:n]
            self.owned_mask[s, :n] = 1.0
            self.local_owned_mask[s, :n] = 1.0

    def exchange_arrays(self):
        import jax.numpy as jnp
        return dict(
            send_idx=jnp.asarray(self.send_idx),
            send_mask=jnp.asarray(self.send_mask),
            recv_idx=jnp.asarray(self.recv_idx),
            recv_mask=jnp.asarray(self.recv_mask),
            local_global=jnp.asarray(self.local_global),
            local_mask=jnp.asarray(self.local_mask),
            owned_global=jnp.asarray(self.owned_global),
            owned_mask=jnp.asarray(self.owned_mask),
            local_owned_mask=jnp.asarray(self.local_owned_mask),
        )
