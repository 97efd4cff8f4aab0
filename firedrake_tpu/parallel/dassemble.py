"""Distributed (owner-computes) form execution over general partitions.

Reference role: pyop2 parallel parloops (pyop2/parloop.py:245-260 —
local compute + SF halo exchange) and firedrake's distributed assembly
contract: every integral type, any coefficient space, Dirichlet BCs.

TPU-first design: the serial FormAssembler already receives ALL its
index maps as jit arguments (assemble.py), so the distributed executor
is a thin layer that LOCALIZES those statics per shard — select the
shard's owned entities, translate every dof index into the shard's
[owned | ghost] local numbering, pad to the max — and stacks them with
a leading shard axis.  One shard_map program then runs the ORIGINAL
`FormAssembler._run` per shard on local data (same kernels, same flat
fast path), finishing with a trash-segment sorted accumulation (padding
contributions route to segment nloc and are dropped).  Ghost sums ride
static per-hop `ppermute` plans (parallel/partition.py).
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from .partition import MeshPartition, SpacePartition

_IDX = np.int32


def get_space_partition(cache: dict, V, mpart: MeshPartition):
    key = id(V)
    if key not in cache:
        cache[key] = SpacePartition(V, mpart)
    return cache[key]


# statics keys that hold dof indices, by which space they index
_COORD_IDX = ("coords_map", "coords_map_p", "coords_map_m")
_VAL_KEYS = ("lf", "lf_p", "lf_m", "o_rel", "sign_rows", "sign_cols",
             "T_rows", "T_cols")


class DistributedForm:
    """A rank-0/1 form compiled for SPMD execution over a MeshPartition.

    For rank 1 the result is the shard-local [owned | ghost] vector
    BEFORE halo reduction (callers compose reduce/bcast legs so matvec
    loops can fuse them); for rank 0 a per-shard partial sum.
    """

    def __init__(self, form, mpart: MeshPartition, parts: dict,
                 diag=False, matrix=False):
        from ..assemble import FormAssembler
        # the batched (cell-last) layout is not localization-aware;
        # flat + cell-major cover everything.  use_stencil=False:
        # the stencil fast path would DEFER the statics build past this
        # env guard (and the localizer always drives _run with explicit
        # shard statics anyway)
        old = os.environ.get("FDTPU_NO_BATCHED")
        os.environ["FDTPU_NO_BATCHED"] = "1"
        try:
            self.asm = FormAssembler(form, use_stencil=False)
        finally:
            if old is None:
                os.environ.pop("FDTPU_NO_BATCHED", None)
            else:
                os.environ["FDTPU_NO_BATCHED"] = old
        #: diag mode: a rank-2 form whose DIAGONAL is accumulated with
        #: the rank-1 machinery (off-diagonal local entries route to the
        #: trash segment) — the in-program Jacobi/Chebyshev diagonal
        self.diag = bool(diag)
        #: matrix mode: a rank-2 form accumulated ONCE per shard into a
        #: shard-local ELL block (nloc rows x K slots) — the assembled
        #: distributed operator (pyop2/types/mat.py:27 role).  Rows hold
        #: the shard's own cells' PARTIAL contributions; a matvec is
        #: local ELL SpMV + the same halo_reduce leg as action assembly,
        #: so the two operator modes are interchangeable in dsolve.
        self.matrix = bool(matrix)
        if self.asm.rank != 1 and not ((self.diag or self.matrix)
                                       and self.asm.rank == 2):
            raise NotImplementedError(
                "distributed assembly is rank-1 (residuals/actions), "
                "rank-2 diagonal, or rank-2 ELL (matrix=True)")
        if self.matrix:
            args = form.arguments()
            if args[0].space.dim != args[1].space.dim:
                raise NotImplementedError(
                    "distributed ELL operators are square")
        self.mpart = mpart
        V = self.asm.test.space if self.asm.rank >= 1 else None
        mesh = self.asm.mesh
        self.vpart = (get_space_partition(parts, V, mpart)
                      if V is not None else None)
        self.cpart = get_space_partition(
            parts, mesh.coordinates.function_space(), mpart)
        self.coeff_parts = {
            c.count: get_space_partition(parts, c.space, mpart)
            for c in self.asm.coefficients}
        self._localize()

    # ------------------------------------------------------ host setup
    def _localize(self):
        mpart = self.mpart
        nsh = mpart.nshards
        per_shard_statics = [[] for _ in range(nsh)]
        per_shard_pos = [[] for _ in range(nsh)]
        nloc = self.vpart.max_local if self.vpart else 0

        for ci, st in zip(self.asm._compiled, self.asm._statics):
            ents = np.asarray(st["_entities"])
            eshard = mpart.cell_shard[ents]
            sels, valids = [], []
            cmax = max(int((eshard == s).sum()) for s in range(nsh))
            cmax = max(cmax, 1)
            for s in range(nsh):
                sel = np.nonzero(eshard == s)[0]
                n = len(sel)
                pad = np.full(cmax - n, sel[0] if n else 0,
                              dtype=np.int64)
                sels.append(np.concatenate([sel, pad]))
                v = np.zeros(cmax, dtype=bool)
                v[:n] = True
                valids.append(v)

            for s in range(nsh):
                lst = self._localize_one(ci, st, s, sels[s], valids[s])
                per_shard_statics[s].append(lst)
                if self.asm.rank == 1:
                    rows_g = np.asarray(st["rows"])[sels[s]]
                    rl, ok = self.vpart.g2l(s, rows_g.reshape(-1))
                    assert ok[np.repeat(valids[s],
                                        rows_g.shape[1])].all(), \
                        "row dof missing from local set"
                    rl = rl.reshape(rows_g.shape).astype(np.int64)
                    rl[~valids[s]] = nloc          # trash segment
                    if st.get("batched"):          # flat: slot-major
                        per_shard_pos[s].append(rl.T.reshape(-1))
                    else:                          # cell-major
                        per_shard_pos[s].append(rl.reshape(-1))
                elif self.diag:
                    # rank-2 local tensors flatten cell-major (C, ni,
                    # nj); keep only i==j GLOBAL pairs, route the rest
                    # (and padding) to the trash segment
                    rows_g = np.asarray(st["rows"])[sels[s]]
                    cols_g = np.asarray(st["cols"])[sels[s]]
                    rl, ok = self.vpart.g2l(s, rows_g.reshape(-1))
                    rl = rl.reshape(rows_g.shape).astype(np.int64)
                    rl[~ok.reshape(rows_g.shape)] = nloc
                    pos = np.where(
                        rows_g[:, :, None] == cols_g[:, None, :],
                        rl[:, :, None], nloc)
                    pos[~valids[s]] = nloc
                    per_shard_pos[s].append(pos.reshape(-1))
                elif self.matrix:
                    # rank-2 (local row, local col) keys in the _run
                    # cell-major flat order; invalid/padding -> BIG
                    rows_g = np.asarray(st["rows"])[sels[s]]
                    cols_g = np.asarray(st["cols"])[sels[s]]
                    C, ni = rows_g.shape
                    nj = cols_g.shape[1]
                    rl, okr = self.vpart.g2l(s, rows_g.reshape(-1))
                    cl, okc = self.vpart.g2l(s, cols_g.reshape(-1))
                    rl = rl.reshape(C, ni).astype(np.int64)
                    cl = cl.reshape(C, nj).astype(np.int64)
                    okr = okr.reshape(C, ni)
                    okc = okc.reshape(C, nj)
                    key = (rl[:, :, None] * (nloc + 1)
                           + cl[:, None, :])
                    valid = (valids[s][:, None, None]
                             & okr[:, :, None] & okc[:, None, :])
                    key = np.where(valid, key,
                                   (nloc + 1) * (nloc + 1))
                    per_shard_pos[s].append(key.reshape(-1))

        # per-shard sorted accumulation plans (keep ALL entries so
        # shapes match across shards; padding sorts last into the
        # trash segment)
        self.acc = None
        self.ell_cols = None
        self.K = None
        if self.matrix:
            self._build_ell(per_shard_pos, nsh, nloc)
        elif self.asm.rank == 1 or self.diag:
            perms, segs = [], []
            for s in range(nsh):
                pos_all = np.concatenate(per_shard_pos[s])
                o = np.argsort(pos_all, kind="stable")
                perms.append(o.astype(_IDX))
                segs.append(pos_all[o].astype(_IDX))
            self.acc = {"perm": jnp.asarray(np.stack(perms)),
                        "seg": jnp.asarray(np.stack(segs))}

        # stack per-integral statics across shards (leading shard axis)
        self.statics = []
        for i in range(len(self.asm._compiled)):
            shards = [per_shard_statics[s][i] for s in range(nsh)]
            self.statics.append(jax.tree_util.tree_map(
                lambda *xs: jnp.asarray(np.stack(xs)), *shards))

    def _build_ell(self, per_shard_keys, nsh, nloc):
        """Shared-width ELL layout from per-shard (row, col) keys:
        slot(r, c) = r * K + rank-of-c-within-row; the accumulation
        plan routes every flat local-tensor entry (and all padding) to
        its slot (or the trash segment nloc*K), so ONE sorted
        segment-sum per solve materializes the shard's operator block
        as a dense (nloc, K) value table + static column table."""
        nl1 = nloc + 1
        BIG = nl1 * nl1
        keyss = [np.concatenate(per_shard_keys[s]) for s in range(nsh)]
        uniq = [np.unique(k[k < BIG]) for k in keyss]
        K = 1
        for u in uniq:
            if len(u):
                rows_u = u // nl1
                K = max(K, int(np.bincount(
                    rows_u, minlength=nloc).max()))
        self.K = K
        trash = nloc * K
        ecols = np.zeros((nsh, nloc * K), dtype=_IDX)
        perms, segs = [], []
        for s in range(nsh):
            u = uniq[s]
            key = keyss[s]
            if len(u):
                rows_u = (u // nl1).astype(np.int64)
                cols_u = (u % nl1).astype(np.int64)
                # np.unique sorts => keys grouped by row ascending; the
                # within-row rank is position minus the row's first
                first = np.r_[True, rows_u[1:] != rows_u[:-1]]
                starts = np.maximum.accumulate(
                    np.where(first, np.arange(len(u)), 0))
                slot_u = rows_u * K + (np.arange(len(u)) - starts)
                ecols[s, slot_u] = cols_u.astype(_IDX)
                pos_idx = np.clip(np.searchsorted(u, key), 0,
                                  len(u) - 1)
                slot = np.where(key < BIG, slot_u[pos_idx], trash)
            else:
                slot = np.full(len(key), trash, dtype=np.int64)
            o = np.argsort(slot, kind="stable")
            perms.append(o.astype(_IDX))
            segs.append(slot[o].astype(_IDX))
        self.acc = {"perm": jnp.asarray(np.stack(perms)),
                    "seg": jnp.asarray(np.stack(segs))}
        self.ell_cols = jnp.asarray(ecols)

    def _localize_one(self, ci, st, s, sel, valid):
        """Localized ARRAY statics of one integral for shard s."""
        cp = self.cpart
        out = {}

        def remap_idx(arr, part):
            a = np.asarray(arr)[sel]
            loc, ok = part.g2l(s, a.reshape(-1))
            assert ok[np.repeat(valid, a[0].size)].all(), \
                "dof missing from local set"
            return loc.reshape(a.shape)

        for k in _COORD_IDX:
            if k in st:
                out[k] = remap_idx(st[k], cp)
        if "coords_cols" in st:
            out["coords_cols"] = tuple(
                remap_idx(c, cp) for c in st["coords_cols"])
        for k in ("coeff_maps", "coeff_maps_p", "coeff_maps_m"):
            if k in st:
                out[k] = {cnt: remap_idx(v, self.coeff_parts[cnt])
                          for cnt, v in st[k].items()}
        if "coeff_cols" in st:
            out["coeff_cols"] = {
                cnt: tuple(remap_idx(c, self.coeff_parts[cnt])
                           for c in cols)
                for cnt, cols in st["coeff_cols"].items()}
        # value (non-index) arrays: select entity rows only
        for k in _VAL_KEYS:
            if k in st and st[k] is not None:
                out[k] = np.asarray(st[k])[sel]
        for k in ("coeff_signs", "coeff_signs_p", "coeff_signs_m",
                  "coeff_T", "coeff_T_p", "coeff_T_m"):
            if k in st:      # keep empty dicts: _run indexes the key
                out[k] = {cnt: np.asarray(v)[sel]
                          for cnt, v in st[k].items()}
        if "coeff_sign_cols" in st:
            out["coeff_sign_cols"] = {
                cnt: tuple(np.asarray(c)[sel] for c in cols)
                for cnt, cols in st["coeff_sign_cols"].items()}
        for k in ("sign_row_cols", "sign_col_cols"):
            if k in st and st[k] is not None:
                out[k] = tuple(np.asarray(c)[sel] for c in st[k])
        if self.asm.rank == 1 and "rows" in st:
            out["rows"] = remap_idx(st["rows"], self.vpart)
        if self.diag:
            # diag mode's _run path is rank-2 + acc: the trial-side maps
            # still feed coefficient-style gathers only; nothing extra
            pass
        return out

    # ---------------------------------------------------- device-side
    def run_local(self, coords_local, coeff_locals, const_vals,
                  statics_blk, acc_blk):
        """Per-shard body (call INSIDE shard_map; blk args carry a
        length-1 leading shard axis)."""
        statics = [jax.tree_util.tree_map(lambda a: a[0], st)
                   for st in statics_blk]
        acc = jax.tree_util.tree_map(lambda a: a[0], acc_blk)
        nloc = self.vpart.max_local
        nseg = nloc * self.K + 1 if self.matrix else nloc + 1
        out = self.asm._run(coords_local, coeff_locals, const_vals,
                            arg_statics=statics, acc=acc, nseg=nseg)
        if self.matrix:
            return out[:nloc * self.K].reshape(nloc, self.K)
        return out[:nloc]


def halo_reduce(v, ex, hops, nshards, axis="shards"):
    """Ghost partial sums -> owners; ghosts zeroed afterwards."""
    for dn, d in enumerate(hops):
        buf = v[ex["send_idx"][dn]] * ex["send_mask"][dn]
        perm = [(sh, sh + d) for sh in range(nshards)
                if 0 <= sh + d < nshards]
        recv = jax.lax.ppermute(buf, axis, perm)
        v = v.at[ex["recv_idx"][dn]].add(recv * ex["recv_mask"][dn])
    return v * ex["local_owned_mask"]


def halo_bcast(v, ex, hops, nshards, axis="shards"):
    """Owner values -> ghost slots (the SF-bcast leg)."""
    for dn, d in enumerate(hops):
        buf = v[ex["recv_idx"][dn]] * ex["recv_mask"][dn]
        perm = [(sh, sh - d) for sh in range(nshards)
                if 0 <= sh - d < nshards]
        recv = jax.lax.ppermute(buf, axis, perm)
        upd = jnp.where(ex["send_mask"][dn] > 0, recv,
                        v[ex["send_idx"][dn]])
        v = v.at[ex["send_idx"][dn]].set(upd)
    return v
