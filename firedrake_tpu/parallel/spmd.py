"""SPMD assembly over a jax.sharding device mesh.

Reference: the MPI spatial domain decomposition (SURVEY §2.10.1 —
DMPlex._distribute + halo overlap, pyop2/parloop.py:245 comm/compute
overlap).  TPU mapping: partition the CELL loop across a 1-D 'cells' mesh
axis with shard_map; dof data is kept replicated in v1 (each shard
scatter-adds into a full-length vector, combined with psum).  This is
exact and compiles to ICI all-reduces; the owner-computes/halo-exchange
(ppermute) layout for memory-scalable runs is the next parallel milestone.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh as JMesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def partition_cells(ncells: int, nshards: int):
    """Pad the cell range to a multiple of nshards; returns (cells_padded
    (nshards, per), valid mask (nshards, per))."""
    per = -(-ncells // nshards)
    padded = per * nshards
    cells = np.arange(padded) % ncells          # wrap padding onto cell 0..
    valid = np.arange(padded) < ncells
    return cells.reshape(nshards, per), valid.reshape(nshards, per)


def sharded_residual_fn(assembler, n_devices, devices=None):
    """Build (fn, args) where fn assembles a 1-form with cells sharded over
    a 1-D device mesh.  Works for cell-integral-only forms (v1)."""
    devices = devices if devices is not None else jax.devices()[:n_devices]
    jmesh = JMesh(np.array(devices), ("cells",))

    V = assembler.test.space
    mesh = assembler.mesh
    gdim = mesh.geometric_dimension
    nd = V.dim

    # only cell integrals in v1 sharded path
    parts = []
    for ci, st in zip(assembler._compiled, assembler._statics):
        if ci.integral_type != "cell":
            raise NotImplementedError("sharded facet integrals: next "
                                      "milestone (halo exchange)")
        parts.append((ci, st))

    ncells = mesh.num_cells
    cells_sh, valid_sh = partition_cells(ncells, n_devices)

    # per-shard static index arrays
    def shard_statics(st):
        cmap = np.asarray(st["coords_map"])[cells_sh]     # (ns, per, ndofc, g)
        rows = np.asarray(st["rows"])[cells_sh]
        cms = {k: np.asarray(v)[cells_sh]
               for k, v in st["coeff_maps"].items()}
        return cmap, rows, cms

    shard_data = [shard_statics(st) for _, st in parts]

    def local_assemble(coords_dat, coeff_dats, const_vals, *shard_arrays):
        """Runs per shard: shard_arrays are the cell-sharded index blocks
        (leading axis 1 after shard_map strips the mesh axis)."""
        total = jnp.zeros(nd)
        i = 0
        for (ci, st), _ in zip(parts, shard_data):
            cmap = shard_arrays[i][0]
            rows = shard_arrays[i + 1][0]
            vmask = shard_arrays[i + 2][0]
            ncoef = len(ci.coefficients)
            cms = shard_arrays[i + 3:i + 3 + ncoef]
            i += 3 + ncoef
            kern = ci.kernel()
            consts = tuple(const_vals[c.count] for c in ci.constants)
            ce = coords_dat[cmap]
            ws = tuple(coeff_dats[c.count][m[0]]
                       for c, m in zip(ci.coefficients, cms))
            loc = jax.vmap(lambda c, *w: kern(c, w, consts))(ce, *ws)
            vals = loc[:, :, 0] * vmask[:, None]
            total = total.at[rows.reshape(-1)].add(vals.reshape(-1))
        return jax.lax.psum(total, "cells")

    # assemble arg list: for each part: cmap, rows, valid, then coeff maps
    shard_args = []
    in_specs = [None, None, None]   # replicated dats
    for (ci, st), (cmap, rows, cms) in zip(parts, shard_data):
        shard_args += [jnp.asarray(cmap), jnp.asarray(rows),
                       jnp.asarray(valid_sh, dtype=jnp.float64)]
        for c in ci.coefficients:
            shard_args.append(jnp.asarray(cms[c.count]))

    smapped = shard_map(
        local_assemble, mesh=jmesh,
        in_specs=(P(), P(), P()) + tuple(P("cells") for _ in shard_args),
        out_specs=P(),
    )

    def fn(coords_dat, coeff_dats, const_vals):
        return smapped(coords_dat, coeff_dats, const_vals, *shard_args)

    return fn


def one_cg_step(op, b, x):
    """A single CG iteration (for the multichip dry-run 'training step')."""
    r = b - op(x)
    p = r
    Ap = op(p)
    alpha = jnp.vdot(r, r) / jnp.vdot(p, Ap)
    return x + alpha * p
