"""User parallel loops over mesh entities.

Reference: firedrake/parloops.py:131 par_loop — user C/loopy kernels over
cells with access descriptors.  TPU-native version: the kernel is a plain
Python function of per-cell jnp arrays (traceable); access descriptors
(READ/WRITE/RW/INC/MIN/MAX — pyop2/types/access.py:4) drive the
gather/scatter exactly as PyOP2's Pack/Unpack codegen did
(pyop2/codegen/builder.py).  The whole loop is one jitted XLA program.

    par_loop(kernel, dx, {"u": (u, RW), "c": (coords, READ)})
    # kernel(u_cell (ndof_u,...), c_cell (...)) -> dict of written args
"""
from __future__ import annotations

from enum import Enum

import numpy as np
import jax
import jax.numpy as jnp


class Access(Enum):
    READ = "READ"
    WRITE = "WRITE"
    RW = "RW"
    INC = "INC"
    MIN = "MIN"
    MAX = "MAX"


READ = Access.READ
WRITE = Access.WRITE
RW = Access.RW
INC = Access.INC
MIN = Access.MIN
MAX = Access.MAX


def par_loop(kernel, measure, args: dict, kernel_kwargs=None):
    """Execute `kernel` per cell.  `kernel(**cell_args)` receives, for each
    name, the per-cell dof block (ndof,) and must return a dict
    {name: new_block} for every WRITE/RW/INC/MIN/MAX argument."""
    from .language.measure import Measure
    if isinstance(measure, Measure):
        assert measure.integral_type == "cell", \
            "facet par_loops land with the facet executor"
    names = list(args.keys())
    funcs = {n: args[n][0] for n in names}
    access = {n: args[n][1] for n in names}
    mesh = None
    for n in names:
        f = funcs[n]
        if hasattr(f, "function_space"):
            mesh = f.function_space().mesh_obj
            break
    assert mesh is not None, "need at least one Function argument"
    maps = {n: jnp.asarray(funcs[n].function_space().cell_dof_map)
            for n in names}

    def run(dats):
        gathered = {n: dats[n][maps[n]] for n in names}
        out = jax.vmap(
            lambda *vals: kernel(**dict(zip(names, vals)))
        )(*[gathered[n] for n in names])
        new = dict(dats)
        for n in names:
            acc = access[n]
            if acc == READ:
                continue
            m = maps[n].reshape(-1)
            w = out[n].reshape(-1)
            if acc in (WRITE, RW):
                new[n] = dats[n].at[m].set(w)
            elif acc == INC:
                # kernel returns per-cell INCREMENTS; duplicates accumulate
                new[n] = dats[n].at[m].add(w)
            elif acc == MIN:
                new[n] = dats[n].at[m].min(w)
            elif acc == MAX:
                new[n] = dats[n].at[m].max(w)
        return new

    dats = {n: jnp.asarray(funcs[n].dat) for n in names}
    result = jax.jit(run)(dats)
    for n in names:
        if access[n] != READ:
            funcs[n].dat = result[n]
