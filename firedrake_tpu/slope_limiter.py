"""Vertex-based slope limiter for DG1 (Kuzmin 2010).

Reference: firedrake/slope_limiter/vertex_based_limiter.py:13
VertexBasedLimiter (P1DG bounds via par_loops).  TPU version: three
scatter/gather passes, all jnp — cell means scatter-max/min to vertices,
then per-cell linear scaling — one jitted program."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .functionspace import FunctionSpace
from .function import Function


class VertexBasedLimiter:
    def __init__(self, space: FunctionSpace):
        V = space
        elem = V.scalar_element
        # accept DG1 in any spelling with vertex-lattice nodes: plain
        # "DG", or BrokenElement(CG1/DG1) — the reference's periodic-
        # mesh idiom (test_vertex_based_limiter.py builds P1DG by
        # breaking the coordinate element)
        base = getattr(elem, "sub", elem)
        if not (base.family in ("Lagrange", "Discontinuous Lagrange")
                and base.degree == 1 and V.block_size == 1
                and not getattr(elem, "continuous", True)):
            raise ValueError("VertexBasedLimiter needs scalar DG1")
        self.V = V
        mesh = V.mesh_obj
        # DG1 node k of cell c sits at vertex k (simplex) — map to vertices
        self.cell_verts = jnp.asarray(mesh.topology.cell_vertices)
        self.cnm = jnp.asarray(V.cell_dof_map)
        self.nvert = mesh.num_vertices
        nvc = mesh.cell.num_vertices
        self._jit = jax.jit(self._apply_impl)

    def _apply_impl(self, dat):
        vals = dat[self.cnm]                      # (ncell, nvc)
        means = vals.mean(axis=1)                 # exact for (D)P1
        big = jnp.finfo(dat.dtype).max
        vmax = jnp.full(self.nvert, -big).at[self.cell_verts.reshape(-1)]\
            .max(jnp.repeat(means, self.cell_verts.shape[1]))
        vmin = jnp.full(self.nvert, big).at[self.cell_verts.reshape(-1)]\
            .min(jnp.repeat(means, self.cell_verts.shape[1]))
        hi = vmax[self.cell_verts]                # (ncell, nvc)
        lo = vmin[self.cell_verts]
        dev = vals - means[:, None]
        eps = 1e-14
        alpha_hi = jnp.where(dev > eps, (hi - means[:, None]) / (dev + eps),
                             1.0)
        alpha_lo = jnp.where(dev < -eps, (lo - means[:, None]) / (dev - eps),
                             1.0)
        alpha = jnp.clip(jnp.minimum(alpha_hi, alpha_lo), 0.0, 1.0)
        alpha_cell = alpha.min(axis=1)
        limited = means[:, None] + alpha_cell[:, None] * dev
        return dat.at[self.cnm.reshape(-1)].set(limited.reshape(-1))

    def apply(self, field: Function):
        field.dat = self._jit(jnp.asarray(field.dat))
        return field

    def compute_bounds(self, field: Function):
        pass   # bounds are recomputed inside apply (single fused program)
