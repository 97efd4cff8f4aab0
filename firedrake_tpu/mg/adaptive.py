"""AdaptiveMeshHierarchy: geometric multigrid over NVB-bisected meshes.

Reference: firedrake/mg/mesh.py:433 AdaptiveMeshHierarchy (netgen-based
refine_marked_elements + non-uniform coarse->fine maps).  Here levels
come from adapt.refine_marked (triangles or tets), whose variable
children-per-parent provenance (``fine.parent_cells``) drives a sparse
interpolation transfer instead of the fixed per-type child maps of the
uniform LevelTransfer:

  P[fi, cj] = coarse basis j at the location of fine dof i
              (pulled back through the fine dof's PARENT coarse cell)

— exact for nested bisection, so prolongation is the FEM embedding, the
dual restriction is P^T, and injection evaluates the fine function at
each coarse node through a child cell that contains it.  All three
apply as one device SpMV (assembly.matrix.Matrix)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .mesh import HierarchyBase

__all__ = ["AdaptiveMeshHierarchy", "AdaptiveTransfer"]


def _ref_coords(verts, pts, tdim):
    """Reference coords of physical `pts` in the affine simplex `verts`."""
    A = np.stack([verts[k + 1] - verts[0] for k in range(tdim)], axis=1)
    return np.linalg.solve(A, (pts - verts[0]).T).T


def _interp_matrix(V_from, V_to, candidates_of):
    """Sparse M with M[i, j] = phi_j^{from}(x_i^{to}) for nodal spaces.

    candidates_of(ct) yields `from`-cells to try for the nodes of `to`
    cell ct; each node uses the first candidate containing it (any
    containing cell gives the same value for a conforming function).
    Returns an assembly.matrix.Matrix over scalar node numberings."""
    from ..assembly.sparsity import Sparsity
    from ..assembly.matrix import Matrix

    mt, mfr = V_to.mesh_obj, V_from.mesh_obj
    tdim = mt.cell.dim
    el_to, el_from = V_to.scalar_element, V_from.scalar_element
    nodes = el_to.nodes                                  # (nd_t, tdim)
    cv_t = mt._vertex_coords[mt.topology.cell_vertices]
    cv_f = mfr._vertex_coords[mfr.topology.cell_vertices]
    nmap_t = np.asarray(V_to.cell_node_map, dtype=np.int64)
    nmap_f = np.asarray(V_from.cell_node_map, dtype=np.int64)
    nd_t, nd_f = el_to.ndof, el_from.ndof

    rows, cols, vals = [], [], []
    for ct in range(mt.num_cells):
        J = np.stack([cv_t[ct][k + 1] - cv_t[ct][0] for k in range(tdim)],
                     axis=1)
        phys = cv_t[ct][0] + nodes @ J.T
        cands = list(candidates_of(ct))
        qs = {cf: _ref_coords(cv_f[cf], phys, tdim) for cf in cands}
        for n in range(nd_t):
            best, bestd = cands[0], np.inf
            for cf in cands:
                q = qs[cf][n]
                d = max(-q.min(initial=0.0), q.sum() - 1.0)
                if d < bestd:
                    best, bestd = cf, d
                if d <= 1e-12:
                    break
            assert bestd < 1e-9, ("node outside every candidate cell",
                                  ct, n, bestd)
            tab = el_from.tabulate(qs[best][n][None], 0)[0][0]  # (nd_f,)
            rows.append(np.full(nd_f, nmap_t[ct][n]))
            cols.append(np.asarray(nmap_f[best]))
            vals.append(tab)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = np.concatenate(vals)
    # shared `to` nodes are written by every adjacent cell with the SAME
    # value (conforming nested interpolation): average by multiplicity
    mult = np.zeros(V_to.sdata.num_nodes)
    np.add.at(mult, nmap_t.reshape(-1), 1.0)
    vals = vals / mult[rows]
    sp = Sparsity(V_to.sdata.num_nodes, V_from.sdata.num_nodes,
                  [(rows[:, None], cols[:, None])])
    data = jnp.zeros(sp.nnz).at[jnp.asarray(
        sp.block_positions[0])].add(jnp.asarray(vals))
    return Matrix(sp, data, None, None)


class AdaptiveTransfer:
    """LevelTransfer-compatible transfer between a mesh and its
    refine_marked() refinement (variable children per parent)."""

    def __init__(self, Vc, Vf):
        mc, mf = Vc.mesh_obj, Vf.mesh_obj
        parent = np.asarray(mf.parent_cells, dtype=np.int64)
        assert len(parent) == mf.num_cells
        if getattr(Vc.scalar_element, "mapping", "identity") != "identity":
            raise NotImplementedError("adaptive transfer: nodal spaces")
        assert Vc.scalar_element == Vf.scalar_element
        self.bs = Vc.block_size
        children = [[] for _ in range(mc.num_cells)]
        for cf, cp in enumerate(parent):
            children[cp].append(cf)
        # prolongation: fine nodes <- coarse basis through the parent
        self._P = _interp_matrix(Vc, Vf, lambda cf: [parent[cf]])
        # injection: coarse nodes <- fine basis through a containing child
        self._I = _interp_matrix(Vf, Vc, lambda cc: children[cc])

        bs = self.bs
        if bs == 1:
            self.prolong_fn = self._P.matvec
            self.restrict_fn = self._P.transpose_matvec
            self.inject_fn = self._I.matvec
        else:
            def _blocked(op):
                def run(x):
                    xm = x.reshape(-1, bs)
                    return jnp.stack([op(xm[:, k]) for k in range(bs)],
                                     axis=1).reshape(-1)
                return run
            self.prolong_fn = _blocked(self._P.matvec)
            self.restrict_fn = _blocked(self._P.transpose_matvec)
            self.inject_fn = _blocked(self._I.matvec)


class AdaptiveMeshHierarchy(HierarchyBase):
    """Reference: firedrake/mg/mesh.py:433 (netgen adaptive hierarchy).
    Start from a base mesh; each refine(markers) appends an NVB-refined
    level; 'mg' preconditioning works across the levels through
    AdaptiveTransfer."""

    def __init__(self, base_mesh):
        super().__init__([base_mesh])

    def refine(self, markers):
        from ..adapt import refine_marked
        fine = refine_marked(self.meshes[-1], markers)
        fine._coarse_mesh = self.meshes[-1]
        self.meshes.append(fine)
        for lvl, m in enumerate(self.meshes):
            m._mg_hierarchy = self
            m._mg_level = lvl
        return fine
