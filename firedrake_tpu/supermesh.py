"""Supermesh: mixed mass matrices between non-matching meshes.

Reference: firedrake/supermeshing.py:70 assemble_mixed_mass_matrix
(backed by libsupermesh's C triangle-intersection kernels + rtree);
used for conservative (Galerkin) projection between meshes.

Here the supermesh is built host-side in numpy: candidate cell pairs
from a KD-tree over centroids, Sutherland–Hodgman clipping of triangle
against triangle, fan triangulation of each intersection polygon, and a
quadrature loop that evaluates BOTH spaces' bases at the common physical
points (affine reference inversion per mesh).  2D triangle meshes.
"""
from __future__ import annotations

import numpy as np


def _clip_poly_halfplane(poly, a, b):
    """Clip polygon by the half-plane left of segment a->b."""
    n = np.array([-(b[1] - a[1]), b[0] - a[0]])
    out = []
    m = len(poly)
    for i in range(m):
        p, q = poly[i], poly[(i + 1) % m]
        dp = np.dot(p - a, n)
        dq = np.dot(q - a, n)
        if dp >= -1e-14:
            out.append(p)
            if dq < -1e-14:
                t = dp / (dp - dq)
                out.append(p + t * (q - p))
        elif dq >= -1e-14:
            t = dp / (dp - dq)
            out.append(p + t * (q - p))
    return out


def intersect_triangles(tri1, tri2):
    """Convex intersection polygon of two (ccw) triangles (may be [])."""
    poly = list(tri1)
    for i in range(3):
        poly = _clip_poly_halfplane(poly, tri2[i], tri2[(i + 1) % 3])
        if len(poly) < 3:
            return []
    return poly


def _ccw(tri):
    u, w = tri[1] - tri[0], tri[2] - tri[0]
    return tri if u[0] * w[1] - u[1] * w[0] > 0 else tri[[0, 2, 1]]


def assemble_mixed_mass_matrix(V_A, V_B):
    """M[i, j] = integral phi_i^A psi_j^B over the supermesh
    (reference: supermeshing.py:70).  Returns a Matrix mapping V_B
    coefficients to V_A duals."""
    from .assembly.sparsity import Sparsity
    from .assembly.matrix import Matrix
    from .elements.quadrature import make_quadrature
    import jax.numpy as jnp
    from scipy.spatial import cKDTree

    mesh_A, mesh_B = V_A.mesh_obj, V_B.mesh_obj
    for m in (mesh_A, mesh_B):
        if m.cell.name != "triangle":
            raise NotImplementedError("supermesh: 2D triangle meshes")
    if V_A.block_size != 1 or V_B.block_size != 1:
        raise NotImplementedError("supermesh: scalar spaces (vector via "
                                  "components)")
    deg = V_A.scalar_element.degree + V_B.scalar_element.degree
    quad = make_quadrature("triangle", max(deg, 1))

    xA = mesh_A._vertex_coords[mesh_A.topology.cell_vertices]
    xB = mesh_B._vertex_coords[mesh_B.topology.cell_vertices]
    cA = xA.mean(axis=1)
    cB = xB.mean(axis=1)
    rA = np.linalg.norm(xA - cA[:, None], axis=2).max(axis=1)
    rB = np.linalg.norm(xB - cB[:, None], axis=2).max(axis=1)
    tree = cKDTree(cB)
    pairs = tree.query_ball_point(cA, r=rA + rB.max())

    elA, elB = V_A.scalar_element, V_B.scalar_element
    mapA, mapB = V_A.cell_dof_map, V_B.cell_dof_map

    def inv_affine(tri, pts):
        A = np.stack([tri[1] - tri[0], tri[2] - tri[0]], axis=1)
        return np.linalg.solve(A, (pts - tri[0]).T).T

    rows, cols, vals = [], [], []
    ref = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    for a, cands in enumerate(pairs):
        triA = _ccw(xA[a])
        for b in cands:
            poly = intersect_triangles(triA, _ccw(xB[b]))
            if len(poly) < 3:
                continue
            p0 = poly[0]
            for k in range(1, len(poly) - 1):
                sub = np.stack([p0, poly[k], poly[k + 1]])
                J = np.stack([sub[1] - sub[0], sub[2] - sub[0]], axis=1)
                detJ = abs(np.linalg.det(J))
                if detJ < 1e-16:
                    continue
                phys = sub[0] + quad.points @ J.T
                ra = inv_affine(xA[a], phys)
                rb = inv_affine(xB[b], phys)
                tA = elA.tabulate(ra, 0)[0]       # (nq, ndA)
                tB = elB.tabulate(rb, 0)[0]       # (nq, ndB)
                w = quad.weights * detJ
                loc = np.einsum("q,qi,qj->ij", w, tA, tB)
                rows.append(np.broadcast_to(mapA[a][:, None],
                                            loc.shape).reshape(-1))
                cols.append(np.broadcast_to(mapB[b][None, :],
                                            loc.shape).reshape(-1))
                vals.append(loc.reshape(-1))
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = np.concatenate(vals)
    sp = Sparsity(V_A.dim, V_B.dim,
                  [(rows[:, None], cols[:, None])])
    data = jnp.zeros(sp.nnz).at[jnp.asarray(
        sp.block_positions[0])].add(jnp.asarray(vals))
    return Matrix(sp, data, V_A, V_B)


def supermesh_project(f_src, V_dst, solver_parameters=None):
    """Conservative (Galerkin) L2 projection across non-matching meshes:
    M_dd u = M_ds f  (reference: cross-mesh project via supermesh)."""
    from .function import Function
    from .assemble import assemble
    from .language import TestFunction, TrialFunction, inner, dx
    from .solvers.preconditioners import direct_solve
    import jax.numpy as jnp
    V_src = f_src.function_space()
    M_ds = assemble_mixed_mass_matrix(V_dst, V_src)
    u, v = TrialFunction(V_dst), TestFunction(V_dst)
    M_dd = assemble(inner(u, v) * dx)
    rhs = jnp.asarray(M_ds.to_scipy() @ np.asarray(f_src.dat))
    out = Function(V_dst)
    out.dat = np.asarray(direct_solve(M_dd, rhs))
    return out
