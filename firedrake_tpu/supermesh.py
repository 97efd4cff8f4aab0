"""Supermesh: mixed mass matrices between non-matching meshes.

Reference: firedrake/supermeshing.py:70 assemble_mixed_mass_matrix
(backed by libsupermesh's C triangle/tet-intersection kernels + rtree);
used for conservative (Galerkin) projection between meshes.

Here the supermesh is built host-side in numpy: candidate cell pairs
from a KD-tree over centroids; Sutherland–Hodgman clipping of convex
polygons (triangles/quads, 2D) or convex-intersection vertex
enumeration + hull tetrahedralization (tets/planar-faced hexes, 3D);
and a quadrature loop that evaluates BOTH spaces' bases at the common
physical points (affine inversion on simplices, Newton inversion of
the multilinear map on quads/hexes).  Vector spaces (matching block
sizes) expand the scalar kernel over components — the mixed mass
matrix is the scalar one kron the identity.  Quad/hex support EXCEEDS
the reference envelope (libsupermesh is simplex-only).
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


def intersect_polys(polyA, polyB):
    """Convex intersection polygon of two ccw convex polygons."""
    poly = list(polyA)
    m = len(polyB)
    for i in range(m):
        poly = _clip_poly_halfplane(poly, polyB[i], polyB[(i + 1) % m])
        if len(poly) < 3:
            return []
    return poly


def intersect_triangles(tri1, tri2):
    """Convex intersection polygon of two (ccw) triangles (may be [])."""
    return intersect_polys(tri1, tri2)


def _signed_area(loop):
    x, y = np.asarray(loop).T
    return 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)


def _ccw(tri):
    u, w = tri[1] - tri[0], tri[2] - tri[0]
    return tri if u[0] * w[1] - u[1] * w[0] > 0 else tri[[0, 2, 1]]


def _cell_loop(verts, cell):
    """ccw boundary loop of a 2D cell's physical vertices (triangles
    as-is; lattice-ordered quads reordered to the boundary walk)."""
    if cell.name == "triangle":
        return _ccw(verts)
    loop = verts[[0, 1, 3, 2]]                 # lattice -> boundary walk
    if _signed_area(loop) < 0:
        loop = loop[::-1]
    return loop


# ------------------------------------------------------------------ 3D
def _tet_planes(tet):
    """Inward-pointing (n, d) halfspace data: n @ x + d >= 0 inside."""
    faces = ((1, 2, 3, 0), (0, 2, 3, 1), (0, 1, 3, 2), (0, 1, 2, 3))
    planes = []
    for i, j, k, opp in faces:
        n = np.cross(tet[j] - tet[i], tet[k] - tet[i])
        d = -np.dot(n, tet[i])
        if np.dot(n, tet[opp]) + d < 0:      # orient inward
            n, d = -n, -d
        s = np.linalg.norm(n)
        planes.append((n / s, d / s))
    return planes


def _inside(planes, p, tol):
    return all(np.dot(n, p) + d >= -tol for n, d in planes)


def _cell_planes(verts, cell, tol=1e-10):
    """Inward halfspace data of a convex 3D cell from its reference
    topology faces.  Raises on non-planar (warped) hex faces — the
    polyhedron clipping below needs true planes."""
    if cell.name == "tetrahedron":
        return _tet_planes(verts)
    centroid = verts.mean(axis=0)
    planes = []
    for fv in cell.topology[2]:
        ids = [int(v) for v in fv if v >= 0]
        p = verts[ids]
        n = np.cross(p[1] - p[0], p[2] - p[0])
        s = np.linalg.norm(n)
        n = n / s
        d = -np.dot(n, p[0])
        if any(abs(np.dot(n, q) + d) > tol * max(s, 1.0) for q in p[3:]):
            raise NotImplementedError(
                "supermesh: non-planar hexahedron faces")
        if np.dot(n, centroid) + d < 0:
            n, d = -n, -d
        planes.append((n, d))
    return planes


def intersect_cells_3d(vertsA, vertsB, cellA, cellB, tol=1e-12):
    """Vertices of the convex intersection of two convex 3D cells:
    vertices of A in B, vertices of B in A, and every edge-face
    crossing, deduplicated (generalizes intersect_tets to hexes)."""
    pA = _cell_planes(vertsA, cellA)
    pB = _cell_planes(vertsB, cellB)
    pts = [v for v in vertsA if _inside(pB, v, tol)]
    pts += [v for v in vertsB if _inside(pA, v, tol)]
    for verts, edges, planes in ((vertsA, cellA.topology[1], pB),
                                 (vertsB, cellB.topology[1], pA)):
        for i, j in edges:
            a, b = verts[int(i)], verts[int(j)]
            u = b - a
            for n, d in planes:
                den = np.dot(n, u)
                if abs(den) < 1e-15:
                    continue
                t = -(np.dot(n, a) + d) / den
                if tol < t < 1 - tol:
                    p = a + t * u
                    if _inside(pA, p, tol) and _inside(pB, p, tol):
                        pts.append(p)
    if len(pts) < 4:
        return []
    pts = np.asarray(pts)
    keep = []
    for p in pts:                  # dedup (tiny point sets)
        if not any(np.linalg.norm(p - q) < 1e-12 for q in keep):
            keep.append(p)
    return keep


def intersect_tets(tetA, tetB, tol=1e-12):
    """Vertices of the convex intersection of two tets (may be [])::
    vertices of A in B, vertices of B in A, and every edge-face
    crossing, deduplicated."""
    pA, pB = _tet_planes(tetA), _tet_planes(tetB)
    pts = [v for v in tetA if _inside(pB, v, tol)]
    pts += [v for v in tetB if _inside(pA, v, tol)]
    edges = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
    for verts, planes, other in ((tetA, pB, pA), (tetB, pA, pB)):
        for i, j in edges:
            a, b = verts[i], verts[j]
            u = b - a
            for n, d in planes:
                den = np.dot(n, u)
                if abs(den) < 1e-15:
                    continue
                t = -(np.dot(n, a) + d) / den
                if tol < t < 1 - tol:
                    p = a + t * u
                    if _inside(pA, p, tol) and _inside(pB, p, tol):
                        pts.append(p)
    if len(pts) < 4:
        return []
    pts = np.asarray(pts)
    keep = []
    for p in pts:                  # dedup (tiny point sets)
        if not any(np.linalg.norm(p - q) < 1e-12 for q in keep):
            keep.append(p)
    return keep


def _hull_tets(pts):
    """Tetrahedralize the convex hull of `pts` by fanning hull triangles
    from the centroid; yields (4, 3) vertex arrays."""
    from scipy.spatial import QhullError, ConvexHull
    pts = np.asarray(pts)
    try:
        hull = ConvexHull(pts, qhull_options="QJ")
    except QhullError:
        return
    c = pts[hull.vertices].mean(axis=0)
    for simplex in hull.simplices:
        yield np.vstack([pts[simplex], c])


def assemble_mixed_mass_matrix(V_A, V_B):
    """M[i, j] = integral phi_i^A psi_j^B over the supermesh
    (reference: supermeshing.py:70).  Returns a Matrix mapping V_B
    coefficients to V_A duals.  Scalar and vector Lagrange-type spaces
    on triangle (2D) or tetrahedron (3D) meshes."""
    from .assembly.sparsity import Sparsity
    from .assembly.matrix import Matrix
    from .elements.quadrature import make_quadrature
    import jax.numpy as jnp
    from scipy.spatial import cKDTree

    mesh_A, mesh_B = V_A.mesh_obj, V_B.mesh_obj
    cell = mesh_A.cell.name
    if cell != mesh_B.cell.name or cell not in (
            "triangle", "tetrahedron", "quadrilateral", "hexahedron"):
        raise NotImplementedError(
            "supermesh: both meshes must share a tri/quad/tet/hex cell")
    rcell = mesh_A.cell
    simplexcell = cell in ("triangle", "tetrahedron")
    bs = V_A.block_size
    if V_B.block_size != bs:
        raise NotImplementedError("supermesh: matching block sizes")
    for V in (V_A, V_B):
        if getattr(V.scalar_element, "mapping", "identity") != "identity":
            raise NotImplementedError("supermesh: nodal (identity-"
                                      "mapped) spaces")
    tdim = rcell.dim
    deg = V_A.scalar_element.degree + V_B.scalar_element.degree
    if not simplexcell:
        deg += tdim      # multilinear pullbacks raise the piece degree
    quad = make_quadrature("triangle" if tdim == 2 else "tetrahedron",
                           max(deg, 1))

    xA = mesh_A._vertex_coords[mesh_A.topology.cell_vertices]
    xB = mesh_B._vertex_coords[mesh_B.topology.cell_vertices]
    cA = xA.mean(axis=1)
    cB = xB.mean(axis=1)
    rA = np.linalg.norm(xA - cA[:, None], axis=2).max(axis=1)
    rB = np.linalg.norm(xB - cB[:, None], axis=2).max(axis=1)
    tree = cKDTree(cB)
    pairs = tree.query_ball_point(cA, r=rA + rB.max())

    elA, elB = V_A.scalar_element, V_B.scalar_element
    mapA, mapB = V_A.cell_node_map, V_B.cell_node_map

    refv = np.asarray(rcell.vertices, dtype=float)

    def inv_affine(cellx, pts):
        A = np.stack([cellx[k + 1] - cellx[0] for k in range(tdim)],
                     axis=1)
        return np.linalg.solve(A, (pts - cellx[0]).T).T

    def inv_multilinear(cellx, pts, iters=30):
        """Newton inversion of the bi/trilinear vertex map (lattice
        reference vertices refv in {0,1}^d)."""
        xi = np.full((len(pts), tdim), 0.5)
        for _ in range(iters):
            w = np.ones((len(pts), len(refv)))
            dw = np.ones((len(pts), len(refv), tdim))
            for ax in range(tdim):
                f = np.where(refv[None, :, ax] > 0.5, xi[:, ax:ax + 1],
                             1.0 - xi[:, ax:ax + 1])
                df = np.where(refv[None, :, ax] > 0.5, 1.0, -1.0)
                w = w * f
                for bx in range(tdim):
                    dw[:, :, bx] *= df if bx == ax else f
            F = w @ cellx - pts                        # (np, d)
            J = np.einsum("pvd,ve->pde", dw, cellx)    # (np, d, d)
            xi = xi - np.linalg.solve(J, F[..., None])[..., 0]
        return xi

    inv_map = inv_affine if simplexcell else inv_multilinear

    def _pieces_2d(a, b):
        poly = intersect_polys(_cell_loop(xA[a], rcell),
                               _cell_loop(xB[b], rcell))
        p0 = poly[0] if len(poly) >= 3 else None
        for k in range(1, len(poly) - 1):
            yield np.stack([p0, poly[k], poly[k + 1]])

    def _pieces_3d(a, b):
        if simplexcell:
            pts = intersect_tets(xA[a], xB[b])
        else:
            pts = intersect_cells_3d(xA[a], xB[b], rcell, rcell)
        if len(pts) >= 4:
            yield from _hull_tets(pts)

    pieces = _pieces_2d if tdim == 2 else _pieces_3d
    rows, cols, vals = [], [], []
    for a, cands in enumerate(pairs):
        for b in cands:
            for sub in pieces(a, b):
                J = np.stack([sub[k + 1] - sub[0] for k in range(tdim)],
                             axis=1)
                detJ = abs(np.linalg.det(J))
                if detJ < 1e-16:
                    continue
                phys = sub[0] + quad.points @ J.T
                ra = inv_map(xA[a], phys)
                rb = inv_map(xB[b], phys)
                tA = elA.tabulate(ra, 0)[0]       # (nq, ndA)
                tB = elB.tabulate(rb, 0)[0]       # (nq, ndB)
                w = quad.weights * detJ
                loc = np.einsum("q,qi,qj->ij", w, tA, tB)
                rows.append(np.broadcast_to(mapA[a][:, None],
                                            loc.shape).reshape(-1))
                cols.append(np.broadcast_to(mapB[b][None, :],
                                            loc.shape).reshape(-1))
                vals.append(loc.reshape(-1))
    rows = np.concatenate(rows).astype(np.int64)
    cols = np.concatenate(cols).astype(np.int64)
    vals = np.concatenate(vals)
    if bs > 1:                 # kron with I_bs over components
        comp = np.arange(bs)
        rows = (rows[:, None] * bs + comp).reshape(-1)
        cols = (cols[:, None] * bs + comp).reshape(-1)
        vals = np.repeat(vals, bs)
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
