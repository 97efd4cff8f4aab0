"""Point evaluation: u.at(points).

Reference: firedrake/function.py:569 Function.at / PointEvaluator :711;
point location = libspatialindex R-tree over cell bboxes + per-cell Newton
inversion in generated C (firedrake/locate.c, pointquery_utils.py:38).
Here: scipy cKDTree over cell centroids (candidate search by radius) +
vectorized affine inversion (Newton for non-affine cells), numpy host-side;
a device-resident path is planned with the VertexOnlyMesh milestone."""
from __future__ import annotations

import numpy as np


class PointNotInDomainError(Exception):
    pass


def _locate(mesh, pts, tol=1e-10):
    """(cells, refcoords) for each query point."""
    from scipy.spatial import cKDTree
    coords = mesh._vertex_coords
    cv = mesh.topology.cell_vertices
    cellpts = coords[cv]                        # (nc, nv, g)
    centroids = cellpts.mean(axis=1)
    radius = np.max(np.linalg.norm(cellpts - centroids[:, None, :],
                                   axis=2), axis=1)
    rmax = radius.max()
    tree = cKDTree(centroids)
    cells_out = np.full(len(pts), -1, dtype=np.int64)
    ref_out = np.zeros((len(pts), mesh.topological_dimension))
    cand_lists = tree.query_ball_point(pts, r=rmax * 1.5)
    cell = mesh.cell
    for i, (p, cands) in enumerate(zip(pts, cand_lists)):
        # order candidates by distance for early exit
        cands = sorted(cands,
                       key=lambda c: np.sum((centroids[c] - p) ** 2))
        for c in cands:
            ref = _invert(mesh, c, p)
            if ref is not None and cell.contains_points(
                    ref[None], tol=tol)[0]:
                cells_out[i] = c
                ref_out[i] = ref
                break
    return cells_out, ref_out


def _invert(mesh, c, p, newton_its=20):
    """Reference coordinates of physical point p in cell c."""
    cell = mesh.cell
    coords = mesh._vertex_coords[mesh.topology.cell_vertices[c]]
    d = cell.dim
    g = mesh.geometric_dimension
    if g != d:
        # manifold (immersed) cells: least-squares inversion onto the
        # cell's tangent plane; reject if the point is too far off-plane
        if cell.name not in ("interval", "triangle"):
            return None
        A = np.stack([coords[i + 1] - coords[0] for i in range(d)],
                     axis=1)                       # (g, d)
        rhs = p - coords[0]
        ref, *_ = np.linalg.lstsq(A, rhs, rcond=None)
        resid = np.linalg.norm(A @ ref - rhs)
        size = np.linalg.norm(A, axis=0).max()
        if resid > 0.2 * size:
            return None
        return ref
    cd = getattr(mesh, "_coord_degree", 1)
    if cell.name in ("interval", "triangle", "tetrahedron"):
        A = np.stack([coords[i + 1] - coords[0] for i in range(d)], axis=1)
        try:
            x = np.linalg.solve(A, p - coords[0])
        except np.linalg.LinAlgError:
            return None
        if cd == 1:
            return x
        return _newton_invert(mesh, c, p, x, newton_its)
    # Newton for bi/tri-linear (and curved) cells
    x = cell.vertices.mean(axis=0).copy()
    if cd > 1:
        return _newton_invert(mesh, c, p, x, newton_its)
    from .elements import make_scalar_element
    e = make_scalar_element(cell.name, "Lagrange", 1)
    for _ in range(newton_its):
        t = e.tabulate(x[None], 1)
        X = t[0][0] @ coords
        J = np.einsum("jt,jg->gt", t[1][0], coords)
        try:
            dx = np.linalg.solve(J, p - X)
        except np.linalg.LinAlgError:
            return None
        x = x + dx
        if np.linalg.norm(dx) < 1e-13:
            break
    return x


def _newton_invert(mesh, c, p, x0, newton_its=25):
    """Newton inversion of the (curved) coordinate map of cell c,
    starting from the affine estimate (reference: the generated
    to_reference_coords Newton loop, firedrake/pointquery_utils.py:38)."""
    from .elements import make_scalar_element
    cell = mesh.cell
    e = make_scalar_element(cell.name,
                            getattr(mesh, "_coord_family", "Lagrange"),
                            getattr(mesh, "_coord_degree", 1))
    Vc = mesh.coordinate_space
    g = mesh.geometric_dimension
    nodes = np.asarray(mesh.coordinates.dat).reshape(-1, g)
    coords = nodes[np.asarray(Vc.sdata.cell_node_map[c])]  # (ndofc, g)
    x = np.asarray(x0, dtype=float).copy()
    for _ in range(newton_its):
        t = e.tabulate(x[None], 1)
        X = t[0][0] @ coords
        J = np.einsum("jt,jg->gt", t[1][0], coords)
        try:
            dx = np.linalg.solve(J, p - X)
        except np.linalg.LinAlgError:
            return None
        x = x + dx
        if np.linalg.norm(dx) < 1e-13:
            break
    return x


def at(function, points, tolerance=1e-10, dont_raise=False):
    """Evaluate a Function at physical points (array (n, gdim) or single
    point)."""
    V = function.function_space()
    mesh = V.mesh_obj
    pts = np.asarray(points, dtype=float)
    single = pts.ndim == 1
    pts = np.atleast_2d(pts)
    cells, refs = _locate(mesh, pts, tol=tolerance)
    missing = cells < 0
    if missing.any() and not dont_raise:
        raise PointNotInDomainError(
            f"points not found in domain: {pts[missing]}")
    out = eval_at_cells(function, cells, refs)
    return out[0] if single else out


def eval_at_cells(function, cells, refs):
    """Evaluate a Function at pre-located points: (cell, refcoord) pairs.
    cells < 0 yield NaN.  The VertexOnlyMesh interpolation fast path."""
    V = function.function_space()
    mesh = V.mesh_obj
    elem = V.element
    dat = np.asarray(function.dat)
    vs = V.value_shape
    out = np.zeros((len(cells),) + tuple(vs)) if vs \
        else np.zeros(len(cells))
    cmap = V.cell_dof_map
    for i, (c, r) in enumerate(zip(cells, refs)):
        if c < 0:
            out[i] = np.nan
            continue
        tab = elem.tabulate(r[None], 0)[0][0]     # scalar basis (nscalar,)
        w = dat[cmap[c]]
        if getattr(V, "has_dof_signs", False):
            w = w * V.cell_dof_signs[c]
        elif getattr(V, "has_dof_transforms", False):
            w = V.cell_dof_transforms[c] @ w    # local = B @ canonical
        mapping = getattr(elem, "mapping", "identity")
        if mapping == "identity":
            bs = V.block_size
            if bs > 1:
                # interleaved components: val[c] = sum_j tab[j] w[j*bs+c]
                val = tab @ w.reshape(-1, bs)
                val = val.reshape(vs)
            elif vs:
                val = np.einsum("j,j...->...", w, tab)
            else:
                val = w @ tab
        else:
            # Piola: tab (nslot, d) reference values
            coords = mesh._vertex_coords[mesh.topology.cell_vertices[c]]
            d = mesh.cell.dim
            A = np.stack([coords[k + 1] - coords[0] for k in range(d)],
                         axis=1)
            detA = np.linalg.det(A)
            ref_val = w @ tab                      # (d,)
            if mapping == "contravariant":
                val = A @ ref_val / detA
            else:
                val = np.linalg.inv(A).T @ ref_val
        out[i] = val
    return out
