"""Utility mesh constructors (reference: firedrake/utility_meshes.py — ~35
constructors; we implement the core set with the same names and boundary-id
conventions: 1:x=0, 2:x=Lx, 3:y=0, 4:y=Ly, 5:z=0, 6:z=Lz)."""
from __future__ import annotations

import numpy as np

from .topology import MeshTopology, _IDX
from .geometry import Mesh

__all__ = [
    "IntervalMesh", "UnitIntervalMesh",
    "RectangleMesh", "SquareMesh", "UnitSquareMesh",
    "BoxMesh", "CubeMesh", "UnitCubeMesh",
    "UnitTriangleMesh", "UnitTetrahedronMesh",
    "PeriodicIntervalMesh", "PeriodicUnitIntervalMesh",
]


def _mark_box_facets(mesh: Mesh, lengths):
    """Assign Firedrake-style boundary ids by coordinate planes."""
    topo = mesh.topology
    fv = topo.facet_vertices                     # (nf, nvpf)
    coords = mesh._vertex_coords
    centroids = coords[fv].mean(axis=1)          # (nf, gdim)
    markers = np.zeros(len(fv), dtype=_IDX)
    tol = 1e-12
    ext = set(topo.exterior_facets.tolist())
    for ax, L in enumerate(lengths):
        lo = np.abs(centroids[:, ax]) < tol * max(1.0, L)
        hi = np.abs(centroids[:, ax] - L) < tol * max(1.0, L)
        # only mark where ALL facet vertices lie on the plane
        on_lo = np.all(np.abs(coords[fv][:, :, ax]) < 1e-10 * max(1.0, L),
                       axis=1)
        on_hi = np.all(np.abs(coords[fv][:, :, ax] - L) < 1e-10 * max(1.0, L),
                       axis=1)
        markers[on_lo] = 2 * ax + 1
        markers[on_hi] = 2 * ax + 2
    # clear markers on interior facets
    interior = topo.facet_cells[:, 1] >= 0
    markers[interior] = 0
    mesh.facet_markers = markers
    mesh._box_lengths = tuple(lengths)
    return mesh


def IntervalMesh(ncells: int, length_or_left=1.0, right=None, name="mesh"):
    if right is None:
        left, right_ = 0.0, float(length_or_left)
    else:
        left, right_ = float(length_or_left), float(right)
    x = np.linspace(left, right_, ncells + 1)[:, None]
    cells = np.stack([np.arange(ncells), np.arange(1, ncells + 1)], axis=1)
    topo = MeshTopology(cells, ncells + 1, "interval", name)
    mesh = Mesh(topo, x, name=name)
    markers = np.zeros(len(topo.facet_cells), dtype=_IDX)
    markers[0] = 1
    markers[ncells] = 2
    mesh.facet_markers = markers
    mesh._box_lengths = (right_,) if left == 0.0 else None
    return mesh


def UnitIntervalMesh(ncells: int, name="mesh"):
    return IntervalMesh(ncells, 1.0, name=name)


def PeriodicIntervalMesh(ncells: int, length=1.0, name="mesh"):
    """Circle topology embedded in 1D via DG coords is complex; represent as
    interval with identified endpoints (vertex 0 == vertex ncells)."""
    x = np.linspace(0.0, length, ncells + 1)[:-1, None]
    cells = np.stack([np.arange(ncells),
                      (np.arange(ncells) + 1) % ncells], axis=1)
    topo = MeshTopology(cells, ncells, "interval", name)
    m = Mesh(topo, x, name=name)
    m._periodic = ("x",)
    m._periodic_lengths = (length,)
    return m


def PeriodicUnitIntervalMesh(ncells: int, name="mesh"):
    return PeriodicIntervalMesh(ncells, 1.0, name=name)


def RectangleMesh(nx: int, ny: int, Lx=1.0, Ly=1.0, quadrilateral=False,
                  diagonal="left", name="mesh", originX=0.0, originY=0.0):
    xs = np.linspace(originX, originX + Lx, nx + 1)
    ys = np.linspace(originY, originY + Ly, ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="xy")     # row j = y_j
    verts = np.stack([X.ravel(), Y.ravel()], axis=1)

    def vid(i, j):
        return i + j * (nx + 1)

    I, J = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    v00 = vid(I, J).ravel()
    v10 = vid(I + 1, J).ravel()
    v01 = vid(I, J + 1).ravel()
    v11 = vid(I + 1, J + 1).ravel()

    if quadrilateral:
        cells = np.stack([v00, v10, v01, v11], axis=1)
        ct = "quadrilateral"
    else:
        if diagonal == "left":
            t1 = np.stack([v00, v10, v01], axis=1)
            t2 = np.stack([v10, v11, v01], axis=1)
        elif diagonal == "right":
            t1 = np.stack([v00, v10, v11], axis=1)
            t2 = np.stack([v00, v11, v01], axis=1)
        elif diagonal == "crossed":
            nverts = len(verts)
            centers = np.stack([(xs[:-1] + xs[1:]) / 2] * 1)
            CX, CY = np.meshgrid((xs[:-1] + xs[1:]) / 2,
                                 (ys[:-1] + ys[1:]) / 2, indexing="ij")
            cverts = np.stack([CX.ravel(), CY.ravel()], axis=1)
            cid = nverts + np.arange(len(cverts))
            verts = np.concatenate([verts, cverts])
            t1 = np.stack([v00, v10, cid], axis=1)
            t2 = np.stack([v10, v11, cid], axis=1)
            t3 = np.stack([v11, v01, cid], axis=1)
            t4 = np.stack([v01, v00, cid], axis=1)
            cells = np.concatenate([t1, t2, t3, t4])
            topo = MeshTopology(cells, len(verts), "triangle", name)
            return _mark_box_facets(Mesh(topo, verts, name=name), (Lx, Ly))
        else:
            raise ValueError(f"unknown diagonal {diagonal!r}")
        cells = np.concatenate([t1, t2])
        ct = "triangle"
    topo = MeshTopology(cells, len(verts), ct, name)
    return _mark_box_facets(Mesh(topo, verts, name=name), (Lx, Ly))


def SquareMesh(nx, ny, L, quadrilateral=False, name="mesh", **kw):
    return RectangleMesh(nx, ny, L, L, quadrilateral=quadrilateral,
                         name=name, **kw)


def UnitSquareMesh(nx, ny, quadrilateral=False, name="mesh", **kw):
    return RectangleMesh(nx, ny, 1.0, 1.0, quadrilateral=quadrilateral,
                         name=name, **kw)


_FREUDENTHAL = [p for p in
                [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0),
                 (2, 0, 1), (2, 1, 0)]]


def BoxMesh(nx, ny, nz, Lx=1.0, Ly=1.0, Lz=1.0, hexahedral=False,
            name="mesh"):
    xs = np.linspace(0, Lx, nx + 1)
    ys = np.linspace(0, Ly, ny + 1)
    zs = np.linspace(0, Lz, nz + 1)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    # vertex id = i + j*(nx+1) + k*(nx+1)*(ny+1)
    verts = np.stack([X.transpose(2, 1, 0).ravel(),
                      Y.transpose(2, 1, 0).ravel(),
                      Z.transpose(2, 1, 0).ravel()], axis=1)

    def vid(i, j, k):
        return i + j * (nx + 1) + k * (nx + 1) * (ny + 1)

    I, J, K = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                          indexing="ij")
    I, J, K = I.ravel(), J.ravel(), K.ravel()
    corner = {}
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                corner[(dx, dy, dz)] = vid(I + dx, J + dy, K + dz)

    if hexahedral:
        # lexicographic vertex order (x fastest) to match our hex ref cell
        cells = np.stack([corner[(x, y, z)] for z in (0, 1) for y in (0, 1)
                          for x in (0, 1)], axis=1)
        ct = "hexahedron"
    else:
        # Freudenthal 6-tet subdivision: tet for each permutation pi of axes,
        # path 000 -> +e_{pi0} -> +e_{pi1} -> +e_{pi2}
        tets = []
        for pi in _FREUDENTHAL:
            steps = [(0, 0, 0)]
            cur = [0, 0, 0]
            for ax in pi:
                cur = cur.copy()
                cur[ax] += 1
                steps.append(tuple(cur))
            tets.append(np.stack([corner[s] for s in steps], axis=1))
        cells = np.concatenate(tets)
        ct = "tetrahedron"
    topo = MeshTopology(cells, len(verts), ct, name)
    return _mark_box_facets(Mesh(topo, verts, name=name), (Lx, Ly, Lz))


def CubeMesh(nx, ny, nz, L, name="mesh", **kw):
    return BoxMesh(nx, ny, nz, L, L, L, name=name, **kw)


def UnitCubeMesh(nx, ny, nz, name="mesh", **kw):
    return BoxMesh(nx, ny, nz, 1.0, 1.0, 1.0, name=name, **kw)


def UnitTriangleMesh(name="mesh"):
    verts = np.array([[0.0, 0], [1, 0], [0, 1]])
    cells = np.array([[0, 1, 2]])
    topo = MeshTopology(cells, 3, "triangle", name)
    return _mark_box_facets(Mesh(topo, verts, name=name), (1.0, 1.0))


def UnitTetrahedronMesh(name="mesh"):
    verts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    cells = np.array([[0, 1, 2, 3]])
    topo = MeshTopology(cells, 4, "tetrahedron", name)
    return Mesh(topo, verts, name=name)
