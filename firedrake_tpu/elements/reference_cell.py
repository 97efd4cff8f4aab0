"""Reference cells for the TPU-native FEM framework.

Plays the role of FIAT's reference elements (reference: Firedrake depends on
external FIAT/FInAT; see /root/reference/tsfc/fem.py geometric lowering).
All data here is small host-side numpy — computed once at setup and baked
into compiled kernels as constants.

Conventions (our own, self-consistent — NOT copied from FIAT):
  * interval:  vertices (0,), (1,)
  * triangle:  vertices (0,0), (1,0), (0,1); edge i is opposite vertex i
  * tetrahedron: vertices (0,0,0),(1,0,0),(0,1,0),(0,0,1); face i opposite
    vertex i
  * quadrilateral: vertices lexicographic (0,0),(1,0),(0,1),(1,1)
  * hexahedron: vertices lexicographic in (x fastest? no: index = x + 2y + 4z)
"""
from __future__ import annotations

import numpy as np
from dataclasses import dataclass, field
from functools import cached_property


@dataclass(frozen=True)
class ReferenceCell:
    name: str
    dim: int
    vertices: np.ndarray            # (nvert, dim)
    # connectivity: for each sub-entity dimension d, array (n_entities, nvert_per)
    # listing the cell-local vertex ids of each sub-entity of dimension d.
    topology: dict = field(hash=False, compare=False, default=None)
    facet_cell_name: str = None     # name of the cell each facet is

    @cached_property
    def num_vertices(self):
        return len(self.vertices)

    @cached_property
    def facets(self) -> np.ndarray:
        """Vertex lists of codim-1 sub-entities (local facet definitions)."""
        return self.topology[self.dim - 1]

    @cached_property
    def edges(self) -> np.ndarray:
        return self.topology[1]

    @cached_property
    def volume(self) -> float:
        if self.name in ("interval", "quadrilateral", "hexahedron"):
            return 1.0
        if self.name == "triangle":
            return 0.5
        if self.name == "tetrahedron":
            return 1.0 / 6.0
        if self.name == "prism":
            return 0.5
        raise NotImplementedError(self.name)

    @cached_property
    def facet_cell(self) -> "ReferenceCell":
        return by_name(self.facet_cell_name)

    @property
    def facet_types(self):
        """Per-local-facet facet-cell names.  Homogeneous cells repeat
        facet_cell_name; mixed cells (prism) carry facet_cell_names."""
        names = getattr(self, "facet_cell_names", None)
        if names is not None:
            return names
        return [self.facet_cell_name] * len(self.facets)

    def facet_vertices(self, lf: int):
        """Valid (un-padded) vertex ids of local facet lf."""
        return [int(v) for v in self.facets[lf] if v >= 0]

    @cached_property
    def facet_reference_normals(self) -> np.ndarray:
        """(nfacet, dim) outward unit normals of each facet in ref coords."""
        normals = []
        centroid = self.vertices.mean(axis=0)
        for fverts in self.facets:
            pts = self.vertices[list(fverts)]
            p0 = pts[0]
            if self.dim == 1:
                n = p0 - centroid
            elif self.dim == 2:
                t = pts[1] - pts[0]
                n = np.array([t[1], -t[0]])
            else:
                n = np.cross(pts[1] - pts[0], pts[2] - pts[0])
            n = n / np.linalg.norm(n)
            # orient outward
            if np.dot(n, p0 - centroid) < 0:
                n = -n
            normals.append(n)
        return np.array(normals)

    def facet_embedding(self, lf: int):
        """Affine map F(s) = A @ s + b from facet reference cell (dim-1)
        into this cell's reference coords; returns (A (dim, dim-1), b (dim,)).

        The facet reference vertices map to the cell-local vertices of the
        facet, in the order listed in ``self.facets[lf]``.
        """
        fverts = self.vertices[self.facet_vertices(lf)]  # (nfv, dim)
        fc = by_name(self.facet_types[lf])
        rv = fc.vertices                                 # (nfv, dim-1)
        b = fverts[0]
        if fc.dim == 0:
            return np.zeros((self.dim, 0)), b
        if fc.name in ("interval", "triangle"):
            # simplex facet: vertices rv are e.g. (0,),(1,) or unit triangle
            A = np.stack([fverts[i + 1] - fverts[0] for i in range(fc.dim)],
                         axis=1)
            return A, b
        if fc.name == "quadrilateral":
            # bilinear on our lexicographic quads is affine iff the embedded
            # facet is a parallelogram — true for the hex reference cell.
            A = np.stack([fverts[1] - fverts[0], fverts[2] - fverts[0]], axis=1)
            return A, b
        raise NotImplementedError(fc.name)

    def facet_area_scale(self, lf: int) -> float:
        """|facet| in ref coords / volume of the facet *reference* cell —
        i.e. the Jacobian factor of the facet embedding."""
        A, _ = self.facet_embedding(lf)
        if A.shape[1] == 0:
            return 1.0
        G = A.T @ A
        return float(np.sqrt(np.linalg.det(G)))

    def contains_points(self, pts: np.ndarray, tol: float = 1e-10) -> np.ndarray:
        """Boolean mask: which points lie inside the reference cell."""
        pts = np.asarray(pts)
        if self.name in ("interval", "quadrilateral", "hexahedron"):
            return np.all((pts >= -tol) & (pts <= 1 + tol), axis=-1)
        if self.name == "prism":
            horiz = (np.all(pts[..., :2] >= -tol, axis=-1)
                     & (pts[..., 0] + pts[..., 1] <= 1 + tol))
            vert = (pts[..., 2] >= -tol) & (pts[..., 2] <= 1 + tol)
            return horiz & vert
        return np.all(pts >= -tol, axis=-1) & (pts.sum(axis=-1) <= 1 + tol)


def _simplex_topology(nverts, dim):
    import itertools
    topo = {0: np.arange(nverts)[:, None]}
    if dim >= 1:
        if dim == 1:
            topo[1] = np.array([[0, 1]])
        elif dim == 2:
            # edge i opposite vertex i
            topo[1] = np.array([[1, 2], [0, 2], [0, 1]])
        else:
            topo[1] = np.array(list(itertools.combinations(range(4), 2)))
    if dim >= 2 and dim == 3:
        topo[2] = np.array([[1, 2, 3], [0, 2, 3], [0, 1, 3], [0, 1, 2]])
    topo[dim] = np.arange(nverts)[None, :]
    return topo


_interval = ReferenceCell(
    "interval", 1, np.array([[0.0], [1.0]]),
    topology=_simplex_topology(2, 1), facet_cell_name="point")
_triangle = ReferenceCell(
    "triangle", 2, np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]),
    topology=_simplex_topology(3, 2), facet_cell_name="interval")
_tet = ReferenceCell(
    "tetrahedron", 3,
    np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]),
    topology=_simplex_topology(4, 3), facet_cell_name="triangle")

_quad_topo = {
    0: np.arange(4)[:, None],
    1: np.array([[0, 1], [2, 3], [0, 2], [1, 3]]),
    2: np.arange(4)[None, :],
}
_quad = ReferenceCell(
    "quadrilateral", 2,
    np.array([[0.0, 0], [1, 0], [0, 1], [1, 1]]),
    topology=_quad_topo, facet_cell_name="interval")

_hex_verts = np.array([[x, y, z] for z in (0, 1) for y in (0, 1)
                       for x in (0, 1)], dtype=float)
# index = x + 2y + 4z
_hex_topo = {
    0: np.arange(8)[:, None],
    1: np.array([
        [0, 1], [2, 3], [4, 5], [6, 7],        # x-edges
        [0, 2], [1, 3], [4, 6], [5, 7],        # y-edges
        [0, 4], [1, 5], [2, 6], [3, 7],        # z-edges
    ]),
    # faces as quads with lexicographic internal order (v0,v1,v2,v3)
    2: np.array([
        [0, 2, 4, 6],   # x=0
        [1, 3, 5, 7],   # x=1
        [0, 1, 4, 5],   # y=0
        [2, 3, 6, 7],   # y=1
        [0, 1, 2, 3],   # z=0
        [4, 5, 6, 7],   # z=1
    ]),
    3: np.arange(8)[None, :],
}
_hex = ReferenceCell("hexahedron", 3, _hex_verts, topology=_hex_topo,
                     facet_cell_name="quadrilateral")

_point = ReferenceCell("point", 0, np.zeros((1, 0)),
                       topology={0: np.zeros((1, 1), dtype=int)},
                       facet_cell_name=None)

# prism (wedge) = triangle x interval; facets are MIXED (2 tris + 3 quads)
_prism_verts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0],
                         [0.0, 0, 1], [1, 0, 1], [0, 1, 1]])
_prism_topo = {
    0: np.arange(6)[:, None],
    1: np.array([
        [0, 1], [0, 2], [1, 2],        # bottom edges
        [3, 4], [3, 5], [4, 5],        # top edges
        [0, 3], [1, 4], [2, 5],        # vertical edges
    ]),
    # ragged: triangles padded with -1; quads in lexicographic order
    2: np.array([
        [0, 1, 2, -1],                  # bottom
        [3, 4, 5, -1],                  # top
        [0, 1, 3, 4],                   # quad y=0 side
        [0, 2, 3, 5],                   # quad x=0 side
        [1, 2, 4, 5],                   # diagonal quad side
    ]),
    3: np.arange(6)[None, :],
}
_prism = ReferenceCell("prism", 3, _prism_verts, topology=_prism_topo,
                       facet_cell_name=None)
# frozen dataclass: stash mixed facet types via object.__setattr__
object.__setattr__(_prism, "facet_cell_names",
                   ["triangle", "triangle", "quadrilateral",
                    "quadrilateral", "quadrilateral"])

_CELLS = {c.name: c for c in [_point, _interval, _triangle, _tet, _quad,
                              _hex, _prism]}
# common aliases
_CELLS["tet"] = _tet
_CELLS["quad"] = _quad
_CELLS["hex"] = _hex
_CELLS["vertex"] = _point


def by_name(name: str) -> ReferenceCell:
    return _CELLS[name]


def simplex(dim: int) -> ReferenceCell:
    return [_point, _interval, _triangle, _tet][dim]
