"""Adaptive mesh refinement: conforming newest-vertex bisection (NVB).

Reference: firedrake's adaptivity goes through netgen/ngsPETSc
(`mesh.refine_marked_elements(indicator)`); the algorithm here is the
classical Mitchell/Sewell NVB with recursive compatibility closure — no
hanging nodes, shape-regular descendants (at most 4 similarity classes
per initial triangle).

Host-side numpy (mesh surgery is irregular by nature); the refined mesh
re-enters the standard static-shape compiled pipeline.  Triangles only
(tet bisection: round 2).

Convention: element stored as (p, a, b) — p is the NEWEST vertex, (a, b)
is the refinement edge.  Bisection at midpoint m of (a, b) yields
children (m, p, a) and (m, b, p), whose refinement edges are the old
edges pa / bp (Mitchell's ordering).
"""
from __future__ import annotations

import numpy as np


def _initial_nvb_order(cells, coords):
    """Rotate each triangle so the refinement edge (last two vertices) is
    its LONGEST edge — the standard compatible initial condition."""
    out = np.empty_like(cells)
    for i, c in enumerate(cells):
        pts = coords[c]
        # edge j is opposite vertex j
        lens = [np.linalg.norm(pts[(j + 1) % 3] - pts[(j + 2) % 3])
                for j in range(3)]
        j = int(np.argmax(lens))
        out[i] = [c[j], c[(j + 1) % 3], c[(j + 2) % 3]]
    return out


def refine_marked(mesh, markers):
    """Bisect the marked cells (+ closure); returns a NEW conforming Mesh.

    markers: boolean/0-1 array over cells, or a DG0 Function (nonzero =
    refine).  Reference API: netgen's refine_marked_elements."""
    from .mesh.topology import MeshTopology
    from .mesh.geometry import Mesh
    from .function import Function
    if isinstance(markers, Function):
        markers = np.asarray(markers.dat) != 0
    markers = np.asarray(markers).astype(bool)
    topo = mesh.topology
    if topo.cell.name != "triangle":
        raise NotImplementedError("NVB refinement: triangles only")
    coords = [np.asarray(p) for p in mesh._vertex_coords]
    cells = _initial_nvb_order(np.asarray(topo.cell_vertices),
                               mesh._vertex_coords)
    tris = {i: tuple(int(v) for v in c) for i, c in enumerate(cells)}
    parent = {i: i for i in tris}
    next_id = len(cells)
    # refinement-edge incidence: sorted edge -> set of live tri ids
    edge2tris = {}

    def _reg(i):
        p, a, b = tris[i]
        edge2tris.setdefault((min(a, b), max(a, b)), set()).add(i)

    for i in tris:
        _reg(i)

    midpoint = {}

    def _mid(a, b):
        key = (min(a, b), max(a, b))
        if key not in midpoint:
            midpoint[key] = len(coords)
            coords.append((coords[a] + coords[b]) / 2)
        return midpoint[key]

    def _bisect(i):
        """Bisect tri i (its ref-edge neighbour is already compatible)."""
        nonlocal next_id
        p, a, b = tris.pop(i)
        key = (min(a, b), max(a, b))
        edge2tris[key].discard(i)
        m = _mid(a, b)
        for child in ((m, p, a), (m, b, p)):
            cid = next_id
            next_id += 1
            tris[cid] = child
            parent[cid] = parent[i]
            _reg(cid)

    def _divide(i):
        """Refine tri i, recursively forcing ref-edge compatibility."""
        if i not in tris:
            return
        p, a, b = tris[i]
        key = (min(a, b), max(a, b))
        for _ in range(64):          # closure is finite for NVB
            others = [j for j in edge2tris.get(key, ()) if j != i]
            if not others:
                break
            j = others[0]
            pj, aj, bj = tris[j]
            if (min(aj, bj), max(aj, bj)) == key:
                break                # compatible: shared ref edge
            _divide(j)               # force j first
        if i not in tris:            # consumed by a compatibility chain
            return
        _bisect(i)
        for j in [j for j in edge2tris.get(key, ()) if j in tris]:
            pj, aj, bj = tris[j]
            if (min(aj, bj), max(aj, bj)) == key:
                _bisect(j)

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000 + len(cells)))
    try:
        for i in np.where(markers)[0]:
            _divide(int(i))
        # conformity closure: any edge with a midpoint must not remain an
        # unrefined edge of a live triangle
        changed = True
        while changed:
            changed = False
            for i in list(tris):
                if i not in tris:
                    continue
                p, a, b = tris[i]
                for e in ((p, a), (p, b), (a, b)):
                    if (min(e), max(e)) in midpoint:
                        _divide(i)
                        changed = True
                        break
    finally:
        sys.setrecursionlimit(old)

    new_cells = np.array([tris[i] for i in sorted(tris)], dtype=np.int32)
    new_parent = np.array([parent[i] for i in sorted(tris)])
    new_coords = np.asarray(coords)
    nt = MeshTopology(new_cells, len(new_coords), "triangle",
                      mesh.name + "_refined")
    out = Mesh(nt, new_coords, name=mesh.name + "_refined")
    out.parent_cells = new_parent          # provenance for marker/state
    # inherit cell region markers
    if getattr(mesh, "cell_markers", None) is not None:
        out.cell_markers = np.asarray(mesh.cell_markers)[new_parent]
    return out


def adapt(mesh, indicator, refine_fraction=0.3):
    """Doerfler-style marking + NVB refinement: refine the smallest cell
    set carrying `refine_fraction` of the total indicated error.

    indicator: per-cell error estimates (array or DG0 Function)."""
    from .function import Function
    if isinstance(indicator, Function):
        indicator = np.asarray(indicator.dat)
    eta = np.asarray(indicator, dtype=float)
    order = np.argsort(eta)[::-1]
    csum = np.cumsum(eta[order])
    nmark = int(np.searchsorted(csum,
                                refine_fraction * csum[-1])) + 1
    markers = np.zeros(len(eta), dtype=bool)
    markers[order[:nmark]] = True
    return refine_marked(mesh, markers)
