"""Adaptive mesh refinement: conforming newest-vertex bisection (NVB).

Reference: firedrake's adaptivity goes through netgen/ngsPETSc
(`mesh.refine_marked_elements(indicator)`); the algorithm here is the
classical Mitchell/Sewell NVB with recursive compatibility closure — no
hanging nodes, shape-regular descendants (at most 4 similarity classes
per initial triangle).

Host-side numpy (mesh surgery is irregular by nature); the refined mesh
re-enters the standard static-shape compiled pipeline.  Triangles use
Mitchell/Sewell NVB; tetrahedra use Rivara-style marked-edge longest-
edge bisection: mark each refined tet's longest edge, close the marking
(any tet with a marked edge marks its own longest edge — edge lengths
strictly increase along the propagation, so this terminates), then
bisect every tet through ALL of its marked edges, always splitting the
globally-longest marked edge first.  Faces shared by two tets see the
same sub-edge bisection sequence (same marked edges, same global
order), so the refined mesh is conforming with no hanging nodes.

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


_TET_EDGES = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _refine_marked_tets(mesh, markers):
    """Marked-edge longest-edge bisection for tetrahedra (see module
    docstring).  Returns a NEW conforming Mesh."""
    from .mesh.topology import MeshTopology
    from .mesh.geometry import Mesh
    coords = [np.asarray(p) for p in mesh._vertex_coords]
    cells = np.asarray(mesh.topology.cell_vertices)

    def _key(a, b):
        return (a, b) if a < b else (b, a)

    def _elen(k):
        return float(np.linalg.norm(coords[k[0]] - coords[k[1]]))

    def _longest(verts):
        """Longest edge of a tet, ties broken by the vertex-id key so
        every tet sharing the edge agrees."""
        ks = [_key(verts[i], verts[j]) for i, j in _TET_EDGES]
        return max(ks, key=lambda k: (_elen(k), k))

    # marking closure: a tet with any marked edge marks its longest
    marked = {_longest(c) for c in cells[markers]}
    changed = True
    while changed:
        changed = False
        for c in cells:
            ks = [_key(c[i], c[j]) for i, j in _TET_EDGES]
            if any(k in marked for k in ks):
                lk = _longest(c)
                if lk not in marked:
                    marked.add(lk)
                    changed = True

    midpoint = {}

    def _mid(k):
        if k not in midpoint:
            midpoint[k] = len(coords)
            coords.append((coords[k[0]] + coords[k[1]]) / 2)
        return midpoint[k]

    out_cells, out_parent = [], []
    work = [(tuple(int(v) for v in c), i) for i, c in enumerate(cells)]
    while work:
        verts, par = work.pop()
        mk = [_key(verts[i], verts[j]) for i, j in _TET_EDGES]
        mk = [k for k in mk if k in marked]
        if not mk:
            out_cells.append(verts)
            out_parent.append(par)
            continue
        a, b = max(mk, key=lambda k: (_elen(k), k))
        m = _mid((a, b))
        work.append((tuple(m if v == a else v for v in verts), par))
        work.append((tuple(m if v == b else v for v in verts), par))

    new_cells = np.asarray(out_cells, dtype=np.int32)
    nt = MeshTopology(new_cells, len(coords), "tetrahedron",
                      mesh.name + "_refined")
    out = Mesh(nt, np.asarray(coords), name=mesh.name + "_refined")
    out.parent_cells = np.asarray(out_parent)
    if getattr(mesh, "cell_markers", None) is not None:
        out.cell_markers = np.asarray(mesh.cell_markers)[out.parent_cells]
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
    if topo.cell.name == "tetrahedron":
        return _refine_marked_tets(mesh, markers)
    if topo.cell.name != "triangle":
        raise NotImplementedError("NVB refinement: triangles and "
                                  "tetrahedra only")
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
