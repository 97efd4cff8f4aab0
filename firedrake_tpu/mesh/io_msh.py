"""Gmsh .msh reader (ASCII v2.2 and v4.1).

Reference: firedrake/mesh.py:363-461 reads gmsh/exodus/cgns through
DMPlex; here a small numpy parser builds the plex-lite directly.  Physical
tags become facet markers (codim-1 elements) and cell markers (dim
elements) — the same surface `Mesh("file.msh")` + `ds(tag)`/`dx(tag)`.
"""
from __future__ import annotations

import numpy as np

from .topology import MeshTopology, _IDX
from .geometry import Mesh

# gmsh element type -> (cell name, nverts, dim)
_GMSH_TYPES = {
    1: ("interval", 2, 1),
    2: ("triangle", 3, 2),
    3: ("quadrilateral", 4, 2),
    4: ("tetrahedron", 4, 3),
    5: ("hexahedron", 8, 3),
    15: ("point", 1, 0),
}
# gmsh node orders differ from ours for quads/hexes (gmsh uses CCW cycles,
# we use lexicographic)
_REORDER_FROM_GMSH = {
    "quadrilateral": [0, 1, 3, 2],
    "hexahedron": [0, 1, 3, 2, 4, 5, 7, 6],
}


def read_msh(filename: str, name=None) -> Mesh:
    with open(filename) as fh:
        text = fh.read()
    if "$MeshFormat" not in text:
        raise ValueError("not a gmsh file")
    version = float(text.split("$MeshFormat")[1].split()[0])
    if version >= 4.0:
        nodes, elements = _parse_v4(text)
    else:
        nodes, elements = _parse_v2(text)
    return _build(nodes, elements, name or filename)


def _parse_v2(text):
    node_sec = text.split("$Nodes")[1].split("$EndNodes")[0].split()
    nn = int(node_sec[0])
    raw = np.array(node_sec[1:1 + 4 * nn], dtype=float).reshape(nn, 4)
    ids = raw[:, 0].astype(np.int64)
    coords = raw[:, 1:4]
    elem_sec = text.split("$Elements")[1].split("$EndElements")[0]
    lines = elem_sec.strip().splitlines()
    ne = int(lines[0])
    elements = []       # (etype, phys_tag, [node ids])
    for ln in lines[1:1 + ne]:
        parts = [int(x) for x in ln.split()]
        etype = parts[1]
        ntags = parts[2]
        phys = parts[3] if ntags >= 1 else 0
        verts = parts[3 + ntags:]
        elements.append((etype, phys, verts))
    return (ids, coords), elements


def _parse_v4(text):
    # $Nodes: numEntityBlocks numNodes minTag maxTag; blocks of
    # (entityDim entityTag parametric numNodesInBlock) + tags + coords
    ns = text.split("$Nodes")[1].split("$EndNodes")[0].split()
    p = 0
    nblocks = int(ns[p]); p += 1
    nn = int(ns[p]); p += 3
    all_ids, all_xyz = [], []
    for _ in range(nblocks):
        p += 3
        nb = int(ns[p]); p += 1
        tags = [int(ns[p + i]) for i in range(nb)]
        p += nb
        for i in range(nb):
            all_ids.append(tags[i])
            all_xyz.append([float(ns[p]), float(ns[p + 1]),
                            float(ns[p + 2])])
            p += 3
    ids = np.array(all_ids, dtype=np.int64)
    coords = np.array(all_xyz)
    # $Entities give physical tags per (dim, entityTag)
    phys_of_entity = {}
    if "$Entities" in text:
        es = text.split("$Entities")[1].split("$EndEntities")[0].split()
        q = 0
        counts = [int(es[q + i]) for i in range(4)]
        q += 4
        # points: tag x y z numPhys [phys...]
        for _ in range(counts[0]):
            tag = int(es[q]); q += 4
            nph = int(es[q]); q += 1
            ph = int(es[q]) if nph else 0
            q += nph
            phys_of_entity[(0, tag)] = ph
        for d, cnt in ((1, counts[1]), (2, counts[2]), (3, counts[3])):
            for _ in range(cnt):
                tag = int(es[q]); q += 7
                nph = int(es[q]); q += 1
                ph = int(es[q]) if nph else 0
                q += nph
                nb = int(es[q]); q += 1 + nb
                phys_of_entity[(d, tag)] = ph
    els = text.split("$Elements")[1].split("$EndElements")[0].split()
    p = 0
    nblocks = int(els[p]); p += 4
    elements = []
    for _ in range(nblocks):
        edim = int(els[p]); etag = int(els[p + 1])
        etype = int(els[p + 2]); nb = int(els[p + 3])
        p += 4
        phys = phys_of_entity.get((edim, etag), etag)
        if etype not in _GMSH_TYPES:
            # skip unsupported (higher-order etc.)
            nv_skip = {8: 3, 9: 6, 10: 9, 11: 10, 16: 8, 17: 20}.get(etype)
            if nv_skip is None:
                raise NotImplementedError(f"gmsh element type {etype}")
            p += nb * (1 + nv_skip)
            continue
        nv = _GMSH_TYPES[etype][1]
        for _ in range(nb):
            verts = [int(els[p + 1 + i]) for i in range(nv)]
            elements.append((etype, phys, verts))
            p += 1 + nv
    return (ids, coords), elements


def _build(nodes, elements, name):
    ids, coords = nodes
    id2idx = {int(i): k for k, i in enumerate(ids)}
    # dimension = max element dim present
    dims = [_GMSH_TYPES[e][2] for e, _, _ in elements if e in _GMSH_TYPES]
    dim = max(dims)
    cell_name = None
    cells, cell_tags = [], []
    facet_elems = []    # (sorted vertex tuple, phys)
    for etype, phys, verts in elements:
        if etype not in _GMSH_TYPES:
            continue
        cname, nv, edim = _GMSH_TYPES[etype]
        vv = [id2idx[v] for v in verts]
        if edim == dim:
            if cell_name is None:
                cell_name = cname
            elif cell_name != cname:
                raise NotImplementedError("mixed-cell gmsh meshes")
            if cname in _REORDER_FROM_GMSH:
                vv = [vv[i] for i in _REORDER_FROM_GMSH[cname]]
            cells.append(vv)
            cell_tags.append(phys)
        elif edim == dim - 1:
            facet_elems.append((tuple(sorted(vv)), phys))
    cells = np.array(cells, dtype=_IDX)
    # drop geometric z column for 2D meshes embedded at z=0
    gdim = 3
    if dim <= 2 and np.allclose(coords[:, 2], 0.0):
        gdim = 2
    if dim == 1 and np.allclose(coords[:, 1], 0.0):
        gdim = 1
    verts = coords[:, :gdim]
    return mesh_from_arrays(verts, cells, cell_name, name,
                            cell_tags=cell_tags, facet_elems=facet_elems)


def mesh_from_arrays(verts, cells, cell_name, name, cell_tags=None,
                     facet_elems=None):
    """Build a tagged Mesh from vertex coordinates + 0-based cell
    connectivity (OUR node order).  `cell_tags` is a per-cell marker
    array; `facet_elems` is a list of (sorted vertex tuple, tag) pairs
    matched against the facet table to set facet markers.  Shared tail
    of the gmsh/exodus/cgns readers (reference: firedrake/mesh.py
    plex-from-cell-list path, mesh.py:376-461)."""
    cells = np.asarray(cells, dtype=_IDX)
    topo = MeshTopology(cells, len(verts), cell_name, name)
    mesh = Mesh(topo, np.asarray(verts, dtype=float), name=name)
    if cell_tags is not None and len(cell_tags):
        mesh.cell_markers = np.asarray(cell_tags, dtype=_IDX)
    # facet markers: match tagged codim-1 elements to facet table
    if facet_elems:
        fv = topo.facet_vertices
        fv_sorted = np.sort(np.where(fv < 0, np.iinfo(np.int64).max, fv),
                            axis=1)
        lookup = {tuple(int(x) for x in row if x < np.iinfo(np.int64).max
                        // 2): i for i, row in enumerate(fv_sorted)}
        markers = np.zeros(len(fv), dtype=_IDX)
        for key, phys in facet_elems:
            i = lookup.get(tuple(key))
            if i is not None:
                markers[i] = phys
        mesh.facet_markers = markers
    return mesh
