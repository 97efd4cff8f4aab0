"""Mesh topology/geometry unit tests (reference analogue: mesh-construction
checks inside tests/firedrake/regression/test_meshes*.py)."""
import numpy as np
import pytest

import firedrake_tpu as fd


def test_unit_square_counts():
    m = fd.UnitSquareMesh(3, 3)
    assert m.num_cells == 18
    assert m.num_vertices == 16
    t = m.topology
    # Euler: V - E + F = 1 for a disk
    assert m.num_vertices - t.num_entities(1) + m.num_cells == 1
    assert len(t.exterior_facets) == 12


def test_boundary_markers_square():
    m = fd.UnitSquareMesh(4, 4)
    for marker, (ax, val) in [(1, (0, 0.0)), (2, (0, 1.0)),
                              (3, (1, 0.0)), (4, (1, 1.0))]:
        facets = m.boundary_facets(marker)
        assert len(facets) == 4
        fv = m.topology.facet_vertices[facets]
        assert np.allclose(m._vertex_coords[fv][:, :, ax], val)


def test_cell_volumes():
    m = fd.UnitSquareMesh(5, 5)
    assert np.allclose(m.cell_volumes.sum(), 1.0)
    m3 = fd.UnitCubeMesh(2, 2, 2)
    assert np.allclose(m3.cell_volumes.sum(), 1.0)
    assert m3.num_cells == 48
    mq = fd.UnitSquareMesh(3, 3, quadrilateral=True)
    assert mq.num_cells == 9
    assert np.allclose(mq.cell_volumes.sum(), 1.0)


def test_box_mesh_facets():
    m = fd.UnitCubeMesh(2, 2, 2)
    t = m.topology
    for marker in range(1, 7):
        facets = m.boundary_facets(marker)
        assert len(facets) == 8   # 2x2 squares split in 2 triangles
    # all facets have two cells or one
    assert (t.facet_cells[:, 0] >= 0).all()


def test_interval_mesh():
    m = fd.IntervalMesh(10, 2.0)
    assert m.num_cells == 10
    assert np.allclose(m.cell_volumes.sum(), 2.0)
    assert len(m.boundary_facets(1)) == 1
    assert len(m.boundary_facets(2)) == 1


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_global_numbering_consistency(degree):
    """Each global dof must receive the same physical coordinate from every
    adjacent cell — catches orientation/permutation bugs (reference
    analogue: continuity tested via interpolation in regression tests)."""
    m = fd.UnitSquareMesh(3, 3)
    V = fd.FunctionSpace(m, "CG", degree)
    elem = V.scalar_element
    cmap = V.cell_node_map
    coords = m._vertex_coords[m.topology.cell_vertices]   # (nc, 3, 2)
    # physical position of each element node: affine map of ref nodes
    ref = elem.nodes                                      # (nd, 2)
    v0 = coords[:, 0]
    J = np.stack([coords[:, 1] - coords[:, 0],
                  coords[:, 2] - coords[:, 0]], axis=-1)  # (nc, 2, 2)
    phys = v0[:, None, :] + np.einsum("cgt,nt->cng", J, ref)
    glob = np.full((V.num_nodes, 2), np.nan)
    for c in range(m.num_cells):
        for n in range(elem.ndof):
            g = cmap[c, n]
            if np.isnan(glob[g, 0]):
                glob[g] = phys[c, n]
            else:
                assert np.allclose(glob[g], phys[c, n], atol=1e-12), \
                    (degree, c, n, g, glob[g], phys[c, n])
    assert not np.isnan(glob).any()


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_global_numbering_consistency_3d(degree):
    m = fd.UnitCubeMesh(2, 2, 2)
    V = fd.FunctionSpace(m, "CG", degree)
    elem = V.scalar_element
    cmap = V.cell_node_map
    coords = m._vertex_coords[m.topology.cell_vertices]
    ref = elem.nodes
    v0 = coords[:, 0]
    J = np.stack([coords[:, i] - coords[:, 0] for i in (1, 2, 3)], axis=-1)
    phys = v0[:, None, :] + np.einsum("cgt,nt->cng", J, ref)
    glob = np.full((V.num_nodes, 3), np.nan)
    for c in range(m.num_cells):
        for n in range(elem.ndof):
            g = cmap[c, n]
            if np.isnan(glob[g, 0]):
                glob[g] = phys[c, n]
            else:
                assert np.allclose(glob[g], phys[c, n], atol=1e-12)
