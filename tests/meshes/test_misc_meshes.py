"""BallMesh / RelabeledMesh / MeshSequence (reference:
utility_meshes.py BallMesh; mesh.py:4769 RelabeledMesh, :5090
MeshSequence)."""
import numpy as np

from firedrake_tpu import (BallMesh, UnitBallMesh, RelabeledMesh,
                           MeshSequence, UnitSquareMesh, FunctionSpace,
                           Function, SpatialCoordinate, assemble,
                           Constant, conditional, gt, dx, ds)


def test_ball_mesh_volume_and_orientation():
    m = BallMesh(1.0, refinement_level=1)
    vols = m.cell_volumes
    assert (vols > 0).all()
    vol = float(vols.sum())
    assert abs(vol - 4.0 / 3.0 * np.pi) / (4.0 / 3.0 * np.pi) < 0.25
    # boundary vertices on the unit sphere
    bf = m.topology.exterior_facets
    fv = m.topology.facet_vertices[bf]
    r = np.linalg.norm(m._vertex_coords[np.unique(fv)], axis=1)
    assert np.abs(r - 1.0).max() < 1e-12
    # surface integral approximates 4*pi
    area = float(assemble(Constant(1.0) * ds(domain=m)))
    assert abs(area - 4 * np.pi) / (4 * np.pi) < 0.25


def test_unit_ball_refines():
    v0 = float(UnitBallMesh(0).cell_volumes.sum())
    v1 = float(UnitBallMesh(1).cell_volumes.sum())
    exact = 4.0 / 3.0 * np.pi
    assert abs(v1 - exact) < abs(v0 - exact)


def test_relabeled_mesh_cells_and_facets():
    mesh = UnitSquareMesh(4, 4)
    V0 = FunctionSpace(mesh, "DG", 0)
    X = SpatialCoordinate(mesh)
    ind = Function(V0).interpolate(conditional(gt(X[0], 0.5), 1.0, 0.0))
    find = np.zeros(mesh.topology.facet_cells.shape[0])
    sel = mesh.topology.exterior_facets[:3]
    find[sel] = 1.0
    m2 = RelabeledMesh(mesh, [ind, find], [9, 7])
    assert set(np.unique(m2.cell_markers)) == {0, 9}
    assert (m2.cell_markers == 9).sum() == int(np.asarray(ind.dat).sum())
    assert (m2.facet_markers == 7).sum() == 3
    assert (m2.facet_markers[sel] == 7).all()
    keep = np.ones(len(find), dtype=bool)
    keep[sel] = False
    assert (m2.facet_markers[keep] == mesh.facet_markers[keep]).all()
    # original untouched
    assert (mesh.cell_markers == 0).all()
    # relabeled subdomain integrates
    a = float(assemble(Constant(1.0) * dx(9, domain=m2)))
    assert abs(a - 0.5) < 1e-12


def test_mesh_sequence():
    ms = MeshSequence([UnitSquareMesh(2, 2), UnitSquareMesh(3, 3)])
    assert len(ms) == 2
    assert ms[1].num_cells == 18
    assert [m.num_cells for m in ms] == [8, 18]
