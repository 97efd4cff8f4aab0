"""GeometryProjectedMeshHierarchy (reference: mg/opencascade_mh.py —
refinements projected back to the true geometry).  Analytic circle
projection replaces the CAD stack; the capability under test is the
same: every level's boundary nodes sit ON the geometry, and solves on
the snapped hierarchy converge."""
import numpy as np

from firedrake_tpu import (Function, FunctionSpace, SpatialCoordinate,
                           TestFunction, TrialFunction, UnitDiskMesh,
                           DirichletBC, dx, grad, inner, solve)
from firedrake_tpu.mg import GeometryProjectedMeshHierarchy
from firedrake_tpu.mg.geometry import snap_boundary, _boundary_vertices


def _circle_project(pts):
    r = np.linalg.norm(pts, axis=1, keepdims=True)
    return pts / np.maximum(r, 1e-300)


def _bdry_radii(mesh):
    xy = np.asarray(mesh.coordinates.dat).reshape(-1, 2)
    return np.linalg.norm(xy[_boundary_vertices(mesh)], axis=1)


def test_refined_boundary_nodes_on_circle():
    hier = GeometryProjectedMeshHierarchy(UnitDiskMesh(1), 2,
                                          _circle_project)
    assert hier.nested is False
    for m in hier.meshes:
        np.testing.assert_allclose(_bdry_radii(m), 1.0, atol=1e-14)


def test_unsnapped_midpoints_off_circle():
    """Sanity: WITHOUT projection the refined midpoints sit on chords
    strictly inside the circle — the projection is doing real work."""
    from firedrake_tpu import MeshHierarchy
    hier = MeshHierarchy(UnitDiskMesh(1), 1)
    r = _bdry_radii(hier.meshes[-1])
    assert r.min() < 1.0 - 1e-3


def test_snap_is_idempotent():
    m = UnitDiskMesh(2)
    snap_boundary(m, _circle_project)
    before = np.array(m.coordinates.dat)
    snap_boundary(m, _circle_project)
    np.testing.assert_allclose(np.asarray(m.coordinates.dat), before,
                               atol=1e-15)


def test_gmg_on_projected_hierarchy():
    """Poisson u=0 on the circle, f=4: exact solution 1-r^2; GMG on the
    snapped hierarchy converges at the discretization-error level."""
    hier = GeometryProjectedMeshHierarchy(UnitDiskMesh(1), 2,
                                          _circle_project)
    mesh = hier.meshes[-1]
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    uh = Function(V)
    solve(inner(grad(u), grad(v)) * dx == 4.0 * v * dx, uh,
          bcs=DirichletBC(V, 0.0, "on_boundary"),
          solver_parameters={"ksp_type": "cg", "pc_type": "mg",
                             "ksp_rtol": 1e-10})
    X = SpatialCoordinate(mesh)
    from firedrake_tpu import errornorm
    assert errornorm(1 - X[0] ** 2 - X[1] ** 2, uh) < 0.02
