"""Geometry-conforming mesh hierarchies: refine, then snap boundary
nodes onto the true (curved) geometry.

Reference: firedrake/mg/opencascade_mh.py:14 OpenCascadeMeshHierarchy —
gmsh meshes a STEP file, MeshHierarchy refines, and every refined
mesh's boundary vertices are projected back onto the CAD surface so the
discrete boundary converges to the real one.  The load-bearing
capability is the *projection hook on every level*, not OpenCascade
itself; here the hook is an explicit callable so analytic geometries
(circles, spheres, aerofoils given as signed-distance projections) work
without any CAD stack, and `OpenCascadeMeshHierarchy` layers the STEP
reading on top when pythonocc is importable (it is not baked into this
image — the adapter raises the same informative ImportError the
reference does).

TPU note: all projection happens on the host at hierarchy-build time
(numpy); the device programs see ordinary curved coordinate arrays, so
assembly/transfer kernels are unchanged.
"""
import os

import numpy as np

from .mesh import HierarchyBase, MeshHierarchy

__all__ = ["GeometryProjectedMeshHierarchy", "OpenCascadeMeshHierarchy"]


def _boundary_vertices(mesh):
    topo = mesh.topology
    ext = topo.exterior_facets
    return np.unique(np.asarray(topo.facet_vertices)[ext].reshape(-1))


def snap_boundary(mesh, project):
    """Move the mesh's boundary vertices to ``project(points)`` —
    points is (nb, gdim); returns the mesh (coordinates mutated).
    Projections that keep points fixed (already on the geometry) make
    this the identity, so snapping a level twice is safe."""
    g = mesh.geometric_dimension
    xy = np.array(mesh.coordinates.dat, dtype=float).reshape(-1, g)
    bidx = _boundary_vertices(mesh)
    proj = np.asarray(project(xy[bidx]), dtype=float)
    if proj.shape != (len(bidx), g):
        raise ValueError(
            f"project must map (nb, {g}) -> (nb, {g}); got {proj.shape}")
    xy[bidx] = proj
    mesh.coordinates.dat = xy.reshape(-1)
    return mesh


def GeometryProjectedMeshHierarchy(coarse_mesh, levels, project,
                                   project_coarse=True,
                                   mh_constructor=MeshHierarchy):
    """MeshHierarchy whose every level has its boundary nodes snapped
    onto the geometry described by ``project`` (a callable mapping an
    (nb, gdim) array of near-boundary points to their closest points on
    the true boundary).

    Refinement inserts edge midpoints that lie on the CHORDS of the
    coarse boundary; projecting each level moves them onto the curve,
    so the geometric error decreases with h^2 and curved-domain GMG
    keeps its textbook rates (the reference projects via OpenCascade's
    BRepExtrema; opencascade_mh.py:110 project_mesh_to_cad_2d role).
    """
    if project_coarse:
        snap_boundary(coarse_mesh, project)
    hier = mh_constructor(coarse_mesh, levels)
    for m in hier.meshes[1:]:
        snap_boundary(m, project)
    # snapped levels are geometrically non-nested: transfers remain the
    # refinement-pattern ones (same topology), exactly the reference's
    # `mh.nested = False` downgrade
    hier.nested = False
    return hier


def OpenCascadeMeshHierarchy(stepfile, element_size, levels,
                             order=1, cache=True, verbose=False,
                             project_refinements_to_cad=True,
                             mh_constructor=MeshHierarchy, **kwargs):
    """STEP-file mesh hierarchy (reference opencascade_mh.py:14): mesh
    the CAD surface with gmsh, refine, snap every level back to the CAD
    via pythonocc.  Requires the optional pythonocc bindings and a
    gmsh binary; neither ships in this image, so the adapter raises the
    reference's ImportError until they are installed."""
    try:
        from OCC.Core.STEPControl import STEPControl_Reader
        from OCC.Core.BRepExtrema import BRepExtrema_DistShapeShape  # noqa: F401
        from OCC.Core.gp import gp_Pnt  # noqa: F401
        from OCC.Core.TopoDS import TopoDS_Shape  # noqa: F401
    except ImportError:
        raise ImportError(
            "To use OpenCascadeMeshHierarchy, install the OpenCascade "
            "python bindings (pythonocc-core); analytic geometries can "
            "use GeometryProjectedMeshHierarchy directly.")
    if not os.path.isfile(stepfile):
        raise OSError(f"{stepfile} does not exist")

    reader = STEPControl_Reader()
    reader.ReadFile(stepfile)
    reader.TransferRoot()
    shape = reader.Shape()

    def project(points):
        from OCC.Core.BRepBuilderAPI import BRepBuilderAPI_MakeVertex
        from OCC.Core.BRepExtrema import BRepExtrema_DistShapeShape
        from OCC.Core.gp import gp_Pnt
        out = np.array(points, dtype=float)
        for i, p in enumerate(points):
            xyz = (float(p[0]), float(p[1]),
                   float(p[2]) if len(p) > 2 else 0.0)
            v = BRepBuilderAPI_MakeVertex(gp_Pnt(*xyz)).Vertex()
            dist = BRepExtrema_DistShapeShape(v, shape)
            if dist.IsDone() and dist.NbSolution() > 0:
                q = dist.PointOnShape2(1)
                out[i, :] = (q.X(), q.Y(), q.Z())[:out.shape[1]]
        return out

    coarse = _gmsh_coarse_mesh(stepfile, element_size, verbose=verbose,
                               cache=cache)
    if not project_refinements_to_cad:
        hier = mh_constructor(coarse, levels)
        snap_boundary(hier.meshes[0], project)
        return hier
    return GeometryProjectedMeshHierarchy(
        coarse, levels, project, mh_constructor=mh_constructor)


def _gmsh_coarse_mesh(stepfile, element_size, verbose=False, cache=True):
    """gmsh a STEP file to a .msh and read it through the Mesh()
    factory (reference opencascade_mh.py:67 make_coarse_mesh)."""
    import subprocess
    from ..mesh.utility import Mesh
    curdir = os.path.dirname(stepfile) or os.getcwd()
    stem = os.path.splitext(os.path.basename(stepfile))[0]
    geopath = os.path.join(curdir, f"coarse-{stem}.geo")
    mshpath = os.path.join(curdir, f"coarse-{stem}.msh")
    if not os.path.isfile(mshpath) or not cache:
        geo = ('SetFactory("OpenCASCADE");\n'
               f'a() = ShapeFromFile("{os.path.abspath(stepfile)}");\n'
               f'Mesh.CharacteristicLengthMax = {element_size};\n')
        with open(geopath, "w") as fh:
            fh.write(geo)
        subprocess.check_call(
            ["gmsh", geopath, "-3", "-format", "msh2", "-o", mshpath],
            stdout=None if verbose else subprocess.DEVNULL,
            stderr=None if verbose else subprocess.DEVNULL)
    return Mesh(mshpath)
