

def test_sphere_cylinder_disk_meshes():
    """New utility meshes: areas converge to the analytic values
    (reference: utility_meshes.py CubedSphereMesh/OctahedralSphereMesh/
    CylinderMesh/UnitDiskMesh)."""
    import numpy as np
    from firedrake_tpu import (CubedSphereMesh, OctahedralSphereMesh,
                               CylinderMesh, UnitDiskMesh, Constant,
                               assemble, dx)
    for m, area, tol in [
            (CubedSphereMesh(1.0, 2), 4 * np.pi, 0.05),
            (OctahedralSphereMesh(1.0, 3), 4 * np.pi, 0.02),
            (CylinderMesh(16, 4), 2 * np.pi, 0.01),
            (UnitDiskMesh(3), np.pi, 0.005)]:
        a = assemble(Constant(1.0) * dx(domain=m))
        assert abs(a - area) / area < tol


def test_submesh():
    """Submesh of a marked cell subset: correct area, solvable, facet
    markers inherited (reference: firedrake Submesh)."""
    import numpy as np
    from firedrake_tpu import (UnitSquareMesh, FunctionSpace, Function,
                               TestFunction, TrialFunction, Constant,
                               DirichletBC, assemble, inner, grad, dx,
                               solve)
    from firedrake_tpu.mesh.utility import Submesh
    mesh = UnitSquareMesh(8, 8)
    mesh.mark_cells(lambda c: 1 if c[0] < 0.5 else 2)
    sub = Submesh(mesh, 1)
    assert sub.num_cells == mesh.num_cells // 2
    assert abs(assemble(Constant(1.0) * dx(domain=sub)) - 0.5) < 1e-12
    V = FunctionSpace(sub, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    uh = Function(V)
    solve(inner(grad(u), grad(v)) * dx == v * dx, uh,
          bcs=[DirichletBC(V, 0.0, "on_boundary")])
    assert 0 < float(np.asarray(uh.dat).max()) < 1.0
