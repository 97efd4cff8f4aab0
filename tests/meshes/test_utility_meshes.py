

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
