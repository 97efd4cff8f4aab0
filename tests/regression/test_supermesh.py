"""Supermesh mixed mass matrices + conservative projection between
non-matching meshes (reference: firedrake/supermeshing.py:70,
tests/firedrake/supermesh/)."""
import numpy as np

from firedrake_tpu import (FunctionSpace, Function, SpatialCoordinate,
                           UnitSquareMesh, assemble, dx, sin, errornorm)
from firedrake_tpu.supermesh import (assemble_mixed_mass_matrix,
                                     supermesh_project)


def test_mixed_mass_partition_of_unity():
    VA = FunctionSpace(UnitSquareMesh(8, 8), "CG", 1)
    VB = FunctionSpace(UnitSquareMesh(5, 7), "CG", 2)
    M = assemble_mixed_mass_matrix(VA, VB)
    total = float(np.ones(VA.dim) @ (M.to_scipy() @ np.ones(VB.dim)))
    assert abs(total - 1.0) < 1e-12


def test_conservative_projection():
    mA, mB = UnitSquareMesh(8, 8), UnitSquareMesh(5, 7)
    VA = FunctionSpace(mA, "CG", 1)
    VB = FunctionSpace(mB, "CG", 2)
    XB = SpatialCoordinate(mB)
    XA = SpatialCoordinate(mA)
    # exact for functions representable in BOTH spaces
    f = Function(VB).interpolate(XB[0] + 2 * XB[1])
    u = supermesh_project(f, VA)
    assert errornorm(XA[0] + 2 * XA[1], u) < 1e-11
    # Galerkin projection conserves the integral for ANY source
    f2 = Function(VB).interpolate(sin(XB[0]) * XB[1] ** 2)
    u2 = supermesh_project(f2, VA)
    assert abs(assemble(u2 * dx) - assemble(f2 * dx)) < 1e-12


def test_mixed_mass_3d_partition_of_unity():
    from firedrake_tpu import UnitCubeMesh
    VA = FunctionSpace(UnitCubeMesh(3, 3, 3), "CG", 1)
    VB = FunctionSpace(UnitCubeMesh(4, 4, 4), "CG", 1)
    M = assemble_mixed_mass_matrix(VA, VB)
    total = float(np.ones(VA.dim) @ (M.to_scipy() @ np.ones(VB.dim)))
    assert abs(total - 1.0) < 1e-10


def test_conservative_projection_3d():
    from firedrake_tpu import UnitCubeMesh
    mA, mB = UnitCubeMesh(3, 3, 3), UnitCubeMesh(2, 4, 3)
    VA = FunctionSpace(mA, "CG", 1)
    VB = FunctionSpace(mB, "CG", 2)
    XB = SpatialCoordinate(mB)
    XA = SpatialCoordinate(mA)
    f = Function(VB).interpolate(1 + XB[0] - 2 * XB[1] + 0.5 * XB[2])
    u = supermesh_project(f, VA)
    assert errornorm(1 + XA[0] - 2 * XA[1] + 0.5 * XA[2], u) < 1e-10
    f2 = Function(VB).interpolate(sin(XB[0]) * XB[2] ** 2)
    u2 = supermesh_project(f2, VA)
    assert abs(assemble(u2 * dx) - assemble(f2 * dx)) < 1e-11


def test_supermesh_vector_spaces():
    from firedrake_tpu import VectorFunctionSpace, as_vector
    mA, mB = UnitSquareMesh(6, 6), UnitSquareMesh(4, 5)
    WA = VectorFunctionSpace(mA, "CG", 1)
    WB = VectorFunctionSpace(mB, "CG", 2)
    XB = SpatialCoordinate(mB)
    XA = SpatialCoordinate(mA)
    f = Function(WB).interpolate(as_vector([XB[0] + XB[1], 2 - XB[1]]))
    u = supermesh_project(f, WA)
    assert errornorm(as_vector([XA[0] + XA[1], 2 - XA[1]]), u) < 1e-10
    # componentwise conservation
    f2 = Function(WB).interpolate(as_vector([sin(XB[0]), XB[1] ** 3]))
    u2 = supermesh_project(f2, WA)
    for c in range(2):
        assert abs(assemble(u2[c] * dx) - assemble(f2[c] * dx)) < 1e-12


def test_mixed_mass_quads():
    """Quad-quad supermesh (round-4: polygon clipping beyond
    simplices; reference libsupermesh is simplex-only — this exceeds
    the reference envelope)."""
    from firedrake_tpu import UnitSquareMesh
    mA = UnitSquareMesh(6, 6, quadrilateral=True)
    mB = UnitSquareMesh(4, 5, quadrilateral=True)
    VA = FunctionSpace(mA, "CG", 1)
    VB = FunctionSpace(mB, "CG", 2)
    M = assemble_mixed_mass_matrix(VA, VB)
    total = float(np.ones(VA.dim) @ (M.to_scipy() @ np.ones(VB.dim)))
    assert abs(total - 1.0) < 1e-12
    XB = SpatialCoordinate(mB)
    XA = SpatialCoordinate(mA)
    f = Function(VB).interpolate(XB[0] - 3 * XB[1])
    u = supermesh_project(f, VA)
    assert errornorm(XA[0] - 3 * XA[1], u) < 1e-11
    f2 = Function(VB).interpolate(sin(XB[0]) * XB[1])
    u2 = supermesh_project(f2, VA)
    assert abs(assemble(u2 * dx) - assemble(f2 * dx)) < 1e-12


def test_mixed_mass_hexes():
    from firedrake_tpu import UnitCubeMesh
    mA = UnitCubeMesh(3, 3, 3, hexahedral=True)
    mB = UnitCubeMesh(2, 3, 4, hexahedral=True)
    VA = FunctionSpace(mA, "CG", 1)
    VB = FunctionSpace(mB, "CG", 1)
    M = assemble_mixed_mass_matrix(VA, VB)
    total = float(np.ones(VA.dim) @ (M.to_scipy() @ np.ones(VB.dim)))
    assert abs(total - 1.0) < 1e-10
    XB = SpatialCoordinate(mB)
    XA = SpatialCoordinate(mA)
    f = Function(VB).interpolate(1 + 2 * XB[0] - XB[2])
    u = supermesh_project(f, VA)
    assert errornorm(1 + 2 * XA[0] - XA[2], u) < 1e-10
