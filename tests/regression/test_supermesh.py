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
