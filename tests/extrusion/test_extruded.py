"""Extruded meshes (reference: tests/firedrake/extrusion/, 62 files;
firedrake/mesh.py:3466 ExtrudedMesh)."""
import math

import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           TrialFunction, SpatialCoordinate, Constant,
                           UnitIntervalMesh, UnitSquareMesh, DirichletBC,
                           inner, grad, dx, solve, errornorm, assemble,
                           sin)
from firedrake_tpu.mesh.utility import ExtrudedMesh


def test_extruded_interval_to_quads():
    m = ExtrudedMesh(UnitIntervalMesh(4), 3)
    assert m.cell.name == "quadrilateral"
    assert m.num_cells == 12
    assert abs(assemble(Constant(1.0) * dx(domain=m)) - 1.0) < 1e-12


def test_extruded_quads_to_hexes():
    m = ExtrudedMesh(UnitSquareMesh(2, 2, quadrilateral=True), 2)
    assert m.cell.name == "hexahedron"
    assert abs(assemble(Constant(1.0) * dx(domain=m)) - 1.0) < 1e-12


def test_extruded_triangles_to_prisms():
    m = ExtrudedMesh(UnitSquareMesh(3, 3), 4, layer_height=0.5)
    assert m.cell.name == "prism"
    assert m.num_cells == 18 * 4
    assert abs(assemble(Constant(1.0) * dx(domain=m)) - 2.0) < 1e-12


def test_prism_poisson_linear_exact():
    m = ExtrudedMesh(UnitSquareMesh(3, 3), 4)
    V = FunctionSpace(m, "CG", 1)
    X = SpatialCoordinate(m)
    g = Function(V).interpolate(1 + X[0] + 2 * X[2])
    u, v = TrialFunction(V), TestFunction(V)
    uh = Function(V)
    solve(inner(grad(u), grad(v)) * dx == inner(Constant(0.0), v) * dx,
          uh, bcs=[DirichletBC(V, g, "on_boundary")],
          solver_parameters={"ksp_type": "cg", "pc_type": "jacobi",
                             "ksp_rtol": 1e-12})
    assert errornorm(1 + X[0] + 2 * X[2], uh) < 1e-9


def test_prism_helmholtz_convergence():
    errs = []
    for n in [4, 8]:
        m = ExtrudedMesh(UnitSquareMesh(n, n), n)
        V = FunctionSpace(m, "CG", 1)
        X = SpatialCoordinate(m)
        u, v = TrialFunction(V), TestFunction(V)
        from firedrake_tpu import cos
        ex = (cos(math.pi * X[0]) * cos(math.pi * X[1])
              * cos(math.pi * X[2]))
        f = Function(V).interpolate((1 + 3 * math.pi ** 2) * ex)
        uh = Function(V)
        solve((inner(grad(u), grad(v)) + inner(u, v)) * dx
              == inner(f, v) * dx, uh,
              solver_parameters={"ksp_type": "cg", "pc_type": "jacobi",
                                 "ksp_rtol": 1e-11})
        errs.append(errornorm(ex, uh))
    order = np.log2(errs[0] / errs[1])
    assert order > 1.5, (errs, order)


def test_prism_dg_any_degree():
    m = ExtrudedMesh(UnitSquareMesh(2, 2), 2)
    V = FunctionSpace(m, "DG", 2)
    X = SpatialCoordinate(m)
    f = Function(V).interpolate(X[0] ** 2 + X[2] ** 2)
    # DG2 on prisms represents quadratics exactly
    assert errornorm(X[0] ** 2 + X[2] ** 2, f) < 1e-11


def test_prism_cg2_exact_quadratics():
    """CG2 on prisms (mixed-arity face numbering): quadratics exact."""
    m = ExtrudedMesh(UnitSquareMesh(3, 3), 3)
    V = FunctionSpace(m, "CG", 2)
    X = SpatialCoordinate(m)
    f = Function(V).interpolate(X[0] ** 2 + X[1] * X[2] + X[2] ** 2)
    assert errornorm(X[0] ** 2 + X[1] * X[2] + X[2] ** 2, f) < 1e-11
    u, v = TrialFunction(V), TestFunction(V)
    g = Function(V).interpolate(X[0] ** 2 + X[2] ** 2)
    uh = Function(V)
    solve(inner(grad(u), grad(v)) * dx == inner(Constant(-4.0), v) * dx,
          uh, bcs=[DirichletBC(V, g, "on_boundary")],
          solver_parameters={"ksp_type": "cg", "pc_type": "jacobi",
                             "ksp_rtol": 1e-12})
    assert errornorm(X[0] ** 2 + X[2] ** 2, uh) < 1e-9
