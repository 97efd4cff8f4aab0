"""Manifold + periodic meshes (reference: utility_meshes.py sphere/torus/
annulus constructors; periodic meshes with DG coordinates)."""
import math

import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           TrialFunction, SpatialCoordinate, Constant,
                           CircleManifoldMesh, IcosahedralSphereMesh,
                           PeriodicUnitSquareMesh, TorusMesh, AnnulusMesh,
                           inner, grad, dx, errornorm, cos,
                           VectorSpaceBasis, assemble,
                           LinearVariationalProblem,
                           LinearVariationalSolver)


def test_circle_circumference():
    m = CircleManifoldMesh(64)
    assert abs(assemble(Constant(1.0) * dx(domain=m))
               - 2 * math.pi) < 0.02


def test_sphere_area_and_convergence():
    areas = [assemble(Constant(1.0)
                      * dx(domain=IcosahedralSphereMesh(1.0, lvl)))
             for lvl in (1, 2, 3)]
    exact = 4 * math.pi
    errs = [abs(a - exact) for a in areas]
    assert errs[2] < errs[1] < errs[0]
    assert errs[2] < 0.15


def test_torus_annulus_area():
    t = TorusMesh(64, 32, 2.0, 0.5)
    assert abs(assemble(Constant(1.0) * dx(domain=t))
               - 4 * math.pi ** 2) < 0.15
    am = AnnulusMesh(2.0, 1.0, 4, 32)
    assert abs(assemble(Constant(1.0) * dx(domain=am))
               - 3 * math.pi) < 0.2
    assert len(am.boundary_facets(1)) == 32
    assert len(am.boundary_facets(2)) == 32


def test_periodic_poisson():
    pm = PeriodicUnitSquareMesh(16, 16)
    X = SpatialCoordinate(pm)
    assert abs(assemble(Constant(1.0) * dx(domain=pm)) - 1.0) < 1e-12
    # no boundary at all
    assert len(pm.topology.exterior_facets) == 0
    V = FunctionSpace(pm, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    f = Function(V).interpolate(cos(2 * math.pi * X[0]))
    uh = Function(V)
    prob = LinearVariationalProblem(inner(grad(u), grad(v)) * dx,
                                    inner(f, v) * dx, uh)
    LinearVariationalSolver(
        prob, solver_parameters={"ksp_type": "cg", "pc_type": "jacobi",
                                 "ksp_rtol": 1e-11},
        nullspace=VectorSpaceBasis(constant=True)).solve()
    ex = cos(2 * math.pi * X[0]) / (4 * math.pi ** 2)
    c = float(assemble((uh - ex) * dx))
    assert errornorm(ex + Constant(c), uh) < 0.02


def test_laplace_beltrami_sphere():
    """-Δ_S u = f on the sphere: eigenfunction x (spherical harmonic
    l=1): -Δ_S x = 2x on the unit sphere."""
    mesh = IcosahedralSphereMesh(1.0, 3)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    u, v = TrialFunction(V), TestFunction(V)
    f = Function(V).interpolate(2 * X[0])
    uh = Function(V)
    prob = LinearVariationalProblem(inner(grad(u), grad(v)) * dx,
                                    inner(f, v) * dx, uh)
    LinearVariationalSolver(
        prob, solver_parameters={"ksp_type": "cg", "pc_type": "jacobi",
                                 "ksp_rtol": 1e-11},
        nullspace=VectorSpaceBasis(constant=True)).solve()
    c = float(assemble((uh - X[0]) * dx(domain=mesh)))
    err = errornorm(X[0] + Constant(c / assemble(
        Constant(1.0) * dx(domain=mesh))), uh)
    assert err < 0.05, err
