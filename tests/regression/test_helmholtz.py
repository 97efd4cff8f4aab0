"""Helmholtz convergence (reference: demos/helmholtz/helmholtz.py.rst +
tests/firedrake/regression/test_helmholtz.py)."""
import math

import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           TrialFunction, SpatialCoordinate, UnitSquareMesh,
                           inner, grad, dx, solve, errornorm, cos)


def helmholtz_error(n, degree=1, quadrilateral=False):
    mesh = UnitSquareMesh(n, n, quadrilateral=quadrilateral)
    V = FunctionSpace(mesh, "CG", degree)
    u = TrialFunction(V)
    v = TestFunction(V)
    X = SpatialCoordinate(mesh)
    x, y = X[0], X[1]
    f = Function(V)
    f.interpolate((1 + 8 * math.pi ** 2) * cos(2 * math.pi * x)
                  * cos(2 * math.pi * y))
    a = (inner(grad(u), grad(v)) + inner(u, v)) * dx
    L = inner(f, v) * dx
    uh = Function(V)
    solve(a == L, uh, solver_parameters={"ksp_type": "cg",
                                         "pc_type": "jacobi",
                                         "ksp_rtol": 1e-12})
    return errornorm(cos(2 * math.pi * x) * cos(2 * math.pi * y), uh)


@pytest.mark.parametrize("degree,expected_order",
                         [(1, 1.9), (2, 2.9), (3, 3.8)])
def test_helmholtz_convergence(degree, expected_order):
    ns = {1: [16, 32], 2: [8, 16], 3: [4, 8]}[degree]
    errs = [helmholtz_error(n, degree) for n in ns]
    order = np.log2(errs[0] / errs[1])
    assert order > expected_order, (errs, order)


def test_helmholtz_quads():
    errs = [helmholtz_error(n, 1, quadrilateral=True) for n in (16, 32)]
    order = np.log2(errs[0] / errs[1])
    assert order > 1.9, (errs, order)


def test_hex_poisson():
    """CG1 on a hexahedral BoxMesh (trilinear geometry path)."""
    import firedrake_tpu as fd
    from firedrake_tpu import (UnitCubeMesh, DirichletBC, Constant,
                               errornorm)
    mesh = fd.BoxMesh(4, 4, 4, hexahedral=True)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    g = Function(V).interpolate(1 + X[0] + 2 * X[1] - X[2])
    uh = Function(V)
    solve(inner(grad(u), grad(v)) * dx == inner(Constant(0.0), v) * dx,
          uh, bcs=[DirichletBC(V, g, "on_boundary")],
          solver_parameters={"ksp_type": "cg", "pc_type": "jacobi",
                             "ksp_rtol": 1e-12})
    assert errornorm(1 + X[0] + 2 * X[1] - X[2], uh) < 1e-9


def test_quadrature_degree_override():
    """dx(degree=...) metadata reaches the kernel (reference: integral
    metadata tsfc/driver.py:177)."""
    mesh = UnitSquareMesh(4, 4)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    from firedrake_tpu import assemble
    # x^4 y^4: exact with degree-8 rule, inexact with degree 1
    exact = 1.0 / 25.0
    hi = assemble(X[0] ** 4 * X[1] ** 4 * dx(degree=8))
    lo = assemble(X[0] ** 4 * X[1] ** 4 * dx(degree=1))
    assert abs(hi - exact) < 1e-6
    assert abs(lo - exact) > abs(hi - exact)
