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
