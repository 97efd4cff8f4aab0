"""Acceptance port of reference
tests/firedrake/regression/test_nonlinear_helmholtz.py (round-5
directive 8): Helmholtz via the nonlinear (residual-form) interface,
checking L2 convergence under both default and LU parameters."""
import pytest

from firedrake_tpu import *


def run_test(r, parameters={}):
    mesh = UnitSquareMesh(2 ** r, 2 ** r)
    x = SpatialCoordinate(mesh)
    V = FunctionSpace(mesh, "CG", 2)

    lmbda = 1
    u = Function(V)
    v = TestFunction(V)
    f = Function(V)
    f.interpolate((1+8*pi*pi)*cos(x[0]*pi*2)*cos(x[1]*pi*2))
    a = (inner(grad(u), grad(v)) + lmbda * inner(u, v)) * dx
    L = inner(f, v) * dx

    solve(a - L == 0, u, solver_parameters=parameters)

    f.interpolate(cos(x[0]*2*pi)*cos(x[1]*2*pi))

    return sqrt(assemble(inner(u - f, u - f) * dx))


def run_convergence_test(parameters={}):
    import numpy as np
    diff = np.array([run_test(i, parameters) for i in range(3, 6)])
    return np.log2(diff[:-1] / diff[1:])


@pytest.mark.parametrize('params', [{}, {'snes_type': 'ksponly',
                                         'ksp_type': 'preonly',
                                         'pc_type': 'lu'}])
def test_l2_conv(params):
    assert (run_convergence_test(parameters=params) > 2.8).all()
