"""Acceptance port of reference
tests/firedrake/regression/test_steady_advection_2D.py (round-5
directive 8): steady upwind-DG advection, exercising interior and
exterior facet integrals on triangles and quadrilaterals.  DPC is not
implemented (serendipity family); those params are skipped."""
import pytest

from firedrake_tpu import *


@pytest.fixture(scope='module', params=[False, True],
                ids=["triangle", "quadrilateral"])
def mesh(request):
    return UnitSquareMesh(5, 5, quadrilateral=request.param)


def _dg(mesh, family, degree):
    if mesh.cell.name == "triangle":
        return FunctionSpace(mesh, "DG", degree)
    if family == "DPC":
        pytest.skip("DPC (discontinuous serendipity) not implemented")
    return FunctionSpace(mesh, family, degree)


@pytest.fixture(scope='module', params=["DG", "DPC"])
def DGDPC0(request, mesh):
    return _dg(mesh, request.param, 0)


@pytest.fixture(scope='module', params=["DG", "DPC"])
def DGDPC1(request, mesh):
    return _dg(mesh, request.param, 1)


@pytest.fixture(scope='module')
def W(mesh):
    if mesh.cell.name == "triangle":
        return FunctionSpace(mesh, "BDM", 1)
    else:
        return FunctionSpace(mesh, "RTCF", 1)


def test_left_to_right(mesh, DGDPC0, W):
    velocity = as_vector((1.0, 0.0))
    u0 = project(velocity, W)

    xs = SpatialCoordinate(mesh)
    inflowexpr = conditional(And(real(xs[1]) > 0.25, real(xs[1]) < 0.75),
                             1.0, 0.5)
    inflow = Function(DGDPC0)
    inflow.interpolate(inflowexpr)

    n = FacetNormal(mesh)
    un = 0.5*(dot(u0, n) + abs(dot(u0, n)))

    D = TrialFunction(DGDPC0)
    phi = TestFunction(DGDPC0)

    a1 = -D * inner(u0, grad(phi)) * dx
    a2 = inner(un('+')*D('+') - un('-')*D('-'), jump(phi)) * dS
    a3 = inner(un*D, phi) * ds(2)  # outflow at right-hand wall
    a = a1 + a2 + a3

    L = -inflow * inner(dot(u0, n), phi) * ds(1)  # inflow at left wall

    out = Function(DGDPC0)
    solve(a == L, out)

    import numpy as np
    assert np.max(np.abs(np.asarray(out.dat)
                         - np.asarray(inflow.dat))) < 1.2e-7


def test_up_to_down(mesh, DGDPC1, W):
    velocity = as_vector((0.0, -1.0))
    u0 = project(velocity, W)

    xs = SpatialCoordinate(mesh)
    inflowexpr = 1 + xs[0]
    inflow = Function(DGDPC1)
    inflow.interpolate(inflowexpr)

    n = FacetNormal(mesh)
    un = 0.5*(dot(u0, n) + abs(dot(u0, n)))

    D = TrialFunction(DGDPC1)
    phi = TestFunction(DGDPC1)

    a1 = -D * inner(u0, grad(phi)) * dx
    a2 = inner(un('+')*D('+') - un('-')*D('-'), jump(phi)) * dS
    a3 = inner(un*D, phi) * ds(3)  # outflow at lower wall
    a = a1 + a2 + a3

    L = -inflow * inner(dot(u0, n), phi) * ds(4)  # inflow at upper wall

    out = Function(DGDPC1)
    solve(a == L, out)

    import numpy as np
    assert np.max(np.abs(np.asarray(out.dat)
                         - np.asarray(inflow.dat))) < 1.1e-6
