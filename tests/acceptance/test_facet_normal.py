"""Acceptance port of reference
tests/firedrake/regression/test_facet_normal.py (round-5 directive 8):
outward facet normals on interval/square/quad-square/cube boundaries."""
import numpy
import pytest

from firedrake_tpu import *


def test_facet_normal_unit_interval():
    m = UnitIntervalMesh(2)
    V = VectorFunctionSpace(m, 'CG', 1)
    x_hat = Function(V).interpolate(Constant((1.0,)))
    n = FacetNormal(m)

    assert assemble(dot(x_hat, n)*ds(1)) == -1.0   # x = 0
    assert assemble(dot(x_hat, n)*ds(2)) == 1.0    # x = 1


@pytest.mark.parametrize('quadrilateral', [False, True])
def test_facet_normal_unit_square(quadrilateral):
    m = UnitSquareMesh(2, 2, quadrilateral=quadrilateral)
    V = VectorFunctionSpace(m, 'CG', 1)
    x_hat = Function(V).interpolate(Constant((1, 0)))
    y_hat = Function(V).interpolate(Constant((0, 1)))
    n = FacetNormal(m)

    assert numpy.allclose(assemble(dot(x_hat, n)*ds(1)), -1.0)  # x = 0
    assert numpy.allclose(assemble(dot(x_hat, n)*ds(2)), 1.0)   # x = 1
    assert numpy.allclose(assemble(dot(x_hat, n)*ds(3)), 0.0)   # y = 0
    assert numpy.allclose(assemble(dot(x_hat, n)*ds(4)), 0.0)   # y = 1

    assert numpy.allclose(assemble(dot(y_hat, n)*ds(1)), 0.0)   # x = 0
    assert numpy.allclose(assemble(dot(y_hat, n)*ds(2)), 0.0)   # x = 1
    assert numpy.allclose(assemble(dot(y_hat, n)*ds(3)), -1.0)  # y = 0
    assert numpy.allclose(assemble(dot(y_hat, n)*ds(4)), 1.0)   # y = 1


def test_facet_normal_unit_cube():
    m = UnitCubeMesh(1, 1, 1)
    V = VectorFunctionSpace(m, 'CG', 1)
    x_hat = Function(V).interpolate(Constant((1, 0, 0)))
    y_hat = Function(V).interpolate(Constant((0, 1, 0)))
    z_hat = Function(V).interpolate(Constant((0, 0, 1)))
    n = FacetNormal(m)

    for vec, nonzero in [(x_hat, (1, 2)), (y_hat, (3, 4)), (z_hat, (5, 6))]:
        for sub in range(1, 7):
            expect = 0.0
            if sub == nonzero[0]:
                expect = -1.0
            elif sub == nonzero[1]:
                expect = 1.0
            assert abs(assemble(dot(vec, n)*ds(sub)) - expect) < 1e-14
