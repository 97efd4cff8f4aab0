"""VertexOnlyMesh: point-cloud mesh immersed in a parent mesh
(reference: firedrake/mesh.py:2912 VertexOnlyMesh,
tests/firedrake/vertexonly/)."""
import numpy as np
import pytest

from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           SpatialCoordinate, UnitSquareMesh,
                           VertexOnlyMesh, PointNotInDomainError,
                           assemble, dx, sin)


@pytest.fixture
def parent():
    return UnitSquareMesh(8, 8)


def test_vom_interpolate_function(parent):
    X = SpatialCoordinate(parent)
    f = Function(FunctionSpace(parent, "CG", 2)).interpolate(
        X[0] ** 2 + X[1])
    pts = np.array([[0.21, 0.33], [0.5, 0.5], [0.9, 0.1]])
    vm = VertexOnlyMesh(parent, pts)
    g = Function(FunctionSpace(vm, "DG", 0)).interpolate(f)
    exact = pts[:, 0] ** 2 + pts[:, 1]
    assert np.abs(np.asarray(g.dat) - exact).max() < 1e-12


def test_vom_interpolate_expression(parent):
    X = SpatialCoordinate(parent)
    f = Function(FunctionSpace(parent, "CG", 2)).interpolate(
        X[0] ** 2 + X[1])
    pts = np.array([[0.25, 0.25], [0.75, 0.5]])
    vm = VertexOnlyMesh(parent, pts)
    P = FunctionSpace(vm, "DG", 0)
    h = Function(P).interpolate(sin(X[0]) * f + 2.0)
    exact = np.sin(pts[:, 0]) * (pts[:, 0] ** 2 + pts[:, 1]) + 2.0
    assert np.abs(np.asarray(h.dat) - exact).max() < 1e-12


def test_vom_point_integrals(parent):
    """dx on a VOM is a unit weight per vertex (rank 0 and rank 1)."""
    X = SpatialCoordinate(parent)
    f = Function(FunctionSpace(parent, "CG", 1)).interpolate(X[0])
    pts = np.array([[0.25, 0.25], [0.75, 0.5], [0.1, 0.9]])
    vm = VertexOnlyMesh(parent, pts)
    P = FunctionSpace(vm, "DG", 0)
    g = Function(P).interpolate(f)
    assert abs(assemble(g * dx) - pts[:, 0].sum()) < 1e-12
    q = TestFunction(P)
    cof = assemble(g * q * dx)
    assert np.abs(np.asarray(cof.dat) - pts[:, 0]).max() < 1e-12


def test_vom_missing_points(parent):
    with pytest.raises(PointNotInDomainError):
        VertexOnlyMesh(parent, [[2.0, 2.0]])
    with pytest.warns(UserWarning):
        vm = VertexOnlyMesh(parent, [[0.5, 0.5], [2.0, 2.0]],
                            missing_points_behaviour="warn")
    assert vm.num_cells == 1


def test_vom_input_ordering(parent):
    X = SpatialCoordinate(parent)
    f = Function(FunctionSpace(parent, "CG", 1)).interpolate(X[0])
    vm = VertexOnlyMesh(parent, [[0.5, 0.5], [2.0, 2.0]],
                        missing_points_behaviour="warn")
    g = Function(FunctionSpace(vm, "DG", 0)).interpolate(f)
    io = vm.input_ordering
    gio = Function(FunctionSpace(io, "DG", 0)).interpolate(g)
    d = np.asarray(gio.dat)
    assert abs(d[0] - 0.5) < 1e-12
    assert np.isnan(d[1])


def test_vom_coordinates(parent):
    pts = np.array([[0.3, 0.4], [0.6, 0.7]])
    vm = VertexOnlyMesh(parent, pts)
    c = np.asarray(vm.coordinates.dat).reshape(-1, 2)
    assert np.abs(c - pts).max() == 0.0


def test_vom_to_vom_unrelated(parent):
    """Transfers between unrelated vertex meshes match points by
    coordinates; unmatched points are NaN (reference:
    VomOntoVomInterpolator)."""
    X = SpatialCoordinate(parent)
    f = Function(FunctionSpace(parent, "CG", 1)).interpolate(X[0])
    a = VertexOnlyMesh(parent, [[0.25, 0.25], [0.5, 0.5], [0.75, 0.25]])
    b = VertexOnlyMesh(parent, [[0.5, 0.5], [0.25, 0.25], [0.1, 0.9]])
    ga = Function(FunctionSpace(a, "DG", 0)).interpolate(f)
    gb = Function(FunctionSpace(b, "DG", 0)).interpolate(ga)
    d = np.asarray(gb.dat)
    assert abs(d[0] - 0.5) < 1e-12
    assert abs(d[1] - 0.25) < 1e-12
    assert np.isnan(d[2])
