"""Acceptance port of reference
tests/firedrake/regression/test_cellvolume.py (round-5 directive 8):
CellVolume / FacetArea geometric quantities on all cell types,
including a stretched quad mesh and restrictions on dS."""
import pytest
import numpy as np

from firedrake_tpu import *


@pytest.fixture(params=["interval", "triangle", "quadrilateral",
                        "tetrahedron"])
def cell(request):
    return request.param


@pytest.fixture
def mesh(cell):
    if cell == "interval":
        return UnitIntervalMesh(1)
    if cell == "triangle":
        return UnitTriangleMesh()
    if cell == "quadrilateral":
        return UnitSquareMesh(1, 1, quadrilateral=True)
    if cell == "tetrahedron":
        return UnitTetrahedronMesh()


@pytest.fixture
def expect(cell):
    return {"interval": 1.0,
            "triangle": 1.0/2.0,
            "quadrilateral": 1.0,
            "tetrahedron": 1.0/6.0}[cell]


@pytest.mark.parametrize("exponent", [1, 0.5])
def test_cell_volume(exponent, mesh, expect):
    assert np.allclose(assemble((CellVolume(mesh)**exponent)*dx),
                       expect**(exponent + 1))


def test_cell_volume_exterior_facet(mesh, expect):
    assert np.allclose(assemble(sqrt(CellVolume(mesh))*ds),
                       assemble(1 * ds(domain=mesh)) * sqrt(expect))


def test_facet_area(cell, mesh):
    expect = {"interval": 2.0,
              "triangle": 4.0,
              "quadrilateral": 4.0,
              "tetrahedron": 1.5}[cell]
    assert np.allclose(assemble(FacetArea(mesh)*ds), expect)


def test_miscellaneous():
    mesh = UnitSquareMesh(2, 1, quadrilateral=True)
    # firedrake_tpu Function dat is flat (nvert*gdim,); the reference's
    # dat.data is (nvert, gdim) — reshape for the same mutation
    coords = np.array(mesh.coordinates.dat).reshape(-1, 2)
    coords[:, 0] = np.sqrt(coords[:, 0])
    mesh.coordinates.dat = coords.reshape(-1)

    assert np.allclose(assemble(CellVolume(mesh)*dx), 2 - sqrt(2))
    assert np.allclose(assemble(CellVolume(mesh)*ds), 5 - 2*sqrt(2))
    assert np.allclose(sorted([assemble(CellVolume(mesh)('+')*dS),
                               assemble(CellVolume(mesh)('-')*dS)]),
                       [1 - 1/sqrt(2), 1/sqrt(2)])

    with pytest.raises((ValueError, NotImplementedError, TypeError)):
        assemble(FacetArea(mesh)*dx)

    assert np.allclose(assemble(FacetArea(mesh)*ds), 2*(3 - sqrt(2)))
    assert np.allclose(assemble(FacetArea(mesh)*dS), 1)
