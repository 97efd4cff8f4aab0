"""Compiler-level unit tests with no mesh/solver (reference analogue:
tests/tsfc/ — e.g. test_sum_factorisation.py style kernel-only checks)."""
import math

import numpy as np
import pytest

from firedrake_tpu.elements import (make_quadrature, Lagrange,
                                    DiscontinuousLagrange, VectorElement,
                                    by_name)

CELLS = ["interval", "triangle", "tetrahedron", "quadrilateral",
         "hexahedron"]


@pytest.mark.parametrize("cell", CELLS)
@pytest.mark.parametrize("deg", [1, 2, 3, 5, 8])
def test_quadrature_exactness(cell, deg):
    q = make_quadrature(cell, deg)
    vol = by_name(cell).volume
    assert abs(q.weights.sum() - vol) < 1e-12
    val = (q.weights * q.points[:, 0] ** deg).sum()
    if cell in ("interval", "quadrilateral", "hexahedron"):
        exact = 1 / (deg + 1)
    elif cell == "triangle":
        exact = math.factorial(deg) / math.factorial(deg + 2)
    else:
        exact = math.factorial(deg) / math.factorial(deg + 3)
    assert abs(val - exact) < 1e-12


@pytest.mark.parametrize("cell", CELLS)
@pytest.mark.parametrize("deg", [1, 2, 3])
def test_lagrange_basis(cell, deg):
    e = Lagrange(cell, deg)
    q = make_quadrature(cell, 2 * deg)
    t = e.tabulate(q.points, order=1)
    # partition of unity & gradient sum zero
    assert np.allclose(t[0].sum(axis=1), 1.0)
    assert np.allclose(t[1].sum(axis=1), 0.0, atol=1e-10)
    # nodal (Kronecker) property
    tn = e.tabulate(e.nodes, order=0)
    assert np.allclose(tn[0], np.eye(e.ndof), atol=1e-9)
    # entity dof counts add up
    tot = sum(len(d) for ent in e.entity_dofs.values()
              for d in ent.values())
    assert tot == e.ndof


@pytest.mark.parametrize("cell", CELLS)
def test_dg0(cell):
    e = DiscontinuousLagrange(cell, 0)
    assert e.ndof == 1 and e.is_dg


def test_edge_orientation_flip():
    e = Lagrange("triangle", 3)
    assert list(e.entity_permutation(1, 0)) == [0, 1]
    assert list(e.entity_permutation(1, 1)) == [1, 0]
    e2 = Lagrange("triangle", 4)
    assert list(e2.entity_permutation(1, 1)) == [2, 1, 0]


def test_vector_element_layout():
    v = VectorElement(Lagrange("triangle", 2), 2)
    assert v.ndof == 12
    assert v.value_shape == (2,)
    ed = v.entity_dofs
    # vertex 0 holds dofs [0, 1] (node-major, component-minor)
    assert ed[0][0] == [0, 1]
