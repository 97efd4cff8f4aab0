"""Acceptance port of reference
tests/firedrake/regression/test_bubble.py (round-5 directive 8):
bubble function spaces and nodal enrichment.  The BDFM case is
retained; it exercises curl + interior BDFM dofs."""
import pytest
import numpy as np

from firedrake_tpu import *


def test_simple():
    mesh = UnitTriangleMesh()
    V = FunctionSpace(mesh, "B", 3)
    x = SpatialCoordinate(mesh)
    u = project(27*x[0]*x[1]*(1-x[0]-x[1]), V)
    assert (np.asarray(u.dat)[0] - 1.0) < 1e-14


def test_enrichment():
    mesh = UnitTriangleMesh()
    x = SpatialCoordinate(mesh)
    P2 = FiniteElement("CG", "triangle", 2)
    Bub = FiniteElement("Bubble", "triangle", 3)
    P2B3 = P2 + Bub
    V = FunctionSpace(mesh, P2B3)
    W = FunctionSpace(mesh, "CG", 3)
    u = project(27*x[0]*x[1]*(1-x[0]-x[1]), V)
    exact = Function(W)
    exact.interpolate(27*x[0]*x[1]*(1-x[0]-x[1]))
    assert sqrt(assemble((u-exact)*(u-exact)*dx)) < 1e-14


def test_BDFM():
    mesh = UnitTriangleMesh()
    x = SpatialCoordinate(mesh)
    P2 = FiniteElement("CG", "triangle", 2)
    Bub = FiniteElement("Bubble", "triangle", 3)
    P2B3 = P2 + Bub
    V0 = FunctionSpace(mesh, P2B3)
    V1 = FunctionSpace(mesh, "BDFM", 2)
    u = project(27*x[0]*x[1]*(1-x[0]-x[1]), V0)

    v = TrialFunction(V1)
    w = TestFunction(V1)
    out = Function(V1)
    solve(inner(v, w)*dx == inner(curl(u), w)*dx, out)
    # known result: the interior BDFM dofs are excited
    a = np.sort(np.asarray(out.dat))
    assert (abs(a[1:7]) < 1e-12).all()
    assert abs(a[7] + a[0]) < 1e-12
    assert abs(a[8] + a[0]) < 1e-12
