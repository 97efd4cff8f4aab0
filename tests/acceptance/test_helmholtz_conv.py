"""Acceptance port of reference
tests/firedrake/regression/test_helmholtz.py (round-5 directive 8):
L2 convergence of CG Helmholtz on triangles and quadrilaterals at
degrees 1-4.  Adaptations: the file-mesh case uses a structured quad
mesh perturbed via coordinates (no unstructured-quad .msh fixture in
this repo); parallel variants are covered by tests/parallel."""
import numpy as np
import pytest

from firedrake_tpu import *


def helmholtz(r, quadrilateral=False, degree=2, mesh=None):
    if mesh is None:
        mesh = UnitSquareMesh(2 ** r, 2 ** r, quadrilateral=quadrilateral)
    V = FunctionSpace(mesh, "CG", degree)
    lmbda = 1
    u = TrialFunction(V)
    v = TestFunction(V)
    f = Function(V)
    expect = Function(V)
    x = SpatialCoordinate(mesh)
    f.interpolate((1+8*pi*pi)*cos(x[0]*pi*2)*cos(x[1]*pi*2))
    expect.interpolate(cos(x[0]*pi*2)*cos(x[1]*pi*2))
    a = (inner(grad(u), grad(v)) + lmbda * inner(u, v)) * dx
    L = inner(f, v) * dx
    assemble(a)
    assemble(L)
    sol = Function(V)
    solve(a == L, sol, solver_parameters={'ksp_type': 'cg'})
    return sqrt(assemble(inner(sol - expect, sol - expect) * dx)), sol, expect


def test_firedrake_helmholtz_serial():
    diff = np.array([helmholtz(i)[0] for i in range(3, 6)])
    conv = np.log2(diff[:-1] / diff[1:])
    assert (np.array(conv) > 2.8).all()


@pytest.mark.parametrize(('testcase', 'convrate'),
                         [((1, (4, 6)), 1.9),
                          ((2, (3, 6)), 2.9),
                          ((3, (2, 4)), 3.9),
                          ((4, (2, 4)), 4.7)])
def test_firedrake_helmholtz_scalar_convergence_on_quadrilaterals(testcase, convrate):
    degree, (start, end) = testcase
    l2err = np.zeros(end - start)
    for ii in [i + start for i in range(len(l2err))]:
        l2err[ii - start] = helmholtz(ii, quadrilateral=True, degree=degree)[0]
    assert (np.array([np.log2(l2err[i]/l2err[i+1])
                      for i in range(len(l2err)-1)]) > convrate).all()


def test_firedrake_helmholtz_on_perturbed_quadrilateral_mesh():
    # stands in for the unstructured-quad file mesh of the reference:
    # interior coordinate jitter breaks the structured special-casing
    mesh = UnitSquareMesh(8, 8, quadrilateral=True)
    coords = np.array(mesh.coordinates.dat)
    interior = ((coords[:, 0] > 1e-9) & (coords[:, 0] < 1 - 1e-9)
                & (coords[:, 1] > 1e-9) & (coords[:, 1] < 1 - 1e-9))
    rng = np.random.default_rng(7)
    coords[interior] += rng.uniform(-0.02, 0.02, coords[interior].shape)
    mesh.coordinates.dat = coords
    assert helmholtz(None, mesh=mesh)[0] <= 0.01
