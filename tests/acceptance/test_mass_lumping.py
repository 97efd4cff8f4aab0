"""Acceptance port of reference
tests/firedrake/regression/test_mass_lumping.py (round-5 directive 8):
spectral mass lumping — a GLL collocation rule makes the Q_k mass
matrix diagonal on quads/hexes (and their extrusions), and the
diagonal equals the lumped row sums.  Adaptations: the GLL rule is
built with numpy (scipy Jacobi roots) instead of FIAT/finat; matrix
inspection uses .M.values instead of petscmat."""
import numpy as np
import pytest

from firedrake_tpu import *
from firedrake_tpu.elements.quadrature import QuadratureRule


def gll_points_weights(degree):
    """GLL nodes/weights on [0, 1] with degree+1 points."""
    n = degree + 1
    # interior nodes: roots of P'_{n-1} = Jacobi(1,1) polynomial roots
    from scipy.special import roots_jacobi, eval_legendre
    if n > 2:
        xi, _ = roots_jacobi(n - 2, 1.0, 1.0)
    else:
        xi = np.zeros(0)
    x = np.concatenate([[-1.0], xi, [1.0]])
    w = 2.0 / (n * (n - 1) * eval_legendre(n - 1, x) ** 2)
    return (x + 1) / 2, w / 2


def gll_cube_rule(dimension, degree):
    x1, w1 = gll_points_weights(degree)
    pts, wts = x1[:, None], w1
    for _ in range(1, dimension):
        npts = pts.shape[0]
        pts = np.concatenate(
            [np.repeat(pts, len(x1), axis=0),
             np.tile(x1, npts)[:, None]], axis=1)
        wts = (wts[:, None] * w1[None, :]).ravel()
    cell = {1: "interval", 2: "quad", 3: "hex"}[dimension]
    return QuadratureRule(cell, 2 * degree - 1, pts, wts)


@pytest.fixture(params=[(dim, extruded)
                        for dim in (1, 2, 3) for extruded in (False, True)],
                ids=lambda p: f"dim{p[0]}{'-extruded' if p[1] else ''}")
def mesh(request):
    dim, extruded = request.param
    nx = 2
    if dim == 3 and extruded:
        # extruding a hexahedral mesh makes 4-D tesseract cells; the
        # reference's TensorProductElement generality covers it, this
        # framework's cells stop at 3-D (documented envelope edge)
        pytest.skip("4-D extruded-hex cells unsupported")
    if dim == 1:
        mesh = UnitIntervalMesh(nx)
    elif dim == 2:
        mesh = UnitSquareMesh(nx, nx, quadrilateral=True)
    elif dim == 3:
        mesh = UnitCubeMesh(nx, nx, nx, hexahedral=True)
    if extruded:
        mesh = ExtrudedMesh(mesh, nx)
    return mesh


@pytest.mark.parametrize("degree", (3, 4))
def test_spectral_mass_lumping(mesh, degree):
    V = FunctionSpace(mesh, "Lagrange", degree)

    dimension = mesh.topological_dimension
    quad_rule = gll_cube_rule(dimension=dimension, degree=degree)

    u = TrialFunction(V)
    v = TestFunction(V)
    a = inner(u, v)*dx(scheme=quad_rule)
    A = assemble(a).M.values
    Adiag = np.diag(A).copy()

    # the matrix is diagonal
    assert np.allclose(A - np.diag(Adiag), 0)

    # the diagonal equals the action on 1
    f = assemble(inner(1, v)*dx)
    assert np.allclose(np.asarray(f.dat), Adiag)

    # matfree diagonal assembly agrees
    adiag = assemble(a, diagonal=True)
    assert np.allclose(np.asarray(f.dat), np.asarray(adiag.dat))
