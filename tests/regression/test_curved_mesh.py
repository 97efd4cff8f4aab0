"""Curved (higher-order geometry) meshes: Mesh(coordinate_function).

Reference: firedrake/mesh.py:3275 Mesh factory accepting a coordinate
Function -> make_mesh_from_coordinates (mesh.py:3085); exercised by
tests/firedrake/regression/test_poisson_sphere.py-style curved-geometry
convergence tests.
"""
import numpy as np
import pytest

from firedrake_tpu import *


def _curved_disk(ref, degree):
    """Unit disk with degree-k coordinates, boundary nodes snapped to
    the unit circle. Returns (affine_mesh, curved_mesh)."""
    m = UnitDiskMesh(ref)
    V = VectorFunctionSpace(m, "CG", degree)
    f = interpolate(SpatialCoordinate(m), V)
    dat = np.asarray(f.dat).reshape(-1, 2).copy()
    bn = np.asarray(V.boundary_nodes("on_boundary"))
    dat[bn] /= np.linalg.norm(dat[bn], axis=1, keepdims=True)
    f.dat = dat.reshape(-1)
    return m, Mesh(f)


def test_exact_quadratic_map():
    # Coordinates (x, y*(1+x)) on the unit square: detJ = 1+x exactly
    # representable by P2 coords, so area = 3/2 and int(x) = 5/6 must
    # come out to quadrature precision.
    m = UnitSquareMesh(4, 4)
    V = VectorFunctionSpace(m, "CG", 2)
    x, y = SpatialCoordinate(m)
    f = interpolate(as_vector([x, y * (1 + x)]), V)
    mc = Mesh(f)
    assert mc._coord_degree == 2
    area = assemble(1 * dx(domain=mc))
    assert abs(area - 1.5) < 1e-12
    X, Y = SpatialCoordinate(mc)
    assert abs(assemble(X * dx(domain=mc)) - 5.0 / 6.0) < 1e-12


def test_disk_area_superconverges():
    m, mc = _curved_disk(2, 2)
    err_aff = abs(assemble(1 * dx(domain=m)) - np.pi)
    err_cur = abs(assemble(1 * dx(domain=mc)) - np.pi)
    assert err_cur < err_aff / 50


def test_disk_perimeter_and_normals():
    m, mc = _curved_disk(2, 2)
    err_aff = abs(assemble(1 * ds(domain=m)) - 2 * np.pi)
    err_cur = abs(assemble(1 * ds(domain=mc)) - 2 * np.pi)
    assert err_cur < err_aff / 50
    # divergence theorem through the curved facet normal:
    # int_G x.n ds = int div(x) dx = 2*area
    X = SpatialCoordinate(mc)
    n = FacetNormal(mc)
    flux = assemble(dot(X, n) * ds(domain=mc))
    area = assemble(1 * dx(domain=mc))
    assert abs(flux - 2 * area) < 1e-10


def test_poisson_curved_disk():
    # -lap(u) = 1, u = 0 on the unit circle; exact u = (1 - r^2)/4.
    # Quadratic geometry: the boundary error drops from the affine
    # O(h^2) geometric consistency floor.
    errs = {}
    for geo_deg in (1, 2):
        m, mc = _curved_disk(2, 2)
        mm = m if geo_deg == 1 else mc
        V = FunctionSpace(mm, "CG", 2)
        u, v = TrialFunction(V), TestFunction(V)
        bc = DirichletBC(V, 0.0, "on_boundary")
        sol = Function(V)
        solve(inner(grad(u), grad(v)) * dx == 1.0 * v * dx, sol, bcs=[bc])
        X = SpatialCoordinate(mm)
        exact = (1 - X[0] ** 2 - X[1] ** 2) / 4
        errs[geo_deg] = errornorm(exact, sol)
    assert errs[2] < errs[1] / 5


def test_cell_volume_diameter_curved():
    m = UnitSquareMesh(3, 3)
    V = VectorFunctionSpace(m, "CG", 2)
    x, y = SpatialCoordinate(m)
    f = interpolate(as_vector([x, y * (1 + x)]), V)
    mc = Mesh(f)
    v = FunctionSpace(mc, "DG", 0)
    vol = interpolate(CellVolume(mc), v)
    assert abs(np.asarray(vol.dat).sum() - 1.5) < 1e-10


def test_at_curved():
    # point evaluation Newton-inverts the curved coordinate map
    m = UnitSquareMesh(4, 4)
    V = VectorFunctionSpace(m, "CG", 2)
    x, y = SpatialCoordinate(m)
    f = interpolate(as_vector([x, y * (1 + x)]), V)
    mc = Mesh(f)
    W = FunctionSpace(mc, "CG", 2)
    X = SpatialCoordinate(mc)
    g = interpolate(X[0] + 2 * X[1], W)
    for (px, py) in [(0.31, 0.47), (0.62, 0.9), (0.05, 0.01)]:
        # physical point must be inside the mapped domain: y < 1+x
        assert abs(g.at([px, py]) - (px + 2 * py)) < 1e-8


def test_vtk_curved(tmp_path):
    import os
    m, mc = _curved_disk(1, 2)
    W = FunctionSpace(mc, "CG", 1)
    X = SpatialCoordinate(mc)
    g = interpolate(X[0], W)
    p = str(tmp_path / "curved.pvd")
    VTKFile(p).write(g)
    vtu = [f for f in os.listdir(tmp_path) if f.endswith(".vtu")]
    assert vtu
    txt = open(tmp_path / vtu[0], "rb").read()
    assert txt  # non-empty high-order output


# ---------------------------------------------------- curved Hessians
# Coordinate-map curvature terms in second-derivative pullbacks
# (reference: tsfc/fem.py:472-671 FInAT physical geometry).

def _quadratic_mesh():
    m = UnitSquareMesh(4, 4)
    V = VectorFunctionSpace(m, "CG", 2)
    x, y = SpatialCoordinate(m)
    f = interpolate(as_vector([x + 0.1 * y * y, y * (1 + 0.2 * x)]), V)
    return Mesh(f)


def test_curved_hessian_of_linear_is_zero():
    # u == X[0] lives exactly in P2 on a P2-coordinate mesh; its
    # PHYSICAL Hessian is identically zero.  Without the xi-Hessian
    # correction the reference Hessian (nonzero: u_ref is quadratic)
    # leaks through and this integral is O(1).
    mc = _quadratic_mesh()
    V = FunctionSpace(mc, "CG", 2)
    u = interpolate(SpatialCoordinate(mc)[0], V)
    h2 = assemble(inner(grad(grad(u)), grad(grad(u))) * dx(degree=8))
    assert abs(h2) < 1e-20


def test_curved_hessian_divergence_theorem():
    # Per-cell divergence theorem for a piecewise-smooth C0 function:
    # int div(grad u) dx == int_ext grad(u).n ds + int_int jump(grad u, n) dS.
    # The lhs runs through the new curved second-derivative path, the
    # rhs only through (verified) first derivatives and curved normals.
    mc = _quadratic_mesh()
    V = FunctionSpace(mc, "CG", 3)
    X, Y = SpatialCoordinate(mc)
    u = interpolate(X * X * Y + 0.5 * Y * Y, V)
    lhs = assemble(div(grad(u)) * dx(degree=12, domain=mc))
    n = FacetNormal(mc)
    rhs = assemble(dot(grad(u), n) * ds(degree=12, domain=mc)) \
        + assemble(jump(grad(u), n) * dS(degree=12, domain=mc))
    assert abs(lhs - rhs) < 1e-10


def test_curved_negative_jacobian_raises():
    # A coordinate field that folds cells over must be rejected at
    # Mesh() build time (silently wrong signed measures otherwise).
    m = UnitSquareMesh(4, 4)
    V = VectorFunctionSpace(m, "CG", 2)
    x, y = SpatialCoordinate(m)
    f = interpolate(as_vector([x * (1 - x) * 4, y]), V)   # x-fold at 0.5
    with pytest.raises(ValueError):
        Mesh(f)
