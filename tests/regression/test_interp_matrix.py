"""Interpolation matrices + adjoint interpolation (reference:
firedrake Interpolator with transpose=True — the data-assimilation
adjoint path)."""
import numpy as np

from firedrake_tpu import (FunctionSpace, VectorFunctionSpace, Function,
                           Cofunction, TrialFunction, SpatialCoordinate,
                           UnitSquareMesh, VertexOnlyMesh, as_vector)
from firedrake_tpu import Interpolator


def test_interp_matrix_matches_nodal():
    mesh = UnitSquareMesh(4, 4)
    Vs = FunctionSpace(mesh, "CG", 2)
    Vd = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    u = Function(Vs).interpolate(X[0] ** 2 + X[1])
    I = Interpolator(TrialFunction(Vs), Vd)
    f1 = I.interpolate(u)
    f2 = Function(Vd).interpolate(u)
    assert np.abs(np.asarray(f1.dat) - np.asarray(f2.dat)).max() < 1e-13


def test_interp_adjoint_identity():
    """<I u, w> == <u, I^T w> exactly."""
    mesh = UnitSquareMesh(4, 4)
    Vs = FunctionSpace(mesh, "CG", 2)
    Vd = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    u = Function(Vs).interpolate(X[0] ** 2 + X[1])
    I = Interpolator(TrialFunction(Vs), Vd)
    f = I.interpolate(u)
    w = np.random.RandomState(0).rand(Vd.dim)
    wc = Cofunction(Vd)
    wc.dat = w
    ad = I.interpolate(wc, adjoint=True)
    assert abs(float(w @ np.asarray(f.dat))
               - float(np.asarray(ad.dat) @ np.asarray(u.dat))) < 1e-12


def test_interp_matrix_vector_and_vom():
    mesh = UnitSquareMesh(4, 4)
    X = SpatialCoordinate(mesh)
    Vsv = VectorFunctionSpace(mesh, "CG", 2, dim=2)
    Vdv = VectorFunctionSpace(mesh, "CG", 1, dim=2)
    uv = Function(Vsv).interpolate(as_vector([X[0] ** 2, X[1]]))
    Iv = Interpolator(TrialFunction(Vsv), Vdv)
    fv = Iv.interpolate(uv)
    fref = Function(Vdv).interpolate(uv)
    assert np.abs(np.asarray(fv.dat)
                  - np.asarray(fref.dat)).max() < 1e-13

    Vs = FunctionSpace(mesh, "CG", 2)
    u = Function(Vs).interpolate(X[0] ** 2 + X[1])
    pts = np.array([[0.21, 0.33], [0.5, 0.5], [0.9, 0.1]])
    vm = VertexOnlyMesh(mesh, pts)
    P = FunctionSpace(vm, "DG", 0)
    Ivm = Interpolator(TrialFunction(Vs), P)
    g = Ivm.interpolate(u)
    assert np.abs(np.asarray(g.dat)
                  - (pts[:, 0] ** 2 + pts[:, 1])).max() < 1e-13
    wc = Cofunction(P)
    wc.dat = np.array([1.0, 2.0, -1.0])
    adj = Ivm.interpolate(wc, adjoint=True)
    lhs = float(np.asarray(wc.dat) @ np.asarray(g.dat))
    rhs = float(np.asarray(adj.dat) @ np.asarray(u.dat))
    assert abs(lhs - rhs) < 1e-12


def test_cross_mesh_outside_points_raise():
    # Cross-mesh interpolation onto a mesh that extends beyond the
    # source domain must raise PointNotInDomainError unless
    # allow_missing_dofs=True permits nearest-cell extrapolation
    # (reference: interpolation.py CrossMeshInterpolator).
    import pytest
    import numpy as np
    from firedrake_tpu import (RectangleMesh, UnitSquareMesh,
                               FunctionSpace, Function, interpolate,
                               SpatialCoordinate, Interpolator,
                               PointNotInDomainError)
    src_mesh = UnitSquareMesh(4, 4)
    dst_mesh = RectangleMesh(4, 4, 2.0, 1.0)      # extends to x = 2
    Vs = FunctionSpace(src_mesh, "CG", 1)
    Vd = FunctionSpace(dst_mesh, "CG", 1)
    x, y = SpatialCoordinate(src_mesh)
    f = interpolate(x + y, Vs)
    with pytest.raises(PointNotInDomainError):
        Interpolator(f, Vd).assemble()
    I = Interpolator(f, Vd, allow_missing_dofs=True).assemble()
    v = I.matvec(f.dat)
    assert np.isfinite(np.asarray(v)).all()
