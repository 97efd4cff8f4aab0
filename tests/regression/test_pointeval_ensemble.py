"""Point evaluation + ensemble (reference: vertexonly/point-eval tests,
ensemble/ tests)."""
import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, VectorFunctionSpace, Function,
                           SpatialCoordinate, UnitSquareMesh, UnitCubeMesh,
                           as_vector, Ensemble, EnsembleFunction,
                           EnsembleFunctionSpace, PointNotInDomainError)


def test_at_scalar_p2():
    mesh = UnitSquareMesh(8, 8)
    V = FunctionSpace(mesh, "CG", 2)
    X = SpatialCoordinate(mesh)
    f = Function(V).interpolate(X[0] ** 2 + X[1])
    assert abs(f.at([0.3, 0.7]) - 0.79) < 1e-12
    vals = f.at(np.array([[0.1, 0.1], [0.55, 0.25]]))
    assert np.allclose(vals, [0.11, 0.5525])


def test_at_vector_and_quads():
    mesh = UnitSquareMesh(8, 8)
    W = VectorFunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    g = Function(W).interpolate(as_vector([X[0], 2 * X[1]]))
    assert np.allclose(g.at([0.25, 0.5]), [0.25, 1.0])
    mq = UnitSquareMesh(4, 4, quadrilateral=True)
    Vq = FunctionSpace(mq, "CG", 1)
    Xq = SpatialCoordinate(mq)
    fq = Function(Vq).interpolate(Xq[0] + Xq[1])
    assert abs(fq.at([0.3, 0.4]) - 0.7) < 1e-10


def test_at_3d_and_outside():
    mesh = UnitCubeMesh(3, 3, 3)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    f = Function(V).interpolate(X[0] + X[1] + X[2])
    assert abs(f.at([0.5, 0.5, 0.5]) - 1.5) < 1e-10
    with pytest.raises(PointNotInDomainError):
        f.at([2.0, 2.0, 2.0])
    v = f.at([2.0, 2.0, 2.0], dont_raise=True)
    assert np.isnan(v)


def test_ensemble_collectives():
    mesh = UnitSquareMesh(3, 3)
    V = FunctionSpace(mesh, "CG", 1)
    ens = Ensemble(n_members=4)
    ef = EnsembleFunction(EnsembleFunctionSpace(V, ens))
    for i, m in enumerate(ef.members):
        m.assign(float(i + 1))
    out = Function(V)
    ens.allreduce(ef, out)
    assert np.allclose(np.asarray(out.dat), 10.0)
    ens.allreduce(ef, out, op="max")
    assert np.allclose(np.asarray(out.dat), 4.0)
    ens.bcast(ef, root=2)
    assert all(np.allclose(np.asarray(m.dat), 3.0) for m in ef.members)


def test_cross_mesh_interpolation():
    """Function from a fine triangle mesh interpolated onto a coarse quad
    mesh (reference: CrossMeshInterpolator, interpolation.py:411).
    Error is the TARGET space's interpolation error (~h^2/8)."""
    from firedrake_tpu import errornorm
    mA = UnitSquareMesh(16, 16)
    VA = FunctionSpace(mA, "CG", 2)
    XA = SpatialCoordinate(mA)
    fA = Function(VA).interpolate(XA[0] ** 2 + XA[1])
    mB = UnitSquareMesh(5, 7, quadrilateral=True)
    VB = FunctionSpace(mB, "CG", 1)
    fB = Function(VB).interpolate(fA)
    XB = SpatialCoordinate(mB)
    assert errornorm(XB[0] ** 2 + XB[1], fB) < 0.02
    # nodal values are exact where the source is smooth
    assert abs(fB.at([0.2, 0.3]) - 0.34) < 1e-10


def test_at_on_manifold():
    """Point evaluation on immersed meshes (least-squares tangent-plane
    inversion; reference: Function.at on manifold meshes)."""
    import numpy as np
    from firedrake_tpu import (IcosahedralSphereMesh, FunctionSpace,
                               Function, SpatialCoordinate)
    mesh = IcosahedralSphereMesh(1.0, 3)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    f = Function(V).interpolate(X[2])
    pts = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0],
                    [0.577, 0.577, 0.577]])
    pts = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    vals = np.asarray(f.at(pts, tolerance=0.05))
    assert np.abs(vals - pts[:, 2]).max() < 0.05
