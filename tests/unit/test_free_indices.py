"""Free-index (Einstein) notation: indices()/Index/implicit summation
(language/freeindex.py).  Reference surface: ufl.indices / Indexed /
IndexSum / ComponentTensor re-exported by firedrake/__init__.py:48-49."""
import numpy as np
import pytest

from firedrake_tpu import (
    FunctionSpace, SpatialCoordinate, TestFunction, TrialFunction,
    UnitSquareMesh, UnitCubeMesh, VectorFunctionSpace, as_matrix,
    as_vector, assemble, div, dot, dx, grad, indices, inner, interpolate,
    tr,
)


@pytest.fixture(scope="module")
def mesh():
    return UnitSquareMesh(4, 4)


def test_scalar_poisson_matches_grad_spelling(mesh):
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    i, = indices(1)
    A1 = assemble(u.dx(i) * v.dx(i) * dx).to_dense()
    A2 = assemble(inner(grad(u), grad(v)) * dx).to_dense()
    assert np.abs(A1 - A2).max() < 1e-14


def test_vector_laplacian_and_div(mesh):
    W = VectorFunctionSpace(mesh, "CG", 1)
    V = FunctionSpace(mesh, "CG", 1)
    uu, vv = TrialFunction(W), TestFunction(W)
    v = TestFunction(V)
    i, j = indices(2)
    B1 = assemble(uu[i].dx(j) * vv[i].dx(j) * dx).to_dense()
    B2 = assemble(inner(grad(uu), grad(vv)) * dx).to_dense()
    assert np.abs(B1 - B2).max() < 1e-14
    C1 = assemble(uu[i].dx(i) * v * dx).to_dense()
    C2 = assemble(div(uu) * v * dx).to_dense()
    assert np.abs(C1 - C2).max() < 1e-14


def test_component_tensor_and_trace(mesh):
    V = FunctionSpace(mesh, "CG", 1)
    W = VectorFunctionSpace(mesh, "CG", 1)
    v, vv = TestFunction(V), TestFunction(W)
    x, y = SpatialCoordinate(mesh)
    A = as_matrix([[1 + x, y], [0, 2]])
    b = as_vector([x, y])
    i, j = indices(2)
    w1 = as_vector(A[i, j] * b[j], i)            # ComponentTensor role
    d = assemble(inner(w1 - dot(A, b), vv) * dx)
    assert np.abs(np.asarray(d.dat)).max() < 1e-14
    t1 = assemble(A[i, i] * v * dx)              # repeated index == trace
    t2 = assemble(tr(A) * v * dx)
    assert np.abs(np.asarray(t1.dat) - np.asarray(t2.dat)).max() < 1e-14


def test_repeated_dx_is_laplacian(mesh):
    V2 = FunctionSpace(mesh, "CG", 2)
    x, y = SpatialCoordinate(mesh)
    f = interpolate(x * x + 3 * y * y, V2)
    i, = indices(1)
    assert abs(assemble(f.dx(i, i) * dx) - 8.0) < 1e-12


def test_3d_elasticity_like_form():
    m = UnitCubeMesh(2, 2, 2)
    W = VectorFunctionSpace(m, "CG", 1)
    u, v = TrialFunction(W), TestFunction(W)
    i, j = indices(2)
    eps_u = (u[i].dx(j) + u[j].dx(i)) / 2
    eps_v = (v[i].dx(j) + v[j].dx(i)) / 2
    A1 = assemble((2.0 * eps_u * eps_v + u[i].dx(i) * v[j].dx(j))
                  * dx).to_dense()
    from firedrake_tpu import sym
    e_u, e_v = sym(grad(u)), sym(grad(v))
    A2 = assemble((2.0 * inner(e_u, e_v) + div(u) * div(v))
                  * dx).to_dense()
    assert np.abs(A1 - A2).max() < 1e-13


def test_error_conditions(mesh):
    V = FunctionSpace(mesh, "CG", 1)
    W = VectorFunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    uu = TrialFunction(W)
    i, j = indices(2)
    with pytest.raises(ValueError):
        (u.dx(i) + v) * dx                       # mismatched free sets
    with pytest.raises(ValueError):
        (uu[i] * v) * dx                         # open index in integrand
    with pytest.raises(ValueError):
        u / uu[i]                                # free-index denominator
