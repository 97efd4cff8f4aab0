"""Structured-mesh stencil fast path (assembly/stencil.py) vs the
general gather path — exactness, matrix API surface, and fallback
behavior.  Reference parity target: assembly must be bit-level
equivalent to the general executor (firedrake/assemble.py:48)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from firedrake_tpu import (
    DirichletBC, Function, FunctionSpace, SpatialCoordinate, TestFunction,
    TrialFunction, UnitSquareMesh, VectorFunctionSpace, assemble, div, dx,
    grad, inner, solve, errornorm, sin,
)
from firedrake_tpu.assemble import FormAssembler
from firedrake_tpu.assembly.stencil import StencilMatrix


def _pair(form):
    """(stencil result, gather result) for the same form."""
    a1 = FormAssembler(form)
    os.environ["FDTPU_NO_STENCIL"] = "1"
    try:
        a2 = FormAssembler(form)
    finally:
        os.environ.pop("FDTPU_NO_STENCIL")
    assert a2._stencil is None
    return a1, a2


@pytest.mark.parametrize("kind", ["left", "right", "quad"])
def test_rank2_matches_gather(kind):
    mesh = (UnitSquareMesh(5, 4, quadrilateral=True) if kind == "quad"
            else UnitSquareMesh(5, 4, diagonal=kind))
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    a = inner(grad(u), grad(v)) * dx + (1 + X[0] * X[1]) * u * v * dx
    a1, a2 = _pair(a)
    assert a1._stencil is not None
    A1, A2 = a1.assemble(), a2.assemble()
    assert isinstance(A1, StencilMatrix)
    assert np.abs(A1.to_dense() - A2.to_dense()).max() < 1e-13
    assert A1.nnz == A2.sparsity.nnz


def test_matrix_api_surface():
    mesh = UnitSquareMesh(6, 5)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    a = inner(grad(u), grad(v)) * dx + u * v * dx
    a1, a2 = _pair(a)
    A1, A2 = a1.assemble(), a2.assemble()
    x = np.random.default_rng(3).standard_normal(V.dim)
    assert np.abs(np.asarray(A1.matvec(x))
                  - np.asarray(A2.matvec(x))).max() < 1e-13
    assert np.abs(np.asarray(A1.transpose_matvec(x))
                  - np.asarray(A2.transpose_matvec(x))).max() < 1e-13
    assert np.abs(np.asarray(A1.diagonal())
                  - np.asarray(A2.diagonal())).max() < 1e-14
    bc = DirichletBC(V, 0.0, (1, 3))
    rows = jnp.asarray(bc.dof_indices)
    D1 = A1.with_dirichlet(rows).to_dense()
    D2 = A2.with_dirichlet(rows).to_dense()
    assert np.abs(D1 - D2).max() < 1e-14
    assert np.abs(np.asarray(A1.to_dense_device()) - A1.to_dense()).max() \
        < 1e-14


def test_rank1_with_coefficients():
    mesh = UnitSquareMesh(7, 3)
    V = FunctionSpace(mesh, "CG", 1)
    W = VectorFunctionSpace(mesh, "CG", 1)
    v = TestFunction(V)
    X = SpatialCoordinate(mesh)
    w = Function(V)
    w.interpolate(X[0] ** 2 + X[1])
    beta = Function(W)
    beta.interpolate(X)
    L = (w * v + inner(beta, grad(v)) + inner(grad(w), grad(v))) * dx
    a1, a2 = _pair(L)
    assert a1._stencil is not None
    b1 = np.asarray(a1.assemble().dat)
    b2 = np.asarray(a2.assemble().dat)
    assert np.abs(b1 - b2).max() < 1e-14


def test_fallback_cases():
    from firedrake_tpu import ds
    mesh = UnitSquareMesh(4, 4)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    # facet integral -> no stencil
    assert FormAssembler(inner(grad(u), grad(v)) * dx
                         + u * v * ds)._stencil is None
    # P2 (no grid numbering yet on this space) may or may not stencil;
    # crossed-diagonal meshes never do
    mc = UnitSquareMesh(4, 4, diagonal="crossed")
    Vc = FunctionSpace(mc, "CG", 1)
    uc, vc = TrialFunction(Vc), TestFunction(Vc)
    assert FormAssembler(uc * vc * dx)._stencil is None


def test_end_to_end_poisson_solve():
    import math
    mesh = UnitSquareMesh(24, 24)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = 2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1])
    uh = Function(V)
    bc = DirichletBC(V, 0.0, "on_boundary")
    solve(inner(grad(u), grad(v)) * dx == f * v * dx, uh, bcs=[bc])
    ex = Function(V)
    ex.interpolate(sin(math.pi * X[0]) * sin(math.pi * X[1]))
    assert errornorm(ex, uh) < 1e-3


# --------------------------------------------------------------- 3D path
@pytest.mark.parametrize("hexa,deg", [(False, 1), (False, 2),
                                      (True, 1), (True, 2)])
def test_3d_rank2_matches_gather(hexa, deg):
    from firedrake_tpu import UnitCubeMesh, interpolate
    mesh = UnitCubeMesh(3, 2, 2, hexahedral=hexa)
    V = FunctionSpace(mesh, "CG", deg)
    assert V.sdata.grid_numbered
    u, v = TrialFunction(V), TestFunction(V)
    x, y, z = SpatialCoordinate(mesh)
    w = interpolate(x * y + z, V)
    a = (inner(grad(u), grad(v)) + w * u * v) * dx
    a1, a2 = _pair(a)
    assert a1._stencil is not None
    A1, A2 = a1.assemble(), a2.assemble()
    assert isinstance(A1, StencilMatrix)
    assert np.abs(A1.to_dense() - A2.to_dense()).max() < 1e-13
    b1 = np.asarray(a1.__class__(w * v * dx).assemble().dat)
    os.environ["FDTPU_NO_STENCIL"] = "1"
    try:
        b2 = np.asarray(FormAssembler(w * v * dx).assemble().dat)
    finally:
        os.environ.pop("FDTPU_NO_STENCIL")
    assert np.abs(b1 - b2).max() < 1e-13


def test_3d_matrix_ops_and_bcs():
    from firedrake_tpu import UnitCubeMesh
    mesh = UnitCubeMesh(3, 3, 2)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    a = inner(grad(u), grad(v)) * dx + u * v * dx
    a1, a2 = _pair(a)
    A1, A2 = a1.assemble(), a2.assemble()
    x = np.random.default_rng(5).standard_normal(V.dim)
    assert np.abs(np.asarray(A1.matvec(x))
                  - np.asarray(A2.matvec(x))).max() < 1e-13
    assert np.abs(np.asarray(A1.transpose_matvec(x))
                  - np.asarray(A2.transpose_matvec(x))).max() < 1e-13
    assert np.abs(np.asarray(A1.diagonal())
                  - np.asarray(A2.diagonal())).max() < 1e-14
    bc = DirichletBC(V, 0.0, (1, 6))
    rows = jnp.asarray(bc.dof_indices)
    D1 = A1.with_dirichlet(rows).to_dense()
    D2 = A2.with_dirichlet(rows).to_dense()
    assert np.abs(D1 - D2).max() < 1e-14
    assert A1.nnz == A2.sparsity.nnz
