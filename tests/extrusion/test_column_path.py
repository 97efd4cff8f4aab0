"""Extruded column-compressed assembly (assembly/columns.py): the
O(base) column numbering + dense-layer-axis fast path must match the
general gather path exactly (reference role:
cython/extrusion_numbering.pyx:222 column offsets, pyop2/types/set.py:307
ExtrudedSet layer extents, pyop2 column-walking wrappers)."""
import os

import numpy as np
import pytest

from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           TrialFunction, SpatialCoordinate, Constant,
                           UnitIntervalMesh, UnitSquareMesh, DirichletBC,
                           inner, grad, dx, solve, errornorm, assemble)
from firedrake_tpu.assemble import FormAssembler, _assembler_cache
from firedrake_tpu.mesh.utility import ExtrudedMesh


def _mesh(kind, n, nlay):
    if kind == "quad":
        return ExtrudedMesh(UnitIntervalMesh(n), nlay)
    if kind == "hex":
        return ExtrudedMesh(UnitSquareMesh(n, n, quadrilateral=True),
                            nlay)
    return ExtrudedMesh(UnitSquareMesh(n, n), nlay)


@pytest.mark.parametrize("kind,deg", [
    ("quad", 1), ("quad", 2), ("quad", 3),
    ("hex", 1), ("hex", 2),
    ("prism", 1), ("prism", 2),
])
def test_column_matches_gather_path(kind, deg):
    m = _mesh(kind, 2, 3)
    V = FunctionSpace(m, "CG", deg)
    assert V.sdata.column_numbered
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(m)
    d = m.geometric_dimension
    f = Function(V).interpolate(X[0] + X[d - 1] ** 2)
    a = (inner(grad(u), grad(v)) + f * inner(u, v)) * dx
    L = f * v * dx
    asm = FormAssembler(a)
    assert asm._column is not None, "column plan must apply"
    A = assemble(a)
    b = assemble(L)
    assert type(A).__name__ == "ColumnMatrix"
    os.environ["FDTPU_NO_COLUMN"] = "1"
    _assembler_cache.clear()
    try:
        A0 = assemble(a)
        b0 = assemble(L)
    finally:
        os.environ.pop("FDTPU_NO_COLUMN", None)
        _assembler_cache.clear()
    assert abs(A.to_scipy() - A0.to_scipy()).max() < 1e-13
    assert np.abs(np.asarray(b.dat) - np.asarray(b0.dat)).max() < 1e-13
    # operator protocol: matvec / transpose / diagonal vs scipy
    x = np.random.default_rng(7).standard_normal(V.dim)
    S = A0.to_scipy()
    assert np.abs(np.asarray(A.matvec(x)) - S @ x).max() < 1e-12
    assert np.abs(np.asarray(A.transpose_matvec(x)) - S.T @ x).max() < 1e-12
    assert np.abs(np.asarray(A.diagonal()) - S.diagonal()).max() < 1e-13


def test_column_bc_solve_hex():
    m = _mesh("hex", 3, 3)
    V = FunctionSpace(m, "CG", 1)
    X = SpatialCoordinate(m)
    g = Function(V).interpolate(1 + X[0] + 2 * X[2])
    u, v = TrialFunction(V), TestFunction(V)
    uh = Function(V)
    solve(inner(grad(u), grad(v)) * dx == inner(Constant(0.0), v) * dx,
          uh, bcs=[DirichletBC(V, g, "on_boundary")],
          solver_parameters={"ksp_type": "cg", "pc_type": "jacobi",
                             "ksp_rtol": 1e-12})
    assert errornorm(1 + X[0] + 2 * X[2], uh) < 1e-9


def test_column_numbering_is_base_times_layers():
    """node id == base_node * Hd + z (the extrusion_numbering contract)."""
    base = UnitSquareMesh(2, 2)
    m = ExtrudedMesh(base, 4)
    V = FunctionSpace(m, "CG", 2)
    col = V.sdata.column
    assert col is not None
    assert col.Hd == 2 * 4 + 1
    Vb = FunctionSpace(base, "CG", 2)
    assert col.nbase == Vb.num_nodes
    assert V.num_nodes == col.nbase * col.Hd
    # the map factors exactly
    cnm = V.cell_node_map
    nlay = 4
    b = np.arange(cnm.shape[0]) // nlay
    l = np.arange(cnm.shape[0]) % nlay
    pred = (col.base_map[b][:, col.sb] * col.Hd
            + l[:, None] * col.kz + col.sz[None, :])
    assert np.array_equal(cnm.astype(np.int64), pred)


def test_quad_hex_cg3_interpolation_exact():
    """TP barycentric-style entity keys: CG3+ on quads/hexes (was an
    IndexError in entity_permutation before round 3)."""
    m = UnitSquareMesh(2, 2, quadrilateral=True)
    V = FunctionSpace(m, "CG", 3)
    X = SpatialCoordinate(m)
    f = Function(V).interpolate(X[0] ** 3 + X[0] * X[1] ** 2)
    assert errornorm(X[0] ** 3 + X[0] * X[1] ** 2, f) < 1e-11
    mh = ExtrudedMesh(UnitSquareMesh(2, 2, quadrilateral=True), 2)
    Vh = FunctionSpace(mh, "CG", 3)
    Xh = SpatialCoordinate(mh)
    fh = Function(Vh).interpolate(Xh[0] ** 3 + Xh[1] * Xh[2] ** 2)
    assert errornorm(Xh[0] ** 3 + Xh[1] * Xh[2] ** 2, fh) < 1e-11
