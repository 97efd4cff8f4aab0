"""The flat (C,)-vector lowering (compiler/flat.py) — TPU-layout
production path, forced on here via FDTPU_FLAT=1 and checked against
the standard lowering (PERF_NOTES.md round 2)."""
import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, VectorFunctionSpace, Function,
                           TestFunction, TrialFunction, SpatialCoordinate,
                           UnitSquareMesh, UnitCubeMesh, Constant, inner,
                           grad, div, dx, sin, assemble)


@pytest.fixture
def force_flat(monkeypatch):
    monkeypatch.setenv("FDTPU_FLAT", "1")
    monkeypatch.delenv("FDTPU_NO_FLAT", raising=False)


def _assemble_both(a, monkeypatch):
    """Assemble with the flat path forced, then with it disabled.
    Distinct meshes per call elsewhere keep the assembler cache from
    short-circuiting the path choice."""
    from firedrake_tpu.assemble import FormAssembler
    monkeypatch.setenv("FDTPU_FLAT", "1")
    asm_flat = FormAssembler(a)
    assert any("coords_cols" in st for st in asm_flat._statics), \
        "flat path was not selected"
    monkeypatch.setenv("FDTPU_NO_FLAT", "1")
    asm_std = FormAssembler(a)
    monkeypatch.delenv("FDTPU_NO_FLAT")
    return asm_flat.assemble(), asm_std.assemble()


def test_flat_matrix_matches_standard_p1(monkeypatch):
    mesh = UnitSquareMesh(7, 5)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    w = Function(V).interpolate(1.0 + X[0] * X[1])
    a = (w * inner(grad(u), grad(v)) + u * v) * dx
    A1, A2 = _assemble_both(a, monkeypatch)
    d = np.abs(A1.to_dense() - A2.to_dense()).max()
    assert d < 1e-13, d


def test_flat_matrix_matches_standard_p2_3d(monkeypatch):
    mesh = UnitCubeMesh(2, 2, 2)
    V = FunctionSpace(mesh, "CG", 2)
    u, v = TrialFunction(V), TestFunction(V)
    a = inner(grad(u), grad(v)) * dx + u * v * dx
    A1, A2 = _assemble_both(a, monkeypatch)
    d = np.abs(A1.to_dense() - A2.to_dense()).max()
    assert d < 1e-12, d


def test_flat_residual_matches_standard(monkeypatch):
    mesh = UnitSquareMesh(6, 4)
    V = FunctionSpace(mesh, "CG", 2)
    v = TestFunction(V)
    X = SpatialCoordinate(mesh)
    w = Function(V).interpolate(sin(X[0]) + X[1] ** 2)
    c = Constant(2.5)
    F = (c * inner(grad(w), grad(v)) + inner(w * w, v)) * dx
    r1, r2 = _assemble_both(F, monkeypatch)
    d = np.abs(np.asarray(r1.dat) - np.asarray(r2.dat)).max()
    assert d < 1e-13, d


def test_flat_vector_space(monkeypatch):
    mesh = UnitSquareMesh(5, 3)
    V = VectorFunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    a = inner(grad(u), grad(v)) * dx + inner(div(u), div(v)) * dx
    A1, A2 = _assemble_both(a, monkeypatch)
    d = np.abs(A1.to_dense() - A2.to_dense()).max()
    assert d < 1e-13, d


def test_flat_solve_end_to_end(monkeypatch, force_flat):
    import math
    from firedrake_tpu import DirichletBC, solve, errornorm
    mesh = UnitSquareMesh(12, 12)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = 2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1])
    a = inner(grad(u), grad(v)) * dx
    L = f * v * dx
    bc = DirichletBC(V, 0.0, "on_boundary")
    uh = Function(V)
    solve(a == L, uh, bcs=[bc], solver_parameters={
        "ksp_type": "cg", "pc_type": "jacobi", "ksp_rtol": 1e-12})
    exact = sin(math.pi * X[0]) * sin(math.pi * X[1])
    assert errornorm(exact, uh) < 0.02
