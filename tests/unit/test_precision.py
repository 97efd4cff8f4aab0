"""Mixed-precision kernel execution (FDTPU_PREC, compiler/precision.py).

Kernel math runs at f32/bf16 (f64 is emulated on TPU; f32 gathers are
~2.8x faster), accumulation stays f64.  The reference has no analogue
(PETSc assembles at PetscScalar throughout) — this is the TPU-native
roofline lever (reference docs/source/parallelism.rst:41-45 calls
assembly STREAM-bound; narrower elements = more dofs per byte).
"""
import numpy as np
import pytest

import sys

import firedrake_tpu  # noqa: F401 — ensure the submodule is registered
from firedrake_tpu import (DirichletBC, Function, FunctionSpace,
                           SpatialCoordinate, TestFunction, TrialFunction,
                           UnitSquareMesh, assemble, ds, dx, grad, inner,
                           sin, solve)

_asm = sys.modules["firedrake_tpu.assemble"]


def _assemble_pair(monkeypatch, prec, stencil):
    """(A, b) under the given FDTPU_PREC on the chosen executor path."""
    if prec is None:
        monkeypatch.delenv("FDTPU_PREC", raising=False)
    else:
        monkeypatch.setenv("FDTPU_PREC", prec)
    if not stencil:
        monkeypatch.setenv("FDTPU_NO_STENCIL", "1")
    _asm._assembler_cache.clear()
    mesh = UnitSquareMesh(12, 12)
    V = FunctionSpace(mesh, "CG", 2)
    u, v = TrialFunction(V), TestFunction(V)
    x, y = SpatialCoordinate(mesh)
    f = Function(V).interpolate(sin(3.0 * x) * (1.0 + y))
    A = assemble((inner(grad(u), grad(v)) + f * u * v) * dx + u * v * ds)
    b = assemble(f * v * dx)
    _asm._assembler_cache.clear()
    return np.asarray(A.to_dense()), np.asarray(b.dat)


@pytest.mark.parametrize("stencil", [True, False],
                         ids=["stencil", "gather"])
@pytest.mark.parametrize("prec,tol", [("f32", 5e-6), ("bf16", 2e-1)])
def test_reduced_precision_assembly(monkeypatch, prec, tol, stencil):
    A64, b64 = _assemble_pair(monkeypatch, None, stencil)
    Ap, bp = _assemble_pair(monkeypatch, prec, stencil)
    # outputs are ALWAYS f64 (accumulation dtype) ...
    assert Ap.dtype == np.float64 and bp.dtype == np.float64
    # ... at reduced-precision quadrature accuracy
    assert np.abs(Ap - A64).max() / np.abs(A64).max() < tol
    assert np.abs(bp - b64).max() / np.abs(b64).max() < tol
    # and genuinely different from the f64 path (the cast happened)
    assert np.abs(Ap - A64).max() > 0


def test_precision_cache_keyed_on_flag(monkeypatch):
    """Changing FDTPU_PREC must not reuse a stale jitted assembler."""
    A64, _ = _assemble_pair(monkeypatch, None, True)
    A32, _ = _assemble_pair(monkeypatch, "f32", True)
    A64b, _ = _assemble_pair(monkeypatch, None, True)
    assert np.array_equal(A64, A64b)
    assert not np.array_equal(A64, A32)


def test_f32_solve_converges(monkeypatch):
    """An f32-assembled Poisson system still solves to its own
    discretization accuracy."""
    monkeypatch.setenv("FDTPU_PREC", "f32")
    _asm._assembler_cache.clear()
    mesh = UnitSquareMesh(16, 16)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    x, y = SpatialCoordinate(mesh)
    exact = x * (1 - x) * y * (1 - y)
    f = 2 * (x * (1 - x) + y * (1 - y))
    uh = Function(V)
    solve(inner(grad(u), grad(v)) * dx == f * v * dx, uh,
          bcs=DirichletBC(V, 0.0, "on_boundary"),
          solver_parameters={"ksp_rtol": 1e-8})
    ex = Function(V).interpolate(exact)
    err = np.abs(np.asarray(uh.dat) - np.asarray(ex.dat)).max()
    _asm._assembler_cache.clear()
    assert err < 2e-3
