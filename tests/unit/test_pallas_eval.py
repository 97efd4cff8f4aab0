"""Fused Pallas cell-kernel evaluation (compiler/pallas_eval.py) vs the
direct XLA trace — interpreter mode on CPU, value-exact agreement.

Reference role: the generated-kernel + wrapper-loop locality of
pyop2/codegen/builder.py:702, re-expressed as VMEM tile fusion.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from firedrake_tpu import (Constant, Function, FunctionSpace,
                           TestFunction, TrialFunction, UnitSquareMesh,
                           UnitCubeMesh, assemble, dx, grad, inner)
from firedrake_tpu.assemble import FormAssembler, _assembler_cache
from firedrake_tpu.compiler.pallas_eval import pallas_cell_eval


def _stencil_inputs(form, t=0):
    asm = FormAssembler(form)
    plan = asm._stencil
    assert plan is not None, "form must take the stencil path"
    coords = jnp.asarray(asm.mesh.coordinates.dat).astype(jnp.float32)
    coeffs = {c.count: jnp.asarray(c.dat).astype(jnp.float32)
              for c in asm.coefficients}
    consts = {c.count: jnp.asarray(c.values()).astype(jnp.float32)
              for c in asm.constants}
    ci = asm._compiled[0]
    kb = ci.cell_kernel_batched()
    ce, ws = plan.gather_cell_inputs(t, coords, coeffs, ci)
    cv = tuple(consts[c.count] for c in ci.constants)
    return kb, ce, ws, cv


def _check(form, t=0):
    kb, ce, ws, cv = _stencil_inputs(form, t)
    with jax.enable_x64(False):
        direct = kb(ce, ws, cv)
        fused = pallas_cell_eval(kb, ce, ws, cv, interpret=True)
    assert fused.shape == direct.shape
    np.testing.assert_allclose(np.asarray(fused), np.asarray(direct),
                               rtol=2e-6, atol=1e-7)


def test_p1_poisson_mass_both_types():
    mesh = UnitSquareMesh(5, 4)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    form = inner(grad(u), grad(v)) * dx + u * v * dx
    _check(form, t=0)
    _check(form, t=1)


def test_p2_with_coefficient_and_constant():
    mesh = UnitSquareMesh(4, 4)
    V = FunctionSpace(mesh, "CG", 2)
    u, v = TrialFunction(V), TestFunction(V)
    w = Function(V)
    w.dat = np.linspace(0.5, 1.5, V.dim)
    k = Constant(3.0)
    form = k * w * inner(grad(u), grad(v)) * dx
    _check(form)


def test_3d_tet_kernel():
    mesh = UnitCubeMesh(3, 3, 3)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    _check(inner(grad(u), grad(v)) * dx, t=3)


def test_blocking_pads_non_multiple():
    # C = 5*4*2 = 40 cells per type: forces edge padding to 128
    mesh = UnitSquareMesh(5, 4)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    _check(u * v * dx)


def test_end_to_end_flag_matches_default():
    """FDTPU_PALLAS=1 + FDTPU_PREC=f32 assembly (interpreted kernels on
    CPU) matches the plain f32 executor to f32 roundoff."""
    def build():
        _assembler_cache.clear()
        mesh = UnitSquareMesh(6, 6)
        V = FunctionSpace(mesh, "CG", 1)
        u, v = TrialFunction(V), TestFunction(V)
        A = assemble(inner(grad(u), grad(v)) * dx + u * v * dx)
        return np.asarray(jnp.asarray(A.channels))

    os.environ["FDTPU_PREC"] = "f32"
    try:
        base = build()
        os.environ["FDTPU_PALLAS"] = "1"
        fused = build()
    finally:
        os.environ.pop("FDTPU_PREC", None)
        os.environ.pop("FDTPU_PALLAS", None)
        _assembler_cache.clear()
    np.testing.assert_allclose(fused, base, rtol=1e-6, atol=1e-9)
