"""Sum-factorized (spectral) assembly on tensor-product cells
(compiler/spectral.py; reference role: tsfc/spectral.py:197 spectral
mode + tsfc/tensor.py:93 tensor mode)."""
import os
import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu.assemble import _assembler_cache


@pytest.fixture(autouse=True)
def _no_stencil(monkeypatch):
    """Force the generic executor so the spectral plan (not the
    structured-mesh stencil plan) is what gets exercised."""
    monkeypatch.setenv("FDTPU_NO_STENCIL", "1")
    _assembler_cache.clear()
    yield
    _assembler_cache.clear()


def _perturbed(mesh, scale=0.08, seed=3):
    rng = np.random.default_rng(seed)
    g = mesh.geometric_dimension
    xy = np.asarray(mesh.coordinates.dat).reshape(-1, g).copy()
    inner = np.all((xy > 1e-9) & (xy < 1 - 1e-9), axis=1)
    xy[inner] += (rng.random(xy[inner].shape) - 0.5) * scale
    mesh.coordinates.dat = xy.reshape(-1)
    return mesh


def _forms(mesh, deg):
    V = fd.FunctionSpace(mesh, "CG", deg)
    u, v = fd.TrialFunction(V), fd.TestFunction(V)
    X = fd.SpatialCoordinate(mesh)
    c = fd.Function(fd.FunctionSpace(mesh, "CG", 1)).interpolate(
        1.0 + X[0] * X[1])
    a = (c * fd.inner(fd.grad(u), fd.grad(v)) + u * v) * fd.dx
    L = fd.sin(X[0]) * v * fd.dx
    return a, L


def _with(flag, form):
    os.environ["FDTPU_SPECTRAL"] = flag
    _assembler_cache.clear()
    try:
        return fd.assemble(form)
    finally:
        os.environ.pop("FDTPU_SPECTRAL", None)


@pytest.mark.parametrize("hexa,deg", [(False, 2), (False, 3),
                                      (True, 2), (True, 3)])
def test_spectral_matches_direct(hexa, deg):
    """Spectral and direct executors agree to round-off on non-affine
    (perturbed) meshes with a variable coefficient."""
    mesh = (_perturbed(fd.UnitCubeMesh(2, 2, 2, hexahedral=True)) if hexa
            else _perturbed(fd.UnitSquareMesh(4, 4, quadrilateral=True)))
    a, L = _forms(mesh, deg)
    A1 = np.asarray(_with("0", a).to_dense())
    A2 = np.asarray(_with("1", a).to_dense())
    assert np.abs(A1 - A2).max() < 1e-11 * max(1.0, np.abs(A1).max())
    b1 = np.asarray(_with("0", L).dat)
    b2 = np.asarray(_with("1", L).dat)
    assert np.abs(b1 - b2).max() < 1e-12


def test_spectral_selected_automatically():
    """Q3 hex cell integrals route through the spectral plan by default
    (no flag); Q1 stays on the direct path (probe overhead)."""
    from firedrake_tpu.assemble import FormAssembler
    mesh = fd.UnitCubeMesh(2, 2, 2, hexahedral=True)
    _perturbed(mesh)
    for deg, expect in ((3, True), (1, False)):
        a, _ = _forms(mesh, deg)
        _assembler_cache.clear()
        asm = FormAssembler(a)
        sts = asm._statics
        assert any((st.get("_spectral") is not None) == expect
                   for st in sts), (deg, expect)


def test_spectral_flops_scale():
    """The factorized contraction needs asymptotically fewer flops than
    the direct (ni, nj, nq) build: at Q4 on hexes the XLA flop count of
    the assembly program must be well under the direct path's."""
    import jax
    mesh = _perturbed(fd.UnitCubeMesh(2, 2, 2, hexahedral=True))
    V = fd.FunctionSpace(mesh, "CG", 4)
    u, v = fd.TrialFunction(V), fd.TestFunction(V)
    a = fd.inner(fd.grad(u), fd.grad(v)) * fd.dx

    def flops(flag):
        os.environ["FDTPU_SPECTRAL"] = flag
        _assembler_cache.clear()
        from firedrake_tpu.assemble import FormAssembler
        try:
            asm = FormAssembler(a)
            import jax.numpy as jnp
            coords = jnp.asarray(mesh.coordinates.dat)
            lowered = jax.jit(asm._run).lower(coords, {}, {})
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            return cost["flops"]
        finally:
            os.environ.pop("FDTPU_SPECTRAL", None)

    f_direct = flops("0")
    f_spec = flops("1")
    assert f_spec < 0.5 * f_direct, (f_spec, f_direct)


def test_spectral_dg0_mixed_degree():
    # DG0's node is the centroid, not a lattice point: the TP slot
    # factorization must treat it as the constant slot (or fall back)
    # rather than crash (advisor round-3 finding).
    from firedrake_tpu import (UnitSquareMesh, FunctionSpace, TestFunction,
                               TrialFunction, assemble, dx)
    m = UnitSquareMesh(3, 3, quadrilateral=True)
    V = FunctionSpace(m, "CG", 2)
    Q = FunctionSpace(m, "DG", 0)
    A = assemble(TrialFunction(Q) * TestFunction(V) * dx)
    import numpy as np
    col = np.asarray(A.to_dense()).sum(axis=0)
    # each column integrates the DG0 basis fn over its cell: |K| = 1/9
    assert np.allclose(col, 1.0 / 9.0, atol=1e-12)
