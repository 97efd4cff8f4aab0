"""Cell-axis kernel chunking (FDTPU_KERNEL_BYTES): bounds the live
quadrature intermediate at north-star scale (the 16M-dof RHS tripped an
18 GB allocation, and the first lax.map-based chunking OOMed HBM via
full stacked input copies — PERF_NOTES round 5).  Chunked and
unchunked assemblies must agree to roundoff."""
import os

import numpy as np
import pytest

from firedrake_tpu import (FunctionSpace, Function, SpatialCoordinate,
                           TestFunction, TrialFunction, UnitSquareMesh,
                           assemble, dx, grad, inner, sin)
from firedrake_tpu.assemble import _assembler_cache


@pytest.fixture
def chunked():
    _assembler_cache.clear()
    os.environ["FDTPU_KERNEL_BYTES"] = "250000"   # ~2 chunks at 32x32
    os.environ["FDTPU_NO_STENCIL"] = "1"          # exercise the gather path
    yield
    os.environ.pop("FDTPU_KERNEL_BYTES", None)
    os.environ.pop("FDTPU_NO_STENCIL", None)
    _assembler_cache.clear()


def _setup():
    mesh = UnitSquareMesh(32, 32)                 # 2048 cells > chunk
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = Function(V).interpolate(sin(X[0]) * X[1])
    return V, u, v, f


def test_chunked_matrix_matches(chunked):
    V, u, v, f = _setup()
    A = assemble(inner(grad(u), grad(v)) * dx + f * u * v * dx)
    chunked_vals = np.asarray(A.to_scipy().todense())
    _assembler_cache.clear()
    os.environ.pop("FDTPU_KERNEL_BYTES", None)
    B = assemble(inner(grad(u), grad(v)) * dx + f * u * v * dx)
    np.testing.assert_allclose(chunked_vals,
                               np.asarray(B.to_scipy().todense()),
                               atol=1e-13)


def test_chunked_vector_matches(chunked):
    V, u, v, f = _setup()
    b = np.asarray(assemble(f * v * dx).dat)
    _assembler_cache.clear()
    os.environ.pop("FDTPU_KERNEL_BYTES", None)
    b2 = np.asarray(assemble(f * v * dx).dat)
    np.testing.assert_allclose(b, b2, atol=1e-15)


def test_chunk_size_bound():
    from firedrake_tpu.assemble import _kernel_chunk
    import jax.numpy as jnp

    class FakeCI:
        def local_shape(self):
            return (3, 3)

        def num_quad_points(self):
            return 6

    ce = jnp.zeros((3, 2, 5000))
    os.environ["FDTPU_KERNEL_BYTES"] = str(3 * 3 * 6 * 8 * 2000)
    try:
        c = _kernel_chunk(FakeCI(), ce)
        assert c == 2000
    finally:
        os.environ.pop("FDTPU_KERNEL_BYTES", None)
    assert _kernel_chunk(FakeCI(), ce) is None    # default fits easily
