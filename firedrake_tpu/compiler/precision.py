"""Mixed-precision kernel execution (FDTPU_PREC=f32|bf16).

f64 is EMULATED on TPU: every elementwise op in the quadrature kernels
costs multiple hardware instructions, and f64 random gathers run ~2.8x
slower than f32 ones (measured 18.6 vs 6.6 ns/element on the v5e —
PERF_NOTES round 4).  Under FDTPU_PREC the executor therefore

  * casts kernel INPUTS (coordinates, coefficients, constants) to the
    reduced dtype before any gather, so the gathers themselves move
    narrow elements,
  * traces the quadrature kernel with x64 disabled, so tabulation
    tables and literals materialize at f32 and the whole local-tensor
    computation stays in hardware-native arithmetic,
  * ACCUMULATES in f64: local tensors are widened before (or the value
    gathers immediately after) the global scatter/pad accumulation, so
    summation order effects stay at f64 roundoff on top of a one-time
    f32 quadrature error (~1e-7 relative per entry).

The reference has no analogue (PETSc assembles at PetscScalar
precision throughout); this is the TPU-native answer to the roofline
directive in BASELINE.json (>50% HBM on assembly needs hardware-rate
arithmetic, reference docs/source/parallelism.rst:41-45 characterizes
assembly as STREAM-bound).

bf16 note: with x64 disabled the tabulation constants are f32, so
bf16 inputs give "bf16 storage + gathers, f32 compute" — the dot/mul
operands upcast at the MXU/VPU boundary for free.
"""
from __future__ import annotations

import os
from contextlib import nullcontext

import jax
import jax.numpy as jnp

_DTYPES = {"f32": jnp.float32, "bf16": jnp.bfloat16}


def kernel_dtype():
    """The reduced compute dtype requested via FDTPU_PREC, or None
    (full f64, the default)."""
    return _DTYPES.get(os.environ.get("FDTPU_PREC", ""), None)


def trace_ctx(prec):
    """Context manager for kernel TRACING: with a reduced dtype active,
    disable x64 so in-kernel constants materialize at f32."""
    return jax.enable_x64(False) if prec is not None else nullcontext()


def castf(x, prec):
    """Cast a floating array to the reduced dtype (ints and None pass
    through; python scalars pass through — they are weakly typed)."""
    if prec is None or x is None or not hasattr(x, "dtype"):
        return x
    if jnp.issubdtype(x.dtype, jnp.floating):
        return x.astype(prec)
    return x


def castf_map(d, prec):
    """castf over a dict's values."""
    if prec is None:
        return d
    return {k: castf(v, prec) for k, v in d.items()}


def widen(x):
    """Back to full precision for accumulation (complex data stays
    complex — the complex scalar mode never runs reduced)."""
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return x.astype(jnp.complex128)
    return x.astype(jnp.float64)
