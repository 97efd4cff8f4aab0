"""Pallas fused cell-kernel evaluation: the quadrature roofline lever.

PERF_NOTES round 4 profiled the f32 stencil assembly at 1024^2: of the
16.6 ms total, ~16.0 ms is the cell-kernel evaluation and the lax.pad
accumulation is ~free.  The kernel is a few hundred elementwise flops
per cell — the time is NOT arithmetic, it is XLA materializing every
(ni, nj, C) intermediate of the quadrature evaluation to HBM between
fusion islands (tens of multi-MB round trips for what should be one
read of the coordinate slots and one write of the local tensors).

The fix is structural, not algorithmic: evaluate the SAME traceable
kernel (`IntegralData.cell_kernel_batched`) inside ONE
`pl.pallas_call` blocked over the trailing cell axis C.  Every array
the batched lowering produces is pointwise in C (the cell-last
convention of compiler/batched.py: leading axes are the tiny local
tensor/quadrature dims, C is the minor/lane axis), so a C-block of the
inputs determines the same C-block of the output, and the whole
evaluation — Jacobians, inverses via closed forms, basis contractions,
quadrature reduction — happens on VMEM-resident tiles with zero HBM
intermediates.

Scope: the reduced-precision executors (FDTPU_PREC=f32|bf16) — Mosaic
has no f64 (f64 is an XLA-level emulation), so the full-f64 default
path keeps the XLA evaluation.  This composes: FDTPU_PREC casts the
inputs narrow and traces with x64 disabled; this module fuses that
narrow evaluation; accumulation stays f64 outside the kernel.

Reference role: the generated cell kernels + their wrapper loops
(reference: pyop2/codegen/builder.py:702 builds the per-form C wrapper
that keeps one cell's scratch in registers/L1; tsfc/driver.py emits
the kernel body).  On TPU the analogous locality unit is a VMEM tile
of cells, not one cell.

Enable with FDTPU_PALLAS=1 (A/B flag; flipped to default-on for TPU
backends once the on-chip win is measured — see PERF_NOTES round 4).
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:          # pragma: no cover
    _HAS_PALLAS = False

# C-axis block per grid step.  8 sublanes x 128 lanes is one f32 tile;
# 16k elements keeps the whole intermediate chain of a P1/P2 kernel
# under the 16 MB scoped-VMEM limit (32k measured 20.3 MB on v5e —
# the first on-chip run) while amortizing grid overhead.
_DEF_BLK = 16384


def _blk():
    return int(os.environ.get("FDTPU_PALLAS_BLK", _DEF_BLK))


def pallas_enabled(dtype):
    """Whether the fused Pallas evaluator should run: opted in (or
    defaulted on TPU), pallas importable, and a Mosaic-supported dtype
    (no f64 — Mosaic has no emulated double)."""
    if not _HAS_PALLAS or dtype == jnp.float64:
        return False
    flag = os.environ.get("FDTPU_PALLAS", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return False            # default-off until the on-chip A/B lands


def _pad_c(x, cpad):
    """Pad the trailing C axis to `cpad` replicating the last cell
    (keeps Jacobians nonsingular in the padded tail; the padded output
    columns are sliced off)."""
    c = x.shape[-1]
    if c == cpad:
        return x
    reps = [(0, 0)] * (x.ndim - 1) + [(0, cpad - c)]
    return jnp.pad(x, reps, mode="edge")


def pallas_cell_eval(kb, ce, ws, consts, interpret=False):
    """loc = kb(ce, ws, consts) evaluated tile-fused: one pallas_call
    over C-blocks, every quadrature intermediate VMEM-resident.

    ce: (ndofc, g, C); ws: tuple of (nslot_k, C); consts: tuple of
    small arrays (any shape — passed whole to every grid step);
    returns (ni, nj, C) exactly as the direct call would.
    """
    C = ce.shape[-1]
    blk = min(_blk(), max(128, -(-C // 128) * 128))
    cpad = -(-C // blk) * blk
    nblk = cpad // blk

    spec = jax.eval_shape(kb, ce, ws, consts)
    ni, nj = spec.shape[0], spec.shape[1]
    nw, nc = len(ws), len(consts)

    # Pallas kernels may not close over array constants: trace kb to a
    # jaxpr at BLOCK shapes, hoist the jaxpr's constvars (the
    # tabulation tables the batched lowering materializes) and feed
    # them back as explicit inputs via eval_jaxpr inside the kernel.
    def g(ce_, *rest):
        return kb(ce_, tuple(rest[:nw]), tuple(rest[nw:nw + nc]))

    ce_b = jax.ShapeDtypeStruct(ce.shape[:-1] + (blk,), ce.dtype)
    ws_b = [jax.ShapeDtypeStruct(w.shape[:-1] + (blk,), w.dtype)
            for w in ws]
    closed = jax.make_jaxpr(g)(ce_b, *ws_b, *consts)
    hoisted = closed.consts

    def g2(ce_, *rest):
        wc = rest[:nw + nc]
        hs = rest[nw + nc:]
        (res,) = jax.core.eval_jaxpr(closed.jaxpr, hs, ce_, *wc)
        return res

    cep = _pad_c(ce, cpad)
    wsp = tuple(_pad_c(w, cpad) for w in ws)
    smalls = tuple(consts) + tuple(hoisted)
    sshapes = tuple(tuple(np.shape(s)) for s in smalls)
    # Mosaic supports only reshapes that keep the minor (lane) dim, so
    # small constants are passed at their NATURAL shape, padded with
    # leading unit dims to rank >= 2; the kernel drops the padding by
    # indexing (no reshape op reaches the lane dim).
    s2d = tuple(jnp.asarray(s).reshape(
        (1,) * max(0, 2 - np.ndim(s)) + tuple(np.shape(s)))
        for s in smalls)

    def kernel(*refs):
        ce_r = refs[0]
        w_rs = refs[1:1 + nw]
        s_rs = refs[1 + nw:-1]
        o_r = refs[-1]
        sm = []
        for r, shp in zip(s_rs, sshapes):
            v = r[...]
            if len(shp) == 0:
                v = v[0, 0]
            elif len(shp) == 1:
                v = v[0]
            sm.append(v)
        o_r[...] = g2(ce_r[...], *(r[...] for r in w_rs), *sm)

    in_specs = [pl.BlockSpec((ce.shape[0], ce.shape[1], blk),
                             lambda i: (0, 0, i))]
    in_specs += [pl.BlockSpec((w.shape[0], blk), lambda i: (0, i))
                 for w in ws]
    in_specs += [pl.BlockSpec(s.shape, (lambda nd: (lambda i: (0,) * nd))
                              (s.ndim)) for s in s2d]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ni, nj, cpad), spec.dtype),
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ni, nj, blk), lambda i: (0, 0, i)),
        interpret=interpret,
    )(cep, *wsp, *s2d)
    return out[..., :C] if cpad != C else out


def run_cell_kernel(kb, ce, ws, consts, chunk=None):
    """Dispatch: fused Pallas evaluation when enabled + dtype-eligible,
    the direct XLA trace otherwise.  Call sites wrap this in
    trace_ctx(prec) so both paths see the same constant dtypes.  On
    non-TPU backends the kernel runs in interpreter mode (CPU tests).

    `chunk`: evaluate the kernel over cell-axis chunks of this size.
    The XLA trace holds (ni, nj, nq, C) quadrature intermediates; at
    north-star scale (2M cells x 216-point rules for a sin^3 RHS) that
    is an 18 GB allocation — past HBM.  Chunking bounds the live
    intermediate to (ni, nj, nq, chunk) while the (ni, nj, C) output
    accumulates across iterations (caught compiling cg_gmg_16m:
    'Allocation (size=18119393280) would exceed memory').

    Structure: fori_loop + dynamic_slice_in_dim on the inputs +
    dynamic_update_slice into ONE output buffer.  A lax.map over
    pre-reshaped stacks was measured OOM-equivalent to no chunking at
    16M dofs: the pad+reshape+moveaxis materializes full-size copies of
    every input (two 1.5 GB stacked buffers in the round-5 OOM report)
    on top of the originals.  The last chunk's start index clamps to
    C - chunk (dynamic_slice semantics), so the overlap cells are
    recomputed and overwritten with identical values — no padding, no
    edge-replicated Jacobians."""
    if pallas_enabled(ce.dtype):
        interp = jax.default_backend() != "tpu"
        return pallas_cell_eval(kb, ce, ws, consts, interpret=interp)
    C = ce.shape[-1]
    if not chunk or chunk >= C:
        return kb(ce, ws, consts)
    nch = -(-C // chunk)
    spec = jax.eval_shape(kb, ce, ws, consts)
    buf = jnp.zeros(spec.shape[:-1] + (C,), spec.dtype)

    def body(i, buf):
        c0 = jnp.minimum(i * chunk, C - chunk)
        ce_c = jax.lax.dynamic_slice_in_dim(ce, c0, chunk, axis=-1)
        ws_c = tuple(jax.lax.dynamic_slice_in_dim(w, c0, chunk, axis=-1)
                     for w in ws)
        loc = kb(ce_c, ws_c, consts)
        start = (0,) * (buf.ndim - 1) + (c0,)
        return jax.lax.dynamic_update_slice(buf, loc, start)

    return jax.lax.fori_loop(0, nch, body, buf)
