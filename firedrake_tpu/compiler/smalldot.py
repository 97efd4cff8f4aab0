"""Unrolled einsum for tiny static contraction dims.

XLA:TPU has no native f64 MXU path: an f64 `dot_general` is emulated in
double-word (f32, bf16) arithmetic through a SERIAL `while` loop over a
contraction/batch dim (observed: the `jgc,qjt->qgtc` Jacobian einsum of
a 131k-cell assembly compiled to wide.while loops costing ~150 ms where
the arithmetic is ~20 us of VPU work — see PERF_NOTES.md round 2).
Elementwise f64 emulation, by contrast, vectorizes fine.

FEM quadrature contractions are over tiny static dims (ndof, nq, gdim
<= ~12), so the cure is to unroll them: `einsum(spec, *ops)` expands the
contraction into an explicit sum of elementwise (broadcast) products —
no dot_general is ever emitted. Use ONLY for small contracted dims; the
term count is the product of contracted sizes.
"""
from __future__ import annotations

import itertools

import numpy as np
import jax.numpy as jnp

__all__ = ["einsum"]

_POOL = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _expand_ellipsis(ins, out, ops):
    if not any("..." in s for s in ins) and "..." not in out:
        return ins, out
    used = set("".join(ins) + out) - {"."}
    pool = [c for c in _POOL if c not in used]
    nell = 0
    for s, op in zip(ins, ops):
        if "..." in s:
            nell = max(nell, op.ndim - (len(s) - 3))
    ell = "".join(pool[:nell])
    ins2 = []
    for s, op in zip(ins, ops):
        if "..." in s:
            n = op.ndim - (len(s) - 3)
            s = s.replace("...", ell[nell - n:])
        ins2.append(s)
    out2 = out.replace("...", ell) if "..." in out else out
    return ins2, out2


def _want_unroll(ops):
    """Unroll only where it pays: object arrays (the flat path) always;
    jnp arrays only when lowering for TPU, where f64 dot_general is
    serial-emulated.  On CPU one fused einsum traces and runs faster."""
    if any(isinstance(o, np.ndarray) and o.dtype == object for o in ops):
        return True
    import jax
    return jax.default_backend() == "tpu"


def einsum(spec, *ops):
    """Drop-in jnp.einsum replacement that unrolls every contraction
    into elementwise multiply-adds (tiny static dims only)."""
    if not _want_unroll(ops):
        return jnp.einsum(spec, *ops)
    lhs, out = spec.split("->")
    ins = lhs.split(",")
    ins, out = _expand_ellipsis(ins, out, ops)
    sizes = {}
    for s, op in zip(ins, ops):
        assert len(s) == op.ndim, (spec, s, op.shape)
        assert len(set(s)) == len(s), f"repeated label in {s!r}"
        for lab, n in zip(s, op.shape):
            # size-1 dims broadcast against larger ones (numpy-style)
            if lab in sizes and sizes[lab] != n and 1 not in (sizes[lab], n):
                raise ValueError(f"size mismatch for {lab!r} in {spec}")
            sizes[lab] = max(sizes.get(lab, 1), n)
    contracted = sorted(set("".join(ins)) - set(out))
    total = None
    for combo in itertools.product(*[range(sizes[l]) for l in contracted]):
        assign = dict(zip(contracted, combo))
        term = None
        for s, op in zip(ins, ops):
            idx = tuple(min(assign[l], op.shape[k] - 1) if l in assign
                        else slice(None) for k, l in enumerate(s))
            sl = op[idx]
            if (isinstance(op, np.ndarray) and op.dtype == object
                    and not isinstance(sl, np.ndarray)):
                # fully-indexed object entry (a flat (C,) device array):
                # keep it OUT of the structural dims
                o = np.empty((), dtype=object)
                o[()] = sl
                sl = o
            rem = [l for l in s if l not in assign]
            order = sorted(range(len(rem)), key=lambda k: out.index(rem[k]))
            if order != list(range(len(rem))):
                sl = jnp.transpose(sl, order) if not isinstance(
                    sl, np.ndarray) else np.transpose(sl, order)
                rem = [rem[k] for k in order]
            expand = tuple(slice(None) if l in rem else None for l in out)
            sl = sl[expand]
            term = sl if term is None else term * sl
        total = term if total is None else total + term
    # broadcast to the full output shape (labels absent from all inputs
    # cannot occur; but size-1 broadcasting across terms is already done)
    return total
