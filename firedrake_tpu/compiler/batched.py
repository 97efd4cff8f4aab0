"""Cell-last ("batched") kernel evaluation — the TPU layout-native path.

Motivation (PERF_NOTES.md): materializing per-cell local tensors with the
cell axis MAJOR forces (8,128)-tile repacks of tiny-trailing-dim arrays
(~100 ms per assembly at 131k cells where the primitives cost ~0.03 ms).
This module evaluates kernels with the CELL axis as the trailing (lane)
dimension end to end:

  * gathers use TRANSPOSED index maps, producing (ndof, gdim, ncell) etc.
    directly — a gather's output layout follows its index array;
  * every evaluated array has shape (ni, nj, nq, *vs, C) with C in
    {1, ncell} (the cell axis broadcasts like the quadrature axis);
  * the local tensor (ni, nj, C) is scattered SLOT-BY-SLOT as flat
    (ncell,) vectors with statically slot-transposed positions — no
    repack anywhere.

Falls back to the vmapped cell-major path (lowering.Lowerer) for nodes it
does not implement yet.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .smalldot import einsum as _small_einsum

from .lowering import (Lowerer, CellContext, _cell_rule, _tables_at)
from ..language.core import (Argument, Coefficient, SpatialCoordinate,
                             Zero, ScalarValue, Identity)


def _detC(A, i0, i1):
    """det over axes (i0, i1) of size <= 3, arbitrary other axes."""
    n = A.shape[i0]

    def g(i, j):
        idx = [slice(None)] * A.ndim
        idx[i0], idx[i1] = i, j
        return A[tuple(idx)]

    if n == 1:
        return g(0, 0)
    if n == 2:
        return g(0, 0) * g(1, 1) - g(0, 1) * g(1, 0)
    if n == 3:
        return (g(0, 0) * (g(1, 1) * g(2, 2) - g(1, 2) * g(2, 1))
                - g(0, 1) * (g(1, 0) * g(2, 2) - g(1, 2) * g(2, 0))
                + g(0, 2) * (g(1, 0) * g(2, 1) - g(1, 1) * g(2, 0)))
    raise NotImplementedError(n)


def _invC(A, i0, i1):
    """inverse over axes (i0, i1) (size <= 3), stacked back in place."""
    n = A.shape[i0]

    def g(i, j):
        idx = [slice(None)] * A.ndim
        idx[i0], idx[i1] = i, j
        return A[tuple(idx)]

    d = _detC(A, i0, i1)
    if n == 1:
        rows = [[1.0 / g(0, 0)]]
        d = None
    elif n == 2:
        rows = [[g(1, 1), -g(0, 1)], [-g(1, 0), g(0, 0)]]
    elif n == 3:
        c = lambda a, b, cc, dd: g(a, b) * g(cc, dd) - g(a, dd) * g(cc, b)
        rows = [
            [c(1, 1, 2, 2), -c(0, 1, 2, 2),
             g(0, 1) * g(1, 2) - g(0, 2) * g(1, 1)],
            [-c(1, 0, 2, 2), c(0, 0, 2, 2),
             -(g(0, 0) * g(1, 2) - g(0, 2) * g(1, 0))],
            [g(1, 0) * g(2, 1) - g(1, 1) * g(2, 0),
             -(g(0, 0) * g(2, 1) - g(0, 1) * g(2, 0)),
             g(0, 0) * g(1, 1) - g(0, 1) * g(1, 0)],
        ]
    else:
        raise NotImplementedError(n)
    out = jnp.stack([jnp.stack(r, axis=i0) for r in rows], axis=i0)
    # out now has the two matrix axes at (i0, i0+1) in source order
    # (row-stacked then col-stacked): matches (i0, i1) when i1 == i0+1
    assert i1 == i0 + 1
    if d is None:
        return out
    return out / jnp.expand_dims(d, axis=(i0, i1))


class BatchedCellContext(CellContext):
    """Cell context whose coords carry a trailing cell axis:
    coords (ndofc, gdim, C)."""

    kind = "cell"
    batched = True

    def geom(self, side="+"):
        key = ("geom", side)
        if key in self._cache:
            return self._cache[key]
        coords = self.coords_of(side)                  # (ndofc, g, C)
        t0 = self.ref_table(self.coord_elem, 0, side)  # (nq, ndofc)
        t1 = self.ref_table(self.coord_elem, 1, side)  # (nq, ndofc, t)
        X = _small_einsum("jgc,qj->qgc", coords, t0)
        J = _small_einsum("jgc,qjt->qgtc", coords, t1)    # (nq, g, t, C)
        if self.gdim == self.tdim:
            detJ = _detC(J, 1, 2)                      # (nq, C)
            Jinv = _invC(J, 1, 2)                      # (nq, t, g, C)
            adet = jnp.abs(detJ)
        else:
            G = _small_einsum("qgtc,qgsc->qtsc", J, J)
            adet = jnp.sqrt(_detC(G, 1, 2))
            Jinv = _small_einsum("qtsc,qgsc->qtgc", _invC(G, 1, 2), J)
        out = dict(X=X, J=J, detJ=adet, Jinv=Jinv)
        self._cache[key] = out
        return out

    def scale(self):
        return self.geom()["detJ"] * jnp.asarray(self.qwts)[:, None]

    def cell_diameter(self, side="+"):
        coords = self.coords_of(side)                  # (ndofc, g, C)
        nv = self.cell.num_vertices
        v = coords[:nv]
        d2 = jnp.sum((v[:, None] - v[None, :]) ** 2, axis=2)  # (nv,nv,C)
        return jnp.sqrt(jnp.max(d2, axis=(0, 1)))             # (C,)

    def cell_volume(self, side="+"):
        pts, wts = _cell_rule(self.cell.name, 2)
        t1 = jnp.asarray(self.coord_elem.tabulate(pts, 1)[1])
        coords = self.coords_of(side)
        J = _small_einsum("jgc,qjt->qgtc", coords, t1)
        if self.gdim == self.tdim:
            dJ = jnp.abs(_detC(J, 1, 2))
        else:
            G = _small_einsum("qgtc,qgsc->qtsc", J, J)
            dJ = jnp.sqrt(_detC(G, 1, 2))
        return _small_einsum("qc,q->c", dJ, jnp.asarray(wts))


class BatchedLowerer(Lowerer):
    """Evaluates with an extra trailing cell axis: every array has rank
    3 + len(shape) + 1, last axis C in {1, ncell}."""

    batched = True

    # -------------------------------------------------- shape conventions
    def eval(self, e, side):
        # identity-checked strong-ref memo (see Lowerer.eval: a bare
        # id() key can be recycled onto a later temporary node)
        key = (id(e), side)
        hit = self.memo.get(key)
        if hit is not None and hit[0] is e:
            return hit[1]
        v = self._eval(e, side)
        expect = 4 + len(e.shape)
        assert v.ndim == expect, (type(e).__name__, v.shape, e.shape)
        self.memo[key] = (e, v)
        return v

    def run(self, integrand):
        v = self.eval(integrand, None)
        assert v.ndim == 4
        return v                                       # (ni, nj, nq, C)

    # helpers that must insert value axes BEFORE the trailing cell axis
    @staticmethod
    def _padv(x, extra):
        if extra == 0:
            return x
        return x.reshape(x.shape[:-1] + (1,) * extra + x.shape[-1:])

    def _eval(self, e, side):
        from ..language.core import (Sum, Product, Division, Power, Abs,
                                     MathFunction, Atan2, MinMax, Indexed,
                                     Conj, Real, Imag,
                                     Grad, Restricted, Condition, BoolOp,
                                     Conditional, ConstantBase,
                                     FacetNormal, CellDiameter, CellVolume,
                                     FacetArea, PermutationSymbol)
        from ..language.tensor_algebra import (Inner, Dot, Outer, Cross,
                                               Transpose, Trace,
                                               Determinant, Inverse,
                                               ListTensor)
        from ..language.operators import Div, Curl
        from .preprocess import _LastIndex
        from .lowering import _MATHFNS, _CONDOPS
        t = type(e)
        ev = self.eval

        if t is Grad:
            base, d = e, 0
            while isinstance(base, Grad):
                base = base.operands[0]
                d += 1
            if isinstance(base, Restricted):
                side = base.side
                base = base.operands[0]
            return self._terminal_deriv(base, d, side, e.shape)
        if t is Restricted:
            return ev(e.operands[0], e.side)
        if t is Zero:
            return jnp.zeros((1, 1, 1) + e.shape + (1,))
        if t is ScalarValue:
            return jnp.full((1, 1, 1, 1), e.value)
        if t is Identity:
            return jnp.eye(e.dim).reshape(1, 1, 1, e.dim, e.dim, 1)
        if isinstance(e, ConstantBase):
            v = self.const_vals.get(e.count)
            if v is None:
                v = jnp.asarray(e.values())
            return jnp.asarray(v).reshape((1, 1, 1) + e.shape + (1,))
        if isinstance(e, (Argument, Coefficient)):
            return self._terminal_deriv(e, 0, side, e.shape)
        if t is SpatialCoordinate:
            X = self.ctx.geom(side or "+")["X"]        # (nq, g, C)
            return X[None, None]
        if t is CellDiameter:
            return self.ctx.cell_diameter(side or "+").reshape(1, 1, 1, -1)
        if t is CellVolume:
            return self.ctx.cell_volume(side or "+").reshape(1, 1, 1, -1)

        if t is Sum:
            return ev(e.operands[0], side) + ev(e.operands[1], side)
        if t is Product:
            a, b = e.operands
            va, vb = ev(a, side), ev(b, side)
            if a.shape == () and b.shape != ():
                va = self._padv(va, len(b.shape))
            elif b.shape == () and a.shape != ():
                vb = self._padv(vb, len(a.shape))
            return va * vb
        if t is Division:
            return ev(e.operands[0], side) / self._padv(
                ev(e.operands[1], side), len(e.operands[0].shape))
        if t is Power:
            return ev(e.operands[0], side) ** ev(e.operands[1], side)
        if t is Abs:
            return jnp.abs(ev(e.operands[0], side))
        if t is Conj:
            return jnp.conj(ev(e.operands[0], side))
        if t is Real:
            return jnp.real(ev(e.operands[0], side))
        if t is Imag:
            return jnp.imag(ev(e.operands[0], side))
        if t is MathFunction:
            if e.fname == "erf":
                return jax.scipy.special.erf(ev(e.operands[0], side))
            return _MATHFNS[e.fname](ev(e.operands[0], side))
        if t is Atan2:
            return jnp.arctan2(ev(e.operands[0], side),
                               ev(e.operands[1], side))
        if t is MinMax:
            f = jnp.minimum if e.which == "min" else jnp.maximum
            return f(ev(e.operands[0], side), ev(e.operands[1], side))
        if t is Indexed:
            v = ev(e.operands[0], side)
            return v[(slice(None),) * 3 + e.indices]
        if t is _LastIndex:
            v = ev(e.operands[0], side)
            return v[..., e.idx, :]
        if t is ListTensor:
            comps = [ev(o, side) for o in e.operands]
            shapes = [c.shape for c in comps]
            lead = jnp.broadcast_shapes(*[s[:3] for s in shapes])
            cb = jnp.broadcast_shapes(*[s[-1:] for s in shapes])
            comps = [jnp.broadcast_to(c, lead + c.shape[3:-1] + cb)
                     for c in comps]
            return jnp.stack(comps, axis=3)
        if t is Inner:
            a, b = e.operands
            va, vb = ev(a, side), ev(b, side)
            k = len(a.shape)
            full = jnp.broadcast_shapes(va.shape, vb.shape)
            va = jnp.broadcast_to(va, full)
            vb = jnp.broadcast_to(vb, full)
            return jnp.sum(va * vb, axis=tuple(range(3, 3 + k)))
        if t is Dot:
            a, b = e.operands
            va, vb = ev(a, side), ev(b, side)
            ka, kb = len(a.shape), len(b.shape)
            la = "".join(chr(ord("d") + i) for i in range(ka - 1))
            lb = "".join(chr(ord("m") + i) for i in range(kb - 1))
            lead = jnp.broadcast_shapes(va.shape[:3], vb.shape[:3])
            cb = jnp.broadcast_shapes(va.shape[-1:], vb.shape[-1:])
            va = jnp.broadcast_to(va, lead + va.shape[3:-1] + cb)
            vb = jnp.broadcast_to(vb, lead + vb.shape[3:-1] + cb)
            return _small_einsum(f"xyq{la}zc,xyqz{lb}c->xyq{la}{lb}c",
                              va, vb)
        if t is Outer:
            a, b = e.operands
            va, vb = ev(a, side), ev(b, side)
            ka, kb = len(a.shape), len(b.shape)
            va2 = self._padv(va, kb)
            vb2 = vb.reshape(vb.shape[:3] + (1,) * ka + vb.shape[3:])
            return va2 * vb2
        if t is Cross:
            va, vb = ev(e.operands[0], side), ev(e.operands[1], side)
            return jnp.cross(va, vb, axis=3)
        if t is Transpose:
            return jnp.swapaxes(ev(e.operands[0], side), 3, 4)
        if t is Trace:
            v = ev(e.operands[0], side)
            n = v.shape[3]
            return sum(v[:, :, :, i, i, :] for i in range(n))
        if t is Determinant:
            return _detC(ev(e.operands[0], side), 3, 4)
        if t is Inverse:
            return _invC(ev(e.operands[0], side), 3, 4)
        if t is Div:
            vg = ev(Grad(e.operands[0]), side)
            return self._div_trace(vg)
        if t is Curl:
            vg = ev(Grad(e.operands[0]), side)
            if e.operands[0].shape == (2,):
                return vg[:, :, :, 1, 0, :] - vg[:, :, :, 0, 1, :]
            c0 = vg[:, :, :, 2, 1, :] - vg[:, :, :, 1, 2, :]
            c1 = vg[:, :, :, 0, 2, :] - vg[:, :, :, 2, 0, :]
            c2 = vg[:, :, :, 1, 0, :] - vg[:, :, :, 0, 1, :]
            return jnp.stack([c0, c1, c2], axis=3)
        if t is Condition:
            return _CONDOPS[e.op](ev(e.operands[0], side),
                                  ev(e.operands[1], side))
        if t is BoolOp:
            vs = [ev(o, side) for o in e.operands]
            if e.op == "and":
                return jnp.logical_and(vs[0], vs[1])
            if e.op == "or":
                return jnp.logical_or(vs[0], vs[1])
            return jnp.logical_not(vs[0])
        if t is Conditional:
            c = ev(e.operands[0], side)
            tv = ev(e.operands[1], side)
            fv = ev(e.operands[2], side)
            c = self._padv(c, len(e.shape))
            return jnp.where(c, tv, fv)
        raise NotImplementedError(f"batched lowering of {t.__name__}")

    @staticmethod
    def _div_trace(vg):
        """trace over the last two VALUE axes (before the cell axis)."""
        n = vg.shape[-2]
        parts = []
        for i in range(n):
            idx = (Ellipsis, i, i, slice(None))
            parts.append(vg[idx])
        return sum(parts)

    # ------------------------------------------------------- terminal d^k
    def _to_phys(self, T, d, side):
        """T (nq, nslot, vs.., t^d) constant table -> contract derivative
        axes with batched Jinv (nq, t, g, C) -> (nq, nslot, vs.., g^d, C)."""
        if d == 0:
            return T[..., None]
        Jinv = self.ctx.jinv(side or "+")
        if d == 1:
            return _small_einsum("q...t,qtgc->q...gc", T, Jinv)
        if d == 2:
            return _small_einsum("q...st,qsac,qtbc->q...abc", T, Jinv, Jinv)
        raise NotImplementedError("batched derivatives beyond order 2")

    def _terminal_deriv(self, base, d, side, out_shape):
        ctx = self.ctx
        if isinstance(base, SpatialCoordinate):
            g = ctx.geom(side or "+")
            if d == 0:
                return g["X"][None, None]              # (1,1,nq,g,C)
            if d == 1:
                return g["J"][None, None]
            nq = g["X"].shape[0]
            return jnp.zeros((1, 1, nq) + out_shape + (1,))
        if isinstance(base, Argument):
            elem = base.space.element
            mapping = getattr(elem, "mapping", "identity")
            T = self.arg_table(base, d, side)
            if mapping != "identity":
                P = self._pullback_batched(T, elem, d, side)
            else:
                P = self._to_phys(T, d, side)          # (nq,nslot,...,C)
            P = jnp.moveaxis(P, 1, 0)                  # (nslot, nq, ..., C)
            if base.number == 0:
                return P[:, None]
            return P[None]
        if isinstance(base, Coefficient):
            dat = self.coeff_dats[base.count]          # (nslot, C)
            elem = base.space.element
            mapping = getattr(elem, "mapping", "identity")
            T = ctx.ref_table(elem, d, side or "+")
            if mapping != "identity":
                P = self._pullback_batched(T, elem, d, side)
            else:
                P = self._to_phys(T, d, side)
            v = _small_einsum("jc,qj...c->q...c", dat, P)
            return v[None, None]
        raise NotImplementedError(
            f"batched grad of {type(base).__name__}")

    def _pullback_batched(self, T, elem, d, side):
        # Piola-mapped elements never reach the cell-last plans (the
        # stencil/column plan builders admit identity-mapped spaces
        # only); the cell-major Lowerer handles H(div)/H(curl).
        raise NotImplementedError(getattr(elem, "mapping", "identity"))
