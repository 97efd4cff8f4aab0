"""Fully-flat cell-last lowering: every DEVICE intermediate is a flat
(C,) vector; all small tensor structure (dof slots, quadrature points,
value components) lives in numpy OBJECT arrays on the host trace.

Why (PERF_NOTES.md round 2): on the v5e, XLA programs whose
intermediates are (small, small, C) arrays execute ~100-1000x slower
than the identical arithmetic expressed as flat (C,) vectors — padded
(8,128) tile relayouts and serial f64-emulation paths dominate. A
hand-flattened P1 Poisson matrix assembly (6 flat gathers -> flat
elementwise geometry -> concat -> one permutation gather -> sorted
segment_sum) measured 0.019 ms for 131k cells, vs 142 ms for the same
math through (ni, nj, nq, C) intermediates. This module makes the form
compiler EMIT that flat program shape for any cell integral: the object
arrays are unrolled at trace time, so XLA only ever sees (C,) ops.

Mirrors batched.py/lowering.py semantics; reference role: TSFC's
tensor-algebra lowering (tsfc/driver.py), re-specialized to the TPU's
layout rules instead of loopy C kernels.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .lowering import (Lowerer, CellContext, _cell_rule, _tables_at,
                       _MATHFNS, _CONDOPS)
from .smalldot import einsum as oeinsum
from ..language.core import (Argument, Coefficient, SpatialCoordinate,
                             Zero, ScalarValue, Identity)

__all__ = ["FlatCellContext", "FlatLowerer", "omap"]


def omap(f, *arrs):
    """Elementwise apply over (broadcast) numpy object arrays whose
    entries are flat (C,) jnp arrays or scalars."""
    shapes = [np.shape(a) for a in arrs]
    bshape = np.broadcast_shapes(*shapes)
    out = np.empty(bshape, dtype=object)
    bs = []
    for a, s in zip(arrs, shapes):
        if s == ():
            bs.append(None)     # scalar passthrough
        else:
            oa = a if isinstance(a, np.ndarray) and a.dtype == object \
                else np.asarray(a, dtype=object)
            bs.append(np.broadcast_to(oa, bshape))
    for ix in np.ndindex(*bshape) if bshape else [()]:
        out[ix] = f(*[a if b is None else b[ix]
                      for a, b in zip(arrs, bs)])
    if bshape == ():
        o = np.empty((), dtype=object)
        o[()] = f(*arrs)
        return o
    return out


def _as_obj(x):
    if isinstance(x, np.ndarray) and x.dtype == object:
        return x
    return np.asarray(x, dtype=object)


def _g(A, i0, i1):
    def g(i, j):
        idx = [slice(None)] * A.ndim
        idx[i0], idx[i1] = i, j
        return A[tuple(idx)]
    return g


def detO(A, i0, i1):
    """det over (tiny) axes (i0, i1) of an object array."""
    n = A.shape[i0]
    g = _g(A, i0, i1)
    if n == 1:
        return g(0, 0)
    if n == 2:
        return g(0, 0) * g(1, 1) - g(0, 1) * g(1, 0)
    if n == 3:
        return (g(0, 0) * (g(1, 1) * g(2, 2) - g(1, 2) * g(2, 1))
                - g(0, 1) * (g(1, 0) * g(2, 2) - g(1, 2) * g(2, 0))
                + g(0, 2) * (g(1, 0) * g(2, 1) - g(1, 1) * g(2, 0)))
    raise NotImplementedError(n)


def invO(A, i0, i1):
    """inverse over (tiny) axes (i0, i1), closed cofactor forms."""
    n = A.shape[i0]
    g = _g(A, i0, i1)
    d = detO(A, i0, i1)
    if n == 1:
        rows = [[omap(lambda x: 1.0 / x, g(0, 0))]]
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
    assert i1 == i0 + 1
    out = np.stack([np.stack(r, axis=i0) for r in rows], axis=i0)
    if d is None:
        return out
    return out / np.expand_dims(d, axis=(i0, i1))


class FlatCellContext(CellContext):
    """Cell context over OBJECT coords (ndofc, gdim) of (C,) entries."""

    kind = "cell"
    batched = "flat"

    def ref_table(self, element, order, side):
        # plain numpy tables: slicing must yield python floats so the
        # unrolled products stay host-side constants
        key = ("ntab", hash(element), order)
        if key not in self._cache:
            self._cache[key] = _tables_at(element, self.qpts, order)
        return self._cache[key][order]

    def geom(self, side="+"):
        key = ("geom", side)
        if key in self._cache:
            return self._cache[key]
        coords = self.coords_of(side)                  # obj (ndofc, g)
        t0 = self.ref_table(self.coord_elem, 0, side)  # np (nq, ndofc)
        t1 = self.ref_table(self.coord_elem, 1, side)  # np (nq, ndofc, t)
        X = oeinsum("jg,qj->qg", coords, t0)
        J = oeinsum("jg,qjt->qgt", coords, t1)         # obj (nq, g, t)
        if self.gdim == self.tdim:
            detJ = detO(J, 1, 2)
            Jinv = invO(J, 1, 2)
            adet = omap(jnp.abs, detJ)
        else:
            G = oeinsum("qgt,qgs->qts", J, J)
            adet = omap(jnp.sqrt, detO(G, 1, 2))
            Jinv = oeinsum("qts,qgs->qtg", invO(G, 1, 2), J)
        out = dict(X=X, J=J, detJ=adet, Jinv=Jinv)
        self._cache[key] = out
        return out

    def scale(self):
        return self.geom()["detJ"] * np.asarray(self.qwts, dtype=object)

    def cell_diameter(self, side="+"):
        coords = self.coords_of(side)
        nv = self.cell.num_vertices
        g = coords.shape[1]
        best = None
        for i in range(nv):
            for j in range(i + 1, nv):
                d2 = sum((coords[i, k] - coords[j, k]) ** 2
                         for k in range(g))
                best = d2 if best is None else jnp.maximum(best, d2)
        return jnp.sqrt(best)

    def cell_volume(self, side="+"):
        pts, wts = _cell_rule(self.cell.name, 2)
        t1 = np.asarray(self.coord_elem.tabulate(pts, 1)[1])
        coords = self.coords_of(side)
        J = oeinsum("jg,qjt->qgt", coords, t1)
        if self.gdim == self.tdim:
            dJ = omap(jnp.abs, detO(J, 1, 2))
        else:
            G = oeinsum("qgt,qgs->qts", J, J)
            dJ = omap(jnp.sqrt, detO(G, 1, 2))
        return sum(dJ[q] * float(wts[q]) for q in range(len(wts)))


class FlatLowerer(Lowerer):
    """Evaluates to object arrays (ni, nj, nq) + value_shape whose
    entries are flat (C,) jnp arrays (or scalars for cell constants)."""

    batched = "flat"

    def eval(self, e, side):
        key = (id(e), side)
        if key in self.memo:
            return self.memo[key]
        v = self._eval(e, side)
        expect = 3 + len(e.shape)
        assert v.ndim == expect, (type(e).__name__, v.shape, e.shape)
        self.memo[key] = v
        return v

    def run(self, integrand):
        v = self.eval(integrand, None)
        assert v.ndim == 3
        return v                                       # obj (ni, nj, nq)

    @staticmethod
    def _padv(x, extra):
        if extra == 0:
            return x
        return x.reshape(x.shape + (1,) * extra)

    def _eval(self, e, side):
        from ..language.core import (Sum, Product, Division, Power, Abs,
                                     MathFunction, Atan2, MinMax, Indexed,
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
            return np.full((1, 1, 1) + e.shape, 0.0, dtype=object)
        if t is ScalarValue:
            return np.full((1, 1, 1), float(e.value), dtype=object)
        if t is Identity:
            return _as_obj(np.eye(e.dim)).reshape(1, 1, 1, e.dim, e.dim)
        if isinstance(e, ConstantBase):
            v = self.const_vals.get(e.count)
            if v is None:
                v = jnp.asarray(e.values())
            v = jnp.asarray(v).reshape(e.shape)
            out = np.empty((1, 1, 1) + e.shape, dtype=object)
            for ix in np.ndindex(*e.shape) if e.shape else [()]:
                out[(0, 0, 0) + ix] = v[ix] if e.shape else v.reshape(())
            return out
        if isinstance(e, (Argument, Coefficient)):
            return self._terminal_deriv(e, 0, side, e.shape)
        if t is SpatialCoordinate:
            X = self.ctx.geom(side or "+")["X"]        # obj (nq, g)
            return X[None, None]
        if t is CellDiameter:
            out = np.empty((1, 1, 1), dtype=object)
            out[0, 0, 0] = self.ctx.cell_diameter(side or "+")
            return out
        if t is CellVolume:
            out = np.empty((1, 1, 1), dtype=object)
            out[0, 0, 0] = self.ctx.cell_volume(side or "+")
            return out

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
            return omap(jnp.abs, ev(e.operands[0], side))
        if t is MathFunction:
            if e.fname == "erf":
                import jax
                return omap(jax.scipy.special.erf, ev(e.operands[0], side))
            return omap(_MATHFNS[e.fname], ev(e.operands[0], side))
        if t is Atan2:
            return omap(jnp.arctan2, ev(e.operands[0], side),
                        ev(e.operands[1], side))
        if t is MinMax:
            f = jnp.minimum if e.which == "min" else jnp.maximum
            return omap(f, ev(e.operands[0], side),
                        ev(e.operands[1], side))
        if t is Indexed:
            v = ev(e.operands[0], side)
            return v[(slice(None),) * 3 + e.indices]
        if t is _LastIndex:
            v = ev(e.operands[0], side)
            return v[..., e.idx]
        if t is ListTensor:
            comps = [ev(o, side) for o in e.operands]
            lead = np.broadcast_shapes(*[c.shape[:3] for c in comps])
            comps = [np.broadcast_to(c, lead + c.shape[3:]) for c in comps]
            return np.stack(comps, axis=3)
        if t is Inner:
            a, b = e.operands
            va, vb = ev(a, side), ev(b, side)
            k = len(a.shape)
            prod = va * vb
            return np.sum(prod, axis=tuple(range(3, 3 + k))) if k else prod
        if t is Dot:
            a, b = e.operands
            va, vb = ev(a, side), ev(b, side)
            ka, kb = len(a.shape), len(b.shape)
            la = "".join(chr(ord("d") + i) for i in range(ka - 1))
            lb = "".join(chr(ord("m") + i) for i in range(kb - 1))
            return oeinsum(f"xyq{la}z,xyqz{lb}->xyq{la}{lb}", va, vb)
        if t is Outer:
            a, b = e.operands
            va, vb = ev(a, side), ev(b, side)
            ka, kb = len(a.shape), len(b.shape)
            va2 = self._padv(va, kb)
            vb2 = vb.reshape(vb.shape[:3] + (1,) * ka + vb.shape[3:])
            return va2 * vb2
        if t is Cross:
            va = ev(e.operands[0], side)
            vb = ev(e.operands[1], side)
            lead = np.broadcast_shapes(va.shape[:3], vb.shape[:3])
            va = np.broadcast_to(va, lead + va.shape[3:])
            vb = np.broadcast_to(vb, lead + vb.shape[3:])
            if va.shape[3] == 2:
                return (va[..., 0] * vb[..., 1] - va[..., 1] * vb[..., 0])
            c0 = va[..., 1] * vb[..., 2] - va[..., 2] * vb[..., 1]
            c1 = va[..., 2] * vb[..., 0] - va[..., 0] * vb[..., 2]
            c2 = va[..., 0] * vb[..., 1] - va[..., 1] * vb[..., 0]
            return np.stack([c0, c1, c2], axis=3)
        if t is Transpose:
            return np.swapaxes(ev(e.operands[0], side), 3, 4)
        if t is Trace:
            v = ev(e.operands[0], side)
            n = v.shape[3]
            return sum(v[:, :, :, i, i] for i in range(n))
        if t is Determinant:
            return detO(ev(e.operands[0], side), 3, 4)
        if t is Inverse:
            return invO(ev(e.operands[0], side), 3, 4)
        if t is Div:
            vg = ev(Grad(e.operands[0]), side)
            n = vg.shape[-1]
            return sum(vg[..., i, i] for i in range(n))
        if t is Curl:
            vg = ev(Grad(e.operands[0]), side)
            if e.operands[0].shape == (2,):
                return vg[:, :, :, 1, 0] - vg[:, :, :, 0, 1]
            c0 = vg[:, :, :, 2, 1] - vg[:, :, :, 1, 2]
            c1 = vg[:, :, :, 0, 2] - vg[:, :, :, 2, 0]
            c2 = vg[:, :, :, 1, 0] - vg[:, :, :, 0, 1]
            return np.stack([c0, c1, c2], axis=3)
        if t is Condition:
            return omap(_CONDOPS[e.op], ev(e.operands[0], side),
                        ev(e.operands[1], side))
        if t is BoolOp:
            vs = [ev(o, side) for o in e.operands]
            if e.op == "and":
                return omap(jnp.logical_and, vs[0], vs[1])
            if e.op == "or":
                return omap(jnp.logical_or, vs[0], vs[1])
            return omap(jnp.logical_not, vs[0])
        if t is Conditional:
            c = ev(e.operands[0], side)
            tv = ev(e.operands[1], side)
            fv = ev(e.operands[2], side)
            c = self._padv(c, len(e.shape))
            return omap(jnp.where, c, tv, fv)
        raise NotImplementedError(f"flat lowering of {t.__name__}")

    # ------------------------------------------------------- terminal d^k
    def _to_phys(self, T, d, side):
        """T np (nq, nslot, vs.., t^d) -> contract derivative axes with
        object Jinv (nq, t, g) -> obj (nq, nslot, vs.., g^d)."""
        if d == 0:
            return _as_obj(T)
        Jinv = self.ctx.jinv(side or "+")
        if d == 1:
            return oeinsum("q...t,qtg->q...g", T, Jinv)
        if d == 2:
            return oeinsum("q...st,qsa,qtb->q...ab", T, Jinv, Jinv)
        raise NotImplementedError("flat derivatives beyond order 2")

    def _terminal_deriv(self, base, d, side, out_shape):
        ctx = self.ctx
        if isinstance(base, SpatialCoordinate):
            g = ctx.geom(side or "+")
            if d == 0:
                return g["X"][None, None]
            if d == 1:
                return g["J"][None, None]
            nq = g["X"].shape[0]
            return np.full((1, 1, nq) + out_shape, 0.0, dtype=object)
        if isinstance(base, Argument):
            elem = base.space.element
            mapping = getattr(elem, "mapping", "identity")
            T = self.arg_table(base, d, side)
            T = np.asarray(T)
            if mapping != "identity":
                P = self._pullback(T, elem, d, side)
            else:
                P = self._to_phys(T, d, side)          # (nq, nslot, ...)
            P = np.moveaxis(P, 1, 0)                   # (nslot, nq, ...)
            if base.number == 0:
                return P[:, None]
            return P[None]
        if isinstance(base, Coefficient):
            dat = self.coeff_dats[base.count]          # obj (nslot,)
            elem = base.space.element
            mapping = getattr(elem, "mapping", "identity")
            T = np.asarray(ctx.ref_table(elem, d, side or "+"))
            if mapping != "identity":
                P = self._pullback(T, elem, d, side)
            else:
                P = self._to_phys(T, d, side)
            v = oeinsum("j,qj...->q...", dat, P)
            return v[None, None]
        raise NotImplementedError(f"flat grad of {type(base).__name__}")

    def _pullback(self, T, elem, d, side):
        g = self.ctx.geom(side or "+")
        J, Jinv, detJ = g["J"], g["Jinv"], g["detJ"]
        mapping = getattr(elem, "mapping", "identity")
        if mapping == "contravariant":
            if d == 0:
                return oeinsum("qik,qjk->qji", J, T) \
                    / detJ[:, None, None]
            if d == 1:
                P = oeinsum("qik,qjks,qsg->qjig", J, T, Jinv)
                return P / detJ[:, None, None, None]
        if mapping == "covariant":
            if d == 0:
                return oeinsum("qki,qjk->qji", Jinv, T)
            if d == 1:
                return oeinsum("qki,qjks,qsg->qjig", Jinv, T, Jinv)
        raise NotImplementedError(mapping)
