"""External (pointwise) operators: JAX functions inside variational forms.

Reference: firedrake/external_operators/ (AbstractExternalOperator,
point_expr / PointexprOperator :24, the ML coupling operators).  The
reference needs a whole subclass machinery + separate assembly hooks;
here a pointwise operator is just another expression node — its
evaluation IS a jax-traceable call inside the quadrature kernel, and its
linearization uses jax.jvp, so Newton, adjoint and matrix-free paths all
work unchanged.  This is the natural ML coupling: `fn` may close over a
flax/haiku network applied pointwise.

Scope: scalar pointwise operators N(u1, ..., uk) of scalar operands.
"""
from __future__ import annotations

from .core import Expr, as_expr


class PointwiseOperator(Expr):
    __slots__ = ("fn", "fname", "shape")

    def __init__(self, fn, operands, name="external"):
        ops = tuple(as_expr(o) for o in operands)
        super().__init__(*ops)
        for o in ops:
            if o.shape != ():
                raise NotImplementedError(
                    "pointwise operators of non-scalar operands: wrap "
                    "components explicitly")
        self.fn = fn
        self.fname = name
        self.shape = ()

    def _sig(self, rn):
        inner = ",".join(o._sig(rn) for o in self.operands)
        return f"ExtOp[{self.fname}#{id(self.fn)}]({inner})"


def point_expr(fn, name=None):
    """point_expr(fn)(u, ...) — a pointwise operator evaluating the
    jax-traceable `fn` at quadrature/interpolation points (reference:
    firedrake.external_operators.point_expr)."""
    def make(*operands):
        return PointwiseOperator(fn, operands,
                                 name=name or getattr(fn, "__name__",
                                                      "external"))
    return make


_egrad_cache = {}


def elementwise_partial(fn, argnum, nargs):
    """d fn / d arg_argnum as an elementwise function (exact for
    pointwise fn via jvp with a ones tangent)."""
    key = (id(fn), argnum, nargs)
    if key not in _egrad_cache:
        import jax
        import jax.numpy as jnp

        def dfn(*xs):
            tangents = tuple(jnp.ones_like(x) if i == argnum
                             else jnp.zeros_like(x)
                             for i, x in enumerate(xs))
            return jax.jvp(fn, xs, tangents)[1]
        dfn.__name__ = f"d{argnum}_{getattr(fn, '__name__', 'ext')}"
        _egrad_cache[key] = dfn
    return _egrad_cache[key]
