"""Differential operators, math functions, DG restrictions (UFL surface)."""
from __future__ import annotations

from .core import (Expr, Grad, Zero, as_expr, MathFunction, Conditional,
                   Condition, BoolOp, MinMax, Restricted, Atan2, Abs,
                   ScalarValue, Sum, Product, _expr_gdim)
from .tensor_algebra import Dot, Transpose


# -------------------------------------------------------------- derivatives
def grad(e):
    return Grad(e)


class Div(Expr):
    """div contracts the LAST index with the derivative: (div A)_i... =
    d A_{...,j} / dx_j  (UFL convention)."""
    __slots__ = ("shape",)

    def __new__(cls, e):
        e = as_expr(e)
        if len(e.shape) < 1:
            raise ValueError("div needs at least a vector")
        if e.is_zero():
            return Zero(e.shape[:-1])
        return object.__new__(cls)

    def __init__(self, e):
        if getattr(self, "operands", None) is not None:
            return
        e = as_expr(e)
        super().__init__(e)
        self.shape = e.shape[:-1]


class Curl(Expr):
    """3D: vector -> vector. 2D: vector -> scalar (rot), and scalar ->
    vector (the perp gradient (du/dy, -du/dx) — ufl's algebra lowering
    of curl on a 2D scalar, exercised by the reference's
    tests/firedrake/regression/test_bubble.py BDFM case)."""
    __slots__ = ("shape",)

    def __init__(self, e):
        e = as_expr(e)
        if e.shape == (3,):
            shape = (3,)
        elif e.shape == (2,):
            shape = ()
        elif e.shape == ():
            shape = (2,)
        else:
            raise ValueError("curl needs a scalar, 2- or 3-vector")
        super().__init__(e)
        self.shape = shape


def div(e):
    return Div(e)


def curl(e):
    return Curl(e)


def rot(e):
    return Curl(e)


def nabla_grad(e):
    """(nabla_grad u)_ij = du_j/dx_i = transpose(grad(u)) for vectors."""
    e = as_expr(e)
    g = Grad(e)
    if len(g.shape) == 2:
        return Transpose(g)
    return g


def nabla_div(e):
    return Div(e)


# ---------------------------------------------------------------- math fns
def _fold_number(name, x):
    """ufl's math functions return plain numbers for plain-number
    arguments (ufl.operators apply the operation eagerly to
    ScalarValue); match that so e.g. ``sqrt(0.5)`` can feed Python
    arithmetic (mesh sizes, tolerances) outside a form."""
    import numbers
    import numpy as _np
    if isinstance(x, numbers.Number) or isinstance(x, _np.generic):
        import scipy.special as _sp
        fn = _sp.erf if name == "erf" else getattr(_np, name)
        return float(fn(x))
    return None


def _mf(name):
    def f(x):
        v = _fold_number(name, x)
        if v is not None:
            return v
        return MathFunction(name, x)
    f.__name__ = name
    return f


sin = _mf("sin")
cos = _mf("cos")
tan = _mf("tan")
asin = _mf("arcsin")
acos = _mf("arccos")
atan = _mf("arctan")
sinh = _mf("sinh")
cosh = _mf("cosh")
tanh = _mf("tanh")
exp = _mf("exp")
ln = _mf("log")
erf = _mf("erf")


def conj(x):
    """Complex conjugate (identity on real data).  Reference: ufl.conj,
    compiled by tsfc's complex mode (tsfc/ufl_utils.py:48-70)."""
    from .core import Conj
    return Conj(x)


def real(x):
    from .core import Real
    return Real(x)


def imag(x):
    from .core import Imag
    return Imag(x)


def sqrt(x):
    v = _fold_number("sqrt", x)
    if v is not None:
        return v
    return MathFunction("sqrt", x)


def atan2(y, x):
    return Atan2(y, x)


def atan_2(y, x):
    return Atan2(y, x)


def sign(x):
    return MathFunction("sign", x)


def Max(a, b):
    return MinMax("max", a, b)


def Min(a, b):
    return MinMax("min", a, b)


max_value = Max
min_value = Min


# ------------------------------------------------------------ conditionals
def conditional(cond, t, f):
    return Conditional(cond, t, f)


def lt(a, b):
    return Condition("lt", a, b)


def le(a, b):
    return Condition("le", a, b)


def gt(a, b):
    return Condition("gt", a, b)


def ge(a, b):
    return Condition("ge", a, b)


def eq(a, b):
    return Condition("eq", a, b)


def ne(a, b):
    return Condition("ne", a, b)


def And(a, b):
    return BoolOp("and", a, b)


def Or(a, b):
    return BoolOp("or", a, b)


def Not(a):
    return BoolOp("not", a)


# ------------------------------------------------------------ restrictions
def avg(e):
    e = as_expr(e)
    return Product(ScalarValue(0.5),
                   Sum(Restricted(e, "+"), Restricted(e, "-")))


def jump(e, n=None):
    """jump(u) = u+ - u-;  jump(u, n) = u+ n+ + u- n-  (scalar u: vector
    result; vector u: scalar via dot) — UFL semantics."""
    e = as_expr(e)
    ep, em = Restricted(e, "+"), Restricted(e, "-")
    if n is None:
        return Sum(ep, Product(ScalarValue(-1.0), em))
    npl, nmi = Restricted(n, "+"), Restricted(n, "-")
    if e.shape == ():
        return Sum(Product(ep, npl), Product(em, nmi))
    return Sum(Dot(ep, npl), Dot(em, nmi))
