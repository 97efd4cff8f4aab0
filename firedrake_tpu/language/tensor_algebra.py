"""Tensor-algebra nodes and helpers: inner/dot/outer/cross, transpose, trace,
det, inverse, sym/skew/dev, as_vector/as_matrix (UFL surface)."""
from __future__ import annotations

import numpy as np

from .core import (Expr, Zero, ScalarValue, as_expr, Identity, Product, Sum,
                   Indexed)


class Inner(Expr):
    """Full contraction of two same-shape tensors -> scalar."""
    __slots__ = ()
    shape = ()

    def __new__(cls, a, b):
        a, b = as_expr(a), as_expr(b)
        if a.shape != b.shape:
            raise ValueError(f"inner: shape mismatch {a.shape} vs {b.shape}")
        if a.is_zero() or b.is_zero():
            return Zero(())
        if a.shape == ():
            return Product(a, b)
        return object.__new__(cls)

    def __init__(self, a, b):
        if getattr(self, "operands", None) is not None:
            return
        super().__init__(as_expr(a), as_expr(b))


class Dot(Expr):
    """Contract last axis of a with first axis of b."""
    __slots__ = ("shape",)

    def __new__(cls, a, b):
        a, b = as_expr(a), as_expr(b)
        if a.shape == () or b.shape == ():
            return Product(a, b)
        if a.shape[-1] != b.shape[0]:
            raise ValueError(f"dot: {a.shape} . {b.shape}")
        if a.is_zero() or b.is_zero():
            return Zero(a.shape[:-1] + b.shape[1:])
        return object.__new__(cls)

    def __init__(self, a, b):
        if getattr(self, "operands", None) is not None:
            return
        a, b = as_expr(a), as_expr(b)
        super().__init__(a, b)
        self.shape = a.shape[:-1] + b.shape[1:]


class Outer(Expr):
    __slots__ = ("shape",)

    def __new__(cls, a, b):
        a, b = as_expr(a), as_expr(b)
        if a.is_zero() or b.is_zero():
            return Zero(a.shape + b.shape)
        if a.shape == () or b.shape == ():
            return Product(a, b)
        return object.__new__(cls)

    def __init__(self, a, b):
        if getattr(self, "operands", None) is not None:
            return
        a, b = as_expr(a), as_expr(b)
        super().__init__(a, b)
        self.shape = a.shape + b.shape


class Cross(Expr):
    __slots__ = ()
    shape = (3,)

    def __init__(self, a, b):
        a, b = as_expr(a), as_expr(b)
        if a.shape != (3,) or b.shape != (3,):
            raise ValueError("cross needs 3-vectors")
        super().__init__(a, b)


class Transpose(Expr):
    __slots__ = ("shape",)

    def __new__(cls, a):
        a = as_expr(a)
        if len(a.shape) != 2:
            raise ValueError("transpose needs a matrix")
        if a.is_zero():
            return Zero(a.shape[::-1])
        if isinstance(a, Transpose):
            return a.operands[0]
        return object.__new__(cls)

    def __init__(self, a):
        if getattr(self, "operands", None) is not None:
            return
        a = as_expr(a)
        super().__init__(a)
        self.shape = a.shape[::-1]


class Trace(Expr):
    __slots__ = ()
    shape = ()

    def __new__(cls, a):
        a = as_expr(a)
        if len(a.shape) != 2 or a.shape[0] != a.shape[1]:
            raise ValueError("tr needs a square matrix")
        if a.is_zero():
            return Zero(())
        return object.__new__(cls)

    def __init__(self, a):
        if getattr(self, "operands", None) is not None:
            return
        super().__init__(as_expr(a))


class Determinant(Expr):
    __slots__ = ()
    shape = ()

    def __init__(self, a):
        a = as_expr(a)
        if len(a.shape) != 2 or a.shape[0] != a.shape[1]:
            raise ValueError("det needs a square matrix")
        super().__init__(a)


class Inverse(Expr):
    __slots__ = ("shape",)

    def __init__(self, a):
        a = as_expr(a)
        if len(a.shape) != 2 or a.shape[0] != a.shape[1]:
            raise ValueError("inv needs a square matrix")
        super().__init__(a)
        self.shape = a.shape


class ListTensor(Expr):
    """Explicit tensor from components (UFL as_vector/as_matrix)."""
    __slots__ = ("shape",)

    def __init__(self, *components):
        comps = tuple(as_expr(c) for c in components)
        s0 = comps[0].shape
        if any(c.shape != s0 for c in comps):
            raise ValueError("components must share shape")
        super().__init__(*comps)
        self.shape = (len(comps),) + s0

    def component(self, idx):
        return self.operands[idx[0]]


# ------------------------------------------------------------------ helpers
def inner(a, b):
    from .core import is_complex_mode, Conj
    if is_complex_mode():
        # sesquilinear convention (UFL/tsfc complex mode): conjugate-
        # linear in the second argument
        return Inner(a, Conj(as_expr(b)))
    return Inner(a, b)


def dot(a, b):
    return Dot(a, b)


def outer(a, b):
    return Outer(a, b)


def cross(a, b):
    return Cross(a, b)


def transpose(a):
    return Transpose(a)


def tr(a):
    return Trace(a)


def det(a):
    return Determinant(a)


def inv(a):
    return Inverse(a)


def sym(a):
    a = as_expr(a)
    return Product(ScalarValue(0.5), Sum(a, Transpose(a)))


def skew(a):
    a = as_expr(a)
    return Product(ScalarValue(0.5), Sum(a, Product(ScalarValue(-1.0),
                                                    Transpose(a))))


def dev(a):
    a = as_expr(a)
    n = a.shape[0]
    return Sum(a, Product(ScalarValue(-1.0 / n),
                          Product(Trace(a), Identity(n))))


def as_vector(components, index=None):
    if index is not None or getattr(components, "_is_free_expr", False):
        from .freeindex import as_tensor_free
        return as_tensor_free(components, index)
    return ListTensor(*components)


def as_matrix(rows):
    return ListTensor(*[ListTensor(*[as_expr(x) for x in row])
                        for row in rows])


def as_tensor(arr, indices=None):
    if indices is not None or getattr(arr, "_is_free_expr", False):
        from .freeindex import as_tensor_free
        return as_tensor_free(arr, indices)
    if isinstance(arr, Expr):
        return arr
    if isinstance(arr[0], (list, tuple)):
        return as_matrix(arr)
    return as_vector(arr)
