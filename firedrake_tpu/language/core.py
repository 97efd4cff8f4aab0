"""Symbolic expression language — a UFL-compatible subset, built new.

The reference re-exports the external ``ufl`` package wholesale as its user
language (firedrake/__init__.py:48-49).  That package is not available here,
and a TPU-first compiler wants a lean IR anyway, so this module implements
the UFL surface the Firedrake demos/tests use: tensor-shaped expressions,
grad/div/curl, inner/dot/outer, restrictions (+/-), conditionals, measures
and forms.  Free-index notation (ufl.indices) is intentionally deferred;
``as_vector``/``as_matrix`` with fixed component indexing covers the same
ground explicitly.

Design notes (TPU-first):
  * Expressions are immutable DAG nodes with eager shape inference.
  * Smart constructors fold ``Zero`` aggressively, which is what makes
    ``lhs/rhs``/Gateaux-derivative extraction exact (see calculus.py).
  * The compiler (compiler/lowering.py) maps each node 1:1 onto jnp ops
    evaluated at quadrature points — no string codegen anywhere.
"""
from __future__ import annotations

import numpy as np
from functools import cached_property


class Expr:
    """Base of all symbolic expressions."""
    __slots__ = ("operands", "_hash")

    shape: tuple = ()

    def __init__(self, *operands):
        self.operands = operands
        self._hash = None

    # -------------------------------------------------------- arithmetic
    # NB: operands that carry free indices (language/freeindex.py
    # FreeExpr) defer to FreeExpr's reflected operators
    def __add__(self, other):
        if getattr(other, "_is_free_expr", False):
            return NotImplemented
        return Sum(self, as_expr(other))

    def __radd__(self, other):
        return Sum(as_expr(other), self)

    def __sub__(self, other):
        if getattr(other, "_is_free_expr", False):
            return NotImplemented
        return Sum(self, _negate(as_expr(other)))

    def __rsub__(self, other):
        return Sum(as_expr(other), _negate(self))

    def __mul__(self, other):
        from .measure import Measure
        if isinstance(other, Measure):
            return other.integral(self)
        if getattr(other, "_is_free_expr", False):
            return NotImplemented
        return Product(self, as_expr(other))

    def __rmul__(self, other):
        return Product(as_expr(other), self)

    def __truediv__(self, other):
        if getattr(other, "_is_free_expr", False):
            return NotImplemented
        return Division(self, as_expr(other))

    def __rtruediv__(self, other):
        return Division(as_expr(other), self)

    def __pow__(self, other):
        return Power(self, as_expr(other))

    def __neg__(self):
        return _negate(self)

    def __abs__(self):
        return Abs(self)

    def __getitem__(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        from .freeindex import Index, indexed_or_free
        if any(isinstance(i, Index) for i in idx):
            return indexed_or_free(self, idx)
        return Indexed(self, idx)

    def dx(self, *ii):
        """Spatial derivative d(self)/dx_i (ufl Expr.dx): int or free
        Index arguments; repeated indices sum (u.dx(i, i) etc.)."""
        from .freeindex import dx_expand
        return dx_expand(self, ii)

    def __call__(self, side):
        assert side in ("+", "-"), side
        return Restricted(self, side)

    # comparisons build conditions (not booleans)
    def __lt__(self, other):
        return Condition("lt", self, as_expr(other))

    def __le__(self, other):
        return Condition("le", self, as_expr(other))

    def __gt__(self, other):
        return Condition("gt", self, as_expr(other))

    def __ge__(self, other):
        return Condition("ge", self, as_expr(other))

    # NB: __eq__ stays identity-based so Exprs are dict keys; use eq() helper.

    @property
    def T(self):
        from .tensor_algebra import transpose
        return transpose(self)

    # -------------------------------------------------------- structure
    def is_zero(self):
        return isinstance(self, Zero)

    def traverse(self):
        """Preorder DAG traversal (each node once)."""
        seen = set()
        stack = [self]
        while stack:
            e = stack.pop()
            if id(e) in seen:
                continue
            seen.add(id(e))
            yield e
            stack.extend(e.operands)

    def signature(self, renumber=None) -> str:
        """Structural signature for kernel caching (terminal data excluded;
        reference analogue: UFL form signatures in tsfc_interface.py:77)."""
        if renumber is None:
            renumber = {}
        return self._sig(renumber)

    def _sig(self, rn):
        ops = ",".join(o._sig(rn) for o in self.operands)
        return f"{type(self).__name__}({ops})"

    def __repr__(self):
        ops = ", ".join(repr(o) for o in self.operands)
        return f"{type(self).__name__}({ops})"


def as_expr(v):
    if isinstance(v, Expr):
        return v
    if isinstance(v, (int, float, np.integer, np.floating)):
        return ScalarValue(float(v))
    if isinstance(v, (complex, np.complexfloating)):
        return ScalarValue(complex(v))
    if isinstance(v, (list, tuple)):
        from .tensor_algebra import as_vector
        return as_vector(v)
    if isinstance(v, np.ndarray):
        from .tensor_algebra import as_vector, as_matrix
        if v.ndim == 1:
            return as_vector(list(v))
        return as_matrix([[as_expr(x) for x in row] for row in v])
    raise TypeError(f"cannot convert {type(v)} to Expr")


# ------------------------------------------------------------------ leaves
class Terminal(Expr):
    __slots__ = ()

    def __init__(self):
        super().__init__()


class Zero(Terminal):
    __slots__ = ("shape",)

    def __init__(self, shape=()):
        super().__init__()
        self.shape = tuple(shape)

    def _sig(self, rn):
        return f"0{self.shape}"

    def __repr__(self):
        return f"Zero({self.shape})"


class ScalarValue(Terminal):
    """Literal scalar; complex literals are first-class (the reference
    supports complex builds end-to-end — tsfc/ufl_utils.py:48-70)."""
    __slots__ = ("value",)
    shape = ()

    def __init__(self, value):
        super().__init__()
        if isinstance(value, (complex, np.complexfloating)) \
                and complex(value).imag != 0.0:
            self.value = complex(value)
        else:
            self.value = float(np.real(value))

    def _sig(self, rn):
        return f"S({self.value!r})"

    def __repr__(self):
        return f"{self.value}"


class Identity(Terminal):
    __slots__ = ("dim", "shape")

    def __init__(self, dim: int):
        super().__init__()
        self.dim = dim
        self.shape = (dim, dim)

    def _sig(self, rn):
        return f"I({self.dim})"


class PermutationSymbol(Terminal):
    __slots__ = ("dim", "shape")

    def __init__(self, dim: int):
        super().__init__()
        self.dim = dim
        self.shape = (dim,) * dim

    def _sig(self, rn):
        return f"eps({self.dim})"


class Argument(Terminal):
    """Test (number 0) / trial (number 1) function.
    Reference: firedrake/ufl_expr.py:21."""
    __slots__ = ("space", "number", "part", "shape")

    def __init__(self, space, number: int, part=None):
        super().__init__()
        self.space = space
        self.number = number
        self.part = part
        self.shape = tuple(space.value_shape)

    def function_space(self):
        return self.space

    def _sig(self, rn):
        # the signature must distinguish the SAME element appearing as
        # different parts of different mixed spaces (assembler cache key)
        parent = getattr(self.space, "parent", None)
        ctx = getattr(self.space, "restriction_sig", "")
        if parent is not None:
            ctx += "|" + ",".join(repr(V.element)
                                  for V in parent.subspaces) \
                + f"@{self.part}"
        return f"Arg{self.number}[{self.space.element!r}{ctx}]"

    def __repr__(self):
        return f"{'vu'[min(self.number,1)]}_{self.number}"


class Coefficient(Terminal):
    """A known field: subclassed by Function; carries runtime data.
    Reference: ufl.Coefficient consumed at firedrake/function.py:213."""
    __slots__ = ("space", "shape", "count")

    _count = [0]

    def __init__(self, space):
        super().__init__()
        self.space = space
        self.shape = tuple(space.value_shape)
        Coefficient._count[0] += 1
        self.count = Coefficient._count[0]

    def function_space(self):
        return self.space

    def _sig(self, rn):
        n = rn.setdefault(id(self), len(rn))
        return f"w{n}[{self.space.element!r}]"

    def __repr__(self):
        return f"w_{self.count}"


class ConstantBase(Terminal):
    """Spatially-constant coefficient; value is a runtime kernel argument
    (reference: firedrake/constant.py:43)."""
    __slots__ = ("shape", "count", "_value")

    _count = [0]

    @staticmethod
    def _coerce(value):
        v = np.asarray(value)
        return v.astype(np.complex128) if np.iscomplexobj(v) \
            else v.astype(np.float64)

    def __init__(self, value):
        super().__init__()
        v = self._coerce(value)
        self._value = v
        self.shape = v.shape
        ConstantBase._count[0] += 1
        self.count = ConstantBase._count[0]

    def values(self):
        return self._value

    def assign(self, value):
        v = self._coerce(value)
        assert v.shape == self.shape or self.shape == ()
        self._value = v.reshape(self.shape)
        return self

    @property
    def dat(self):
        return self._value

    @dat.setter
    def dat(self, value):
        self.assign(value)

    def _sig(self, rn):
        n = rn.setdefault(id(self), len(rn))
        return f"c{n}{self.shape}"

    def __repr__(self):
        return f"Constant({self._value})"

    def __float__(self):
        if self.shape == ():
            return float(self._value)
        raise TypeError("not a scalar Constant")


class GeometricQuantity(Terminal):
    __slots__ = ("mesh", "shape")

    def __init__(self, mesh):
        super().__init__()
        self.mesh = mesh
        self.shape = self._shape(mesh)

    def _shape(self, mesh):
        return ()

    def _sig(self, rn):
        return type(self).__name__

    def __repr__(self):
        return type(self).__name__


class SpatialCoordinate(GeometricQuantity):
    __slots__ = ()

    def _shape(self, mesh):
        return (mesh.geometric_dimension,)


class FacetNormal(GeometricQuantity):
    __slots__ = ()

    def _shape(self, mesh):
        return (mesh.geometric_dimension,)


class CellDiameter(GeometricQuantity):
    __slots__ = ()


class CellVolume(GeometricQuantity):
    __slots__ = ()


class FacetArea(GeometricQuantity):
    __slots__ = ()


class CellOrientation(GeometricQuantity):
    __slots__ = ()


# ------------------------------------------------------------- operators
def _negate(e):
    if e.is_zero():
        return e
    if isinstance(e, ScalarValue):
        return ScalarValue(-e.value)
    return Product(ScalarValue(-1.0), e)


class Sum(Expr):
    __slots__ = ("shape",)

    def __new__(cls, a, b):
        a, b = as_expr(a), as_expr(b)
        if a.shape != b.shape:
            raise ValueError(f"shape mismatch in +: {a.shape} vs {b.shape}")
        if a.is_zero():
            return b
        if b.is_zero():
            return a
        if isinstance(a, ScalarValue) and isinstance(b, ScalarValue):
            return ScalarValue(a.value + b.value)
        self = object.__new__(cls)
        return self

    def __init__(self, a, b):
        if getattr(self, "operands", None) is not None:
            return   # already built by __new__ short-circuit path
        a, b = as_expr(a), as_expr(b)
        super().__init__(a, b)
        self.shape = a.shape


class Product(Expr):
    """scalar * anything (UFL's `*` semantics)."""
    __slots__ = ("shape",)

    def __new__(cls, a, b):
        a, b = as_expr(a), as_expr(b)
        if a.shape != () and b.shape != ():
            raise ValueError("`*` needs at least one scalar operand; "
                             "use dot/inner/outer")
        if a.is_zero() or b.is_zero() \
                or (isinstance(a, ScalarValue) and a.value == 0.0) \
                or (isinstance(b, ScalarValue) and b.value == 0.0):
            return Zero(a.shape if a.shape else b.shape)
        if isinstance(a, ScalarValue) and isinstance(b, ScalarValue):
            return ScalarValue(a.value * b.value)
        if isinstance(a, ScalarValue) and a.value == 1.0:
            return b
        if isinstance(b, ScalarValue) and b.value == 1.0:
            return a
        return object.__new__(cls)

    def __init__(self, a, b):
        if getattr(self, "operands", None) is not None:
            return
        a, b = as_expr(a), as_expr(b)
        super().__init__(a, b)
        self.shape = a.shape if a.shape else b.shape


class Division(Expr):
    __slots__ = ("shape",)

    def __new__(cls, a, b):
        a, b = as_expr(a), as_expr(b)
        if b.shape != ():
            raise ValueError("divisor must be scalar")
        if a.is_zero():
            return a
        if isinstance(a, ScalarValue) and isinstance(b, ScalarValue):
            return ScalarValue(a.value / b.value)
        return object.__new__(cls)

    def __init__(self, a, b):
        if getattr(self, "operands", None) is not None:
            return
        a, b = as_expr(a), as_expr(b)
        super().__init__(a, b)
        self.shape = a.shape


class Power(Expr):
    __slots__ = ()
    shape = ()

    def __new__(cls, a, b):
        a, b = as_expr(a), as_expr(b)
        if a.shape != () or b.shape != ():
            raise ValueError("pow needs scalars")
        if isinstance(a, ScalarValue) and isinstance(b, ScalarValue):
            return ScalarValue(a.value ** b.value)
        return object.__new__(cls)

    def __init__(self, a, b):
        if getattr(self, "operands", None) is not None:
            return
        super().__init__(as_expr(a), as_expr(b))


class Abs(Expr):
    __slots__ = ("shape",)

    def __init__(self, a):
        a = as_expr(a)
        super().__init__(a)
        self.shape = a.shape


# -------------------------------------------------------- complex support
# Reference: complex UFL preprocessing (tsfc/ufl_utils.py:18,48-70) and
# complex-mode selection (tsfc/driver.py:86,247).  Complex-mode here is a
# process-level switch: when enabled, inner() conjugates its second
# argument (the UFL sesquilinear convention; dot() stays bilinear) so
# reference complex demos port unchanged; Conj/Real/Imag lower to
# jnp.conj/.real/.imag (identity / projection on real data).

_COMPLEX_MODE = [False]


def set_complex_mode(on: bool):
    """Enable the sesquilinear convention (inner conjugates its second
    argument).  Matches the reference's complex-build behavior."""
    prev = _COMPLEX_MODE[0]
    _COMPLEX_MODE[0] = bool(on)
    return prev


def is_complex_mode() -> bool:
    return _COMPLEX_MODE[0]


class _ComplexUnary(Expr):
    """Shape-preserving pointwise complex projection/involution."""
    __slots__ = ("shape",)

    def __new__(cls, a):
        a = as_expr(a)
        if a.is_zero():
            return Zero(a.shape)
        return object.__new__(cls)

    def __init__(self, a):
        if getattr(self, "operands", None) is not None:
            return
        a = as_expr(a)
        super().__init__(a)
        self.shape = a.shape


class Conj(_ComplexUnary):
    """Complex conjugate (identity on real data)."""

    def __new__(cls, a):
        a = as_expr(a)
        if isinstance(a, ScalarValue):
            v = a.value
            return ScalarValue(v.conjugate() if isinstance(v, complex)
                               else v)
        if isinstance(a, Conj):               # conj(conj(x)) == x
            return a.operands[0]
        return super().__new__(cls, a)


class Real(_ComplexUnary):
    pass


class Imag(_ComplexUnary):
    def __new__(cls, a):
        a = as_expr(a)
        if isinstance(a, ScalarValue) and not isinstance(a.value, complex):
            return Zero(())
        return super().__new__(cls, a)


class MathFunction(Expr):
    """Pointwise scalar math: sin, cos, exp, ... (jnp namesakes)."""
    __slots__ = ("fname",)
    shape = ()

    def __init__(self, fname: str, a):
        a = as_expr(a)
        if a.shape != ():
            raise ValueError(f"{fname} needs a scalar")
        super().__init__(a)
        self.fname = fname

    def _sig(self, rn):
        return f"{self.fname}({self.operands[0]._sig(rn)})"


class Atan2(Expr):
    __slots__ = ()
    shape = ()

    def __init__(self, y, x):
        super().__init__(as_expr(y), as_expr(x))


class MinMax(Expr):
    __slots__ = ("which",)
    shape = ()

    def __init__(self, which, a, b):
        super().__init__(as_expr(a), as_expr(b))
        self.which = which

    def _sig(self, rn):
        return f"{self.which}({','.join(o._sig(rn) for o in self.operands)})"


class Indexed(Expr):
    __slots__ = ("indices", "shape")

    def __new__(cls, e, idx):
        e = as_expr(e)
        idx = tuple(int(i) for i in idx)
        if len(idx) > len(e.shape):
            raise ValueError(f"too many indices {idx} for shape {e.shape}")
        for i, n in zip(idx, e.shape):
            if not (0 <= i < n):
                raise IndexError(f"index {i} out of range for {n}")
        if e.is_zero():
            return Zero(e.shape[len(idx):])
        from .tensor_algebra import ListTensor
        if isinstance(e, ListTensor) and len(idx) >= 1:
            comp = e.component(idx[:1])
            return Indexed(comp, idx[1:]) if len(idx) > 1 else comp
        return object.__new__(cls)

    def __init__(self, e, idx):
        if getattr(self, "operands", None) is not None:
            return
        e = as_expr(e)
        idx = tuple(int(i) for i in idx)
        super().__init__(e)
        self.indices = idx
        self.shape = e.shape[len(idx):]

    def _sig(self, rn):
        return f"Ix{self.indices}({self.operands[0]._sig(rn)})"


# ------------------------------------------------------ spatial derivatives
class Grad(Expr):
    __slots__ = ("shape",)

    def __new__(cls, e):
        e = as_expr(e)
        if e.is_zero():
            gdim = _guess_gdim(e)
            return Zero(e.shape + (gdim,))
        if isinstance(e, (ScalarValue, ConstantBase, Identity)):
            # spatially constant
            return Zero(e.shape + (_guess_gdim(e),))
        return object.__new__(cls)

    def __init__(self, e):
        if getattr(self, "operands", None) is not None:
            return
        e = as_expr(e)
        super().__init__(e)
        gdim = _expr_gdim(e)
        self.shape = e.shape + (gdim,)


def _guess_gdim(e):
    try:
        return _expr_gdim(e)
    except Exception:
        return 0


def _expr_gdim(e) -> int:
    """Geometric dimension from any mesh-bearing terminal in the DAG."""
    for t in e.traverse():
        if isinstance(t, (Argument, Coefficient)):
            return t.space.mesh_obj.geometric_dimension
        if isinstance(t, GeometricQuantity):
            return t.mesh.geometric_dimension
    raise ValueError("cannot infer geometric dimension (no mesh terminals); "
                     "wrap constants with a mesh-aware expression")


class Restricted(Expr):
    """u('+') / u('-') on interior facets (UFL restriction)."""
    __slots__ = ("side", "shape")

    def __new__(cls, e, side):
        e = as_expr(e)
        if e.is_zero():
            return e
        if isinstance(e, Restricted):
            raise ValueError("double restriction")
        return object.__new__(cls)

    def __init__(self, e, side):
        if getattr(self, "operands", None) is not None:
            return
        e = as_expr(e)
        super().__init__(e)
        self.side = side
        self.shape = e.shape

    def _sig(self, rn):
        return f"R{self.side}({self.operands[0]._sig(rn)})"


# --------------------------------------------------------------- conditions
class Condition(Expr):
    __slots__ = ("op",)
    shape = ()

    def __init__(self, op, a, b):
        super().__init__(as_expr(a), as_expr(b))
        self.op = op

    def _sig(self, rn):
        return f"{self.op}({','.join(o._sig(rn) for o in self.operands)})"


class BoolOp(Expr):
    __slots__ = ("op",)
    shape = ()

    def __init__(self, op, *args):
        super().__init__(*args)
        self.op = op

    def _sig(self, rn):
        return f"{self.op}({','.join(o._sig(rn) for o in self.operands)})"


class Conditional(Expr):
    __slots__ = ("shape",)

    def __init__(self, cond, t, f):
        t, f = as_expr(t), as_expr(f)
        if t.shape != f.shape:
            raise ValueError("conditional branches must share shape")
        super().__init__(cond, t, f)
        self.shape = t.shape
