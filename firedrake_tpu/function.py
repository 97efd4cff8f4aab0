"""Function / Cofunction / Constant containers.

Reference: firedrake/function.py:213 (Function over a pyop2.Dat),
firedrake/cofunction.py:22, firedrake/constant.py:43.  Here the dat is a
flat jnp/numpy array of length V.dim — node-major, component-minor — living
wherever JAX put it (device for solver outputs, host for setup)."""
from __future__ import annotations

import numpy as np

from .language.core import Coefficient, ConstantBase
from .functionspace import FunctionSpace


class Function(Coefficient):
    """A field in a FunctionSpace; usable directly in forms."""

    def __new__(cls, V, *args, **kwargs):
        from .mixed import MixedFunctionSpace
        if cls in (Function, Cofunction) and isinstance(
                V, MixedFunctionSpace):
            obj = super().__new__(MixedFunction)
            # Python only calls __init__ when isinstance(obj, cls);
            # MixedFunction is not a Cofunction subclass, so init here.
            if not isinstance(obj, cls):
                obj.__init__(V, *args, **kwargs)
            return obj
        return super().__new__(cls)

    def __init__(self, V: FunctionSpace, val=None, name: str | None = None,
                 dtype=None):
        if isinstance(V, Function):   # Function(Function) copies
            other = V
            V = other.function_space()
            super().__init__(V)
            self.dat = np.array(other.dat, copy=True)
            self.name = name or f"{other.name}_copy"
            return
        super().__init__(V)
        self.name = name or f"f_{self.count}"
        if val is not None:
            self.dat = np.asarray(val).reshape(-1)
            assert self.dat.size == V.dim
        else:
            self.dat = np.zeros(V.dim, dtype=dtype or np.float64)

    # ------------------------------------------------------------- access
    def function_space(self):
        return self.space

    def copy(self, deepcopy=True):
        return Function(self)

    def zero(self):
        self.dat = np.zeros_like(np.asarray(self.dat))
        return self

    @property
    def dat_array(self):
        return np.asarray(self.dat)

    def vector(self):
        return self.dat

    def split(self):
        return (self,)

    def subfunctions(self):
        return (self,)

    # ------------------------------------------------------------- assign
    def assign(self, expr, subset=None):
        """u.assign(v), u.assign(2*v + w), u.assign(scalar) — pointwise on
        dats (reference: firedrake/assign.py:35 CoefficientCollector)."""
        import numpy as _np
        val = _eval_pointwise(expr, self.space)
        if _np.isscalar(val):
            self.dat = _np.full(self.space.dim, float(val))
        else:
            self.dat = val
        # tape the state hand-off of time loops (pyadjoint assign block)
        from .adjoint.tape import annotate_tape
        if annotate_tape() and isinstance(expr, Function):
            from .adjoint.tape import AssignBlock, get_working_tape
            get_working_tape().add_block(AssignBlock(self, expr))
        return self

    def interpolate(self, expr):
        from .interpolation import interpolate_onto
        interpolate_onto(expr, self)
        return self

    def project(self, expr, **kwargs):
        from .projection import project
        return project(expr, self, **kwargs)

    def at(self, *args, **kwargs):
        """Evaluate at physical points (reference: function.py:569)."""
        from .pointeval import at as _at
        if len(args) == 1:
            return _at(self, args[0], **kwargs)
        return _at(self, np.asarray(args, dtype=float), **kwargs)

    def __call__(self, arg):
        # Coefficient('+'/'-') restriction, else point evaluation
        if arg in ("+", "-"):
            return super().__call__(arg)
        return self.at(arg)

    def riesz_representation(self, riesz_map="L2"):
        """Primal/dual conversion (reference: cofunction.py:412
        RieszMap): 'l2' copies the dat; 'L2' solves the mass system;
        'H1' solves the H1 inner-product system."""
        from .assemble import assemble
        from .language import TestFunction, TrialFunction, inner, dx, grad
        if riesz_map == "l2":
            out = (Function if isinstance(self, Cofunction)
                   else Cofunction)(self.space)
            out.dat = np.asarray(self.dat)
            return out
        if riesz_map in ("L2", "H1"):
            from .solvers.preconditioners import direct_solve
            u = TrialFunction(self.space)
            v = TestFunction(self.space)
            a = inner(u, v) * dx
            if riesz_map == "H1":
                a = a + inner(grad(u), grad(v)) * dx
            M = assemble(a)
            if isinstance(self, Cofunction):
                # dual -> primal: solve the Gram system
                out = Function(self.space)
                out.dat = np.asarray(direct_solve(M,
                                                  np.asarray(self.dat)))
            else:
                # primal -> dual: APPLY the Gram matrix (reference
                # cofunction.py RieszMap — the inverse map solves, the
                # forward map multiplies)
                import jax.numpy as jnp
                out = Cofunction(self.space)
                out.dat = np.asarray(M.matvec(jnp.asarray(self.dat)))
            return out
        raise NotImplementedError(f"riesz map {riesz_map!r}")

    def __repr__(self):
        return f"Function({self.name!r}, {self.space!r})"

    def __str__(self):
        return self.name


class Cofunction(Function):
    """Dual-space container (assembled 1-forms). Reference:
    firedrake/cofunction.py:22."""
    pass


class MixedFunction(Function):
    """Function on a MixedFunctionSpace: a tuple of per-field Functions
    sharing one logical concatenated dof vector (reference: pyop2
    MixedDat, firedrake Function.subfunctions)."""

    def __init__(self, W, val=None, name=None, dtype=None):
        from .language.core import Coefficient as _Co
        _Co.__init__(self, W)
        self.name = name or f"w_{self.count}"
        self.parts = tuple(Function(V, name=f"{self.name}[{i}]")
                           for i, V in enumerate(W.subspaces))
        if val is not None:
            self.dat = val

    @property
    def dat(self):
        return np.concatenate([np.asarray(p.dat) for p in self.parts])

    @dat.setter
    def dat(self, value):
        W = self.space
        v = np.asarray(value).reshape(-1)
        assert v.size == W.dim
        for p, off in zip(self.parts, W.offsets):
            p.dat = v[off:off + p.space.dim]

    def function_space(self):
        return self.space

    def split(self):
        return self.parts

    @property
    def subfunctions(self):
        return self.parts

    def sub(self, i):
        return self.parts[i]

    def __getitem__(self, idx):
        """Flat value-component indexing, the ufl mixed-element
        convention: subspace components concatenate, so w[2] on
        RT1 x DG0 is the DG scalar and w[0], w[1] are the RT vector's
        components (reference: ufl MixedElement extract_component,
        exercised by tests/firedrake/regression/test_helmholtz_mixed.py
        `sol[2]`)."""
        single = idx[0] if (isinstance(idx, tuple)
                            and len(idx) == 1) else idx
        if isinstance(single, (int, np.integer)):
            i = int(single)
            for p in self.parts:
                vs = p.space.value_shape
                n = int(np.prod(vs)) if vs else 1
                if i < n:
                    return p[i] if vs else p
                i -= n
            raise IndexError(f"component {int(single)} out of range")
        return super().__getitem__(idx)

    def assign(self, other):
        if isinstance(other, MixedFunction):
            for p, q in zip(self.parts, other.parts):
                p.dat = np.asarray(q.dat).copy()
            return self
        if isinstance(other, (int, float)):
            for p in self.parts:
                p.assign(other)
            return self
        raise NotImplementedError("mixed assign of expressions")

    def copy(self, deepcopy=True):
        out = MixedFunction(self.space, name=f"{self.name}_copy")
        out.assign(self)
        return out

    def zero(self):
        for p in self.parts:
            p.zero()
        return self


class Constant(ConstantBase):
    """Spatially constant value (scalar or shaped).
    Reference: firedrake/constant.py:43."""

    def __init__(self, value, domain=None, name=None):
        super().__init__(value)
        self.name = name or f"c_{self.count}"


def _eval_pointwise(expr, V):
    """Evaluate expr as a linear combination over dats for fast assign."""
    from .language.core import (Expr, ScalarValue, Sum, Product, Division,
                                ConstantBase, Zero)
    if isinstance(expr, (int, float)):
        return float(expr)
    if isinstance(expr, ScalarValue):
        return expr.value
    if isinstance(expr, Zero):
        return 0.0
    if isinstance(expr, ConstantBase):
        v = expr.values()
        if v.shape == ():
            return float(v)
        return np.tile(np.asarray(v).reshape(-1), V.num_nodes)
    if isinstance(expr, Function):
        if expr.space is not V and expr.space != V:
            raise ValueError("assign requires matching function spaces; "
                             "use interpolate/project")
        return np.asarray(expr.dat)
    if isinstance(expr, Sum):
        a = _eval_pointwise(expr.operands[0], V)
        b = _eval_pointwise(expr.operands[1], V)
        return a + b
    if isinstance(expr, Product):
        a = _eval_pointwise(expr.operands[0], V)
        b = _eval_pointwise(expr.operands[1], V)
        return a * b
    if isinstance(expr, Division):
        a = _eval_pointwise(expr.operands[0], V)
        b = _eval_pointwise(expr.operands[1], V)
        return a / b
    raise NotImplementedError(
        f"assign cannot evaluate {type(expr).__name__} pointwise; "
        "use interpolate")
