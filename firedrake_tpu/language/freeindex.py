"""Free-index (Einstein summation) notation: ``i, j = indices(2);
A[i, j] * u[j]``.

Reference surface: ufl.indices / ufl.Index / Indexed / IndexSum /
ComponentTensor, re-exported wholesale by firedrake
(/root/reference/firedrake/__init__.py:48-49).  The TPU build keeps the
core expression DAG free-index-free: a ``FreeExpr`` is a host-side map
from index assignments to ordinary component Exprs, expanded EAGERLY
when indices close (value shapes are tiny and static, so expansion is a
trace-time loop — the compiler and every downstream layer are
untouched).  Summation follows UFL: an index repeated within one
``expr[...]``, shared between the factors of a product, or repeated in
``.dx(...)`` is summed; addition requires matching free index sets.
"""
from __future__ import annotations

import itertools

__all__ = ["Index", "indices", "FreeExpr"]


class Index:
    """A symbolic (free) index."""

    _count = 0

    def __init__(self):
        Index._count += 1
        self.count = Index._count

    def __repr__(self):
        return f"i_{self.count}"


def indices(n):
    """n fresh free indices (ufl.indices)."""
    return tuple(Index() for _ in range(n))


def _is_free(x):
    return isinstance(x, FreeExpr)


def _lift(x):
    from .core import as_expr
    if _is_free(x):
        return x
    e = as_expr(x)
    return FreeExpr(lambda assign, e=e: e, {})


def _wrap(build, dims):
    """Collapse to a plain Expr when no free indices remain."""
    if not dims:
        return build({})
    return FreeExpr(build, dims)


def _sum_build(build, summed, dims_of):
    """Sum `build` over all assignments of the indices in `summed`."""
    if not summed:
        return build

    def summed_build(assign):
        total = None
        for vals in itertools.product(*[range(dims_of[i]) for i in summed]):
            a2 = dict(assign)
            a2.update(zip(summed, vals))
            term = build(a2)
            total = term if total is None else total + term
        return total
    return summed_build


def _binop(a, b, op, contract):
    A, B = _lift(a), _lift(b)
    dims = {**A.dims, **B.dims}
    if contract:
        shared = [i for i in A.dims if i in B.dims]
    else:
        if set(A.dims) != set(B.dims):
            raise ValueError(
                f"free-index mismatch in sum: {tuple(A.dims)} vs "
                f"{tuple(B.dims)}")
        shared = []
    out_dims = {i: n for i, n in dims.items() if i not in shared}
    build = _sum_build(lambda a2: op(A.build(a2), B.build(a2)),
                       shared, dims)
    return _wrap(build, out_dims)


def indexed_or_free(e, idx):
    """Hook for Expr.__getitem__: plain ints build an Indexed; Index
    objects build a FreeExpr (an index repeated in idx is summed)."""
    from .core import Indexed
    if not any(isinstance(i, Index) for i in idx):
        return Indexed(e, idx)
    if len(idx) > len(e.shape):
        raise ValueError(f"too many indices {idx} for shape {e.shape}")
    dims = {}
    summed = []
    for pos, i in enumerate(idx):
        if not isinstance(i, Index):
            continue
        n = e.shape[pos]
        if i in dims:
            if dims[i] != n:
                raise ValueError(f"index {i} used with dimensions "
                                 f"{dims[i]} and {n}")
            summed.append(i)
        else:
            dims[i] = n
    out_dims = {i: n for i, n in dims.items() if i not in summed}

    def build(assign):
        comp = tuple(assign[i] if isinstance(i, Index) else int(i)
                     for i in idx)
        return Indexed(e, comp)

    return _wrap(_sum_build(build, summed, dims), out_dims)


def _index_trailing(base, trail):
    """Index the TRAILING len(trail) axes of `base` with fixed ints,
    keeping the leading axes as a ListTensor (u.dx(i) on a vector u)."""
    from .core import Indexed
    from .tensor_algebra import ListTensor
    lead = base.shape[:len(base.shape) - len(trail)]
    if not lead:
        return Indexed(base, trail)

    def rec(shape, pre):
        if not shape:
            return Indexed(base, tuple(pre) + tuple(trail))
        return ListTensor(*[rec(shape[1:], pre + [k])
                            for k in range(shape[0])])
    return rec(lead, [])


def dx_expand(expr, ii):
    """expr.dx(*ii): spatial derivatives indexed by ints or free
    Indices; a repeated Index (within ii, or shared with expr's free
    set) is summed (u[i].dx(i) == div(u), u.dx(i, i) == Laplacian)."""
    from .core import as_expr, _expr_gdim
    from .operators import grad
    E = _lift(expr)
    probe = E.build({i: 0 for i in E.dims})
    g = _expr_gdim(as_expr(probe))
    d = len(ii)
    occur = {}
    for i in ii:
        if isinstance(i, Index):
            occur[i] = occur.get(i, 0) + (2 if i in E.dims else 1)
    summed = [i for i, c in occur.items() if c >= 2]
    dims = dict(E.dims)
    for i in ii:
        if isinstance(i, Index) and i not in dims:
            dims[i] = g
        elif isinstance(i, Index) and i not in E.dims and dims[i] != g:
            raise ValueError(f"index {i} used with dimensions "
                             f"{dims[i]} and {g}")
    out_dims = {i: n for i, n in dims.items() if i not in summed}

    def build(assign):
        e = E.build({i: assign[i] for i in E.dims})
        for _ in range(d):
            e = grad(e)
        trail = tuple(assign[i] if isinstance(i, Index) else int(i)
                      for i in ii)
        return _index_trailing(as_expr(e), trail)

    return _wrap(_sum_build(build, summed, dims), out_dims)


class FreeExpr:
    """An expression carrying free indices: dict-of-assignment -> Expr."""

    _is_free_expr = True

    def __init__(self, build, dims):
        self.build = build
        self.dims = dict(dims)          # {Index: dimension}

    @property
    def free_indices(self):
        return tuple(self.dims)

    # ------------------------------------------------------- arithmetic
    def __add__(self, other):
        return _binop(self, other, lambda a, b: a + b, contract=False)

    def __radd__(self, other):
        return _binop(other, self, lambda a, b: a + b, contract=False)

    def __sub__(self, other):
        return _binop(self, other, lambda a, b: a - b, contract=False)

    def __rsub__(self, other):
        return _binop(other, self, lambda a, b: a - b, contract=False)

    def __mul__(self, other):
        from .measure import Measure
        if isinstance(other, Measure):
            raise ValueError(
                f"integrand has free indices {self.free_indices}; sum "
                "or as_tensor() them away first")
        return _binop(self, other, lambda a, b: a * b, contract=True)

    def __rmul__(self, other):
        return _binop(other, self, lambda a, b: a * b, contract=True)

    def __truediv__(self, other):
        if _is_free(other):
            raise ValueError("cannot divide by an expression with free "
                             "indices")
        d = _lift(other)
        return _wrap(lambda a2: self.build(a2) / d.build({}), self.dims)

    def __rtruediv__(self, other):
        raise ValueError("cannot divide by an expression with free "
                         "indices")

    def __neg__(self):
        return _wrap(lambda a2: -self.build(a2), self.dims)

    def __getitem__(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)

        def build(assign):
            base = self.build({i: assign[i] for i in self.dims})
            from .core import as_expr
            sub = indexed_or_free(as_expr(base), idx)
            if _is_free(sub):
                return sub.build(assign)
            return sub
        dims = dict(self.dims)
        summed = []
        probe = self.build({i: 0 for i in self.dims})
        from .core import as_expr
        shp = as_expr(probe).shape
        for pos, i in enumerate(idx):
            if isinstance(i, Index):
                if i in dims:
                    summed.append(i)
                else:
                    dims[i] = shp[pos]
        out_dims = {i: n for i, n in dims.items() if i not in summed}
        return _wrap(_sum_build(build, summed, dims), out_dims)

    def dx(self, *ii):
        return dx_expand(self, ii)

    def __call__(self, side):
        return _wrap(lambda a2: self.build(a2)(side), self.dims)

    def __repr__(self):
        return f"FreeExpr(free={self.free_indices})"


def as_tensor_free(expr, ii):
    """ufl.as_tensor(expr, (i, j)): rebuild a tensor from a free-index
    expression (the ComponentTensor role)."""
    from .tensor_algebra import ListTensor
    from .core import as_expr
    E = _lift(expr)
    if isinstance(ii, Index):
        ii = (ii,)
    if set(ii) != set(E.dims):
        raise ValueError(f"as_tensor indices {ii} != free indices "
                         f"{E.free_indices}")

    def rec(rest, assign):
        if not rest:
            return as_expr(E.build(assign))
        i = rest[0]
        return ListTensor(*[rec(rest[1:], {**assign, i: k})
                            for k in range(E.dims[i])])
    return rec(tuple(ii), {})
