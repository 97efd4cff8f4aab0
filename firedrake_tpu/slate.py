"""Slate: element-local dense linear algebra on assembled tensors.

Reference: firedrake/slate/slate.py (Tensor :862, AssembledVector, Inverse
:1075, Transpose :1117, Solve :1311, Block :600) compiled by slac through
GEM/loopy with LAPACK callables (pyop2/codegen/c/inverse.c).

TPU-native design: a Slate expression evaluates to a BATCH of per-cell
dense tensors (ncell, ni[, nj]) — exactly the shape the MXU wants.  Local
kernels are the same vmapped quadrature kernels the assembler uses;
inverse/solve are batched jnp.linalg calls; the final global assembly
scatters through the outer arguments' dof maps.  Everything is one jitted
program (the reference needs generated C + LAPACK for this).

Round-1 scope: cell integrals (the static-condensation use case).  Facet
terms inside Slate tensors (hybridization's trace coupling) follow with
the cell-facet mask machinery.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .language.measure import Form
from .language.core import Argument, Coefficient
from .function import Function, Cofunction


class TensorBase:
    """Base of the Slate expression DAG."""

    def __mul__(self, other):
        return Mul(self, other)

    def __add__(self, other):
        return Add(self, other)

    def __sub__(self, other):
        return Add(self, Negative(other))

    def __neg__(self):
        return Negative(self)

    @property
    def T(self):
        return Transpose(self)

    @property
    def inv(self):
        return Inverse(self)

    def solve(self, b):
        return Solve(self, b)

    def blocks(self, *args, **kwargs):
        return _BlockIndexer(self)

    # rank: number of argument axes (2 matrix, 1 vector)
    rank = None


class Tensor(TensorBase):
    """Element-local tensor of a bilinear/linear form."""

    def __init__(self, form: Form):
        self.form = form
        self.arguments = form.arguments()
        self.rank = len(self.arguments)

    def __repr__(self):
        return f"Tensor(rank={self.rank})"


class AssembledVector(TensorBase):
    """Per-cell view of a global Function/Cofunction (rank 1)."""

    rank = 1

    def __init__(self, f):
        self.f = f
        self.space = f.function_space()


class Transpose(TensorBase):
    def __init__(self, a):
        self.a = a
        self.rank = a.rank


class Negative(TensorBase):
    def __init__(self, a):
        self.a = a
        self.rank = a.rank


class Inverse(TensorBase):
    rank = 2

    def __init__(self, a):
        assert a.rank == 2
        self.a = a


class Add(TensorBase):
    def __init__(self, a, b):
        assert a.rank == b.rank
        self.a, self.b = a, b
        self.rank = a.rank


class Mul(TensorBase):
    def __init__(self, a, b):
        self.a, self.b = a, b
        self.rank = a.rank + b.rank - 2


class Solve(TensorBase):
    def __init__(self, A, b):
        assert A.rank == 2
        self.A, self.b = A, b
        self.rank = b.rank


class _BlockIndexer:
    def __init__(self, tensor):
        self.tensor = tensor

    def __getitem__(self, idx):
        return Block(self.tensor, idx)


class Block(TensorBase):
    """Sub-block by local dof slices (for mixed/condensation splitting)."""

    def __init__(self, a, indices):
        self.a = a
        self.indices = indices if isinstance(indices, tuple) else (indices,)
        self.rank = a.rank


# ------------------------------------------------------------- evaluation
def _local_kernels_for(form: Form):
    """vmapped local assembly (ncell, ni[, nj]) reusing CompiledIntegral."""
    from .assemble import FormAssembler
    asm = FormAssembler(form)
    for ci in asm._compiled:
        if ci.integral_type != "cell":
            raise NotImplementedError(
                "Slate tensors with facet integrals: next milestone")
    return asm


def _eval_local(expr, cache):
    """-> jnp array (ncell, ...) of per-cell dense values."""
    key = id(expr)
    if key in cache:
        return cache[key]
    v = _eval_local_impl(expr, cache)
    cache[key] = v
    return v


def _eval_local_impl(expr, cache):
    if isinstance(expr, Tensor):
        asm = _local_kernels_for(expr.form)
        coords = jnp.asarray(asm.mesh.coordinates.dat)
        cd = {c.count: jnp.asarray(c.dat) for c in asm.coefficients}
        cv = {c.count: jnp.asarray(c.values()) for c in asm.constants}
        # run per-integral kernels WITHOUT the global scatter
        total = None
        for ci, st in zip(asm._compiled, asm._statics):
            kern = ci.kernel()
            consts = tuple(cv[c.count] for c in ci.constants)
            ce = coords[st["coords_map"]]
            ws = tuple(cd[c.count][st["coeff_maps"][c.count]]
                       for c in ci.coefficients)
            loc = jax.vmap(lambda c, *w: kern(c, w, consts))(ce, *ws)
            if st.get("sign_rows") is not None:
                loc = loc * st["sign_rows"][:, :, None]
            if st.get("sign_cols") is not None:
                loc = loc * st["sign_cols"][:, None, :]
            total = loc if total is None else total + loc
        if expr.rank == 1:
            total = total[:, :, 0]
        return total
    if isinstance(expr, AssembledVector):
        V = expr.space
        dat = jnp.asarray(expr.f.dat)
        g = dat[jnp.asarray(V.cell_dof_map)]
        if getattr(V, "has_dof_signs", False):
            g = g * jnp.asarray(V.cell_dof_signs)
        return g
    if isinstance(expr, Transpose):
        v = _eval_local(expr.a, cache)
        return jnp.swapaxes(v, 1, 2) if expr.rank == 2 else v
    if isinstance(expr, Negative):
        return -_eval_local(expr.a, cache)
    if isinstance(expr, Inverse):
        from .ops.batched_inverse import batched_inv
        return batched_inv(_eval_local(expr.a, cache))
    if isinstance(expr, Add):
        return _eval_local(expr.a, cache) + _eval_local(expr.b, cache)
    if isinstance(expr, Mul):
        a = _eval_local(expr.a, cache)
        b = _eval_local(expr.b, cache)
        if expr.a.rank == 2 and expr.b.rank == 2:
            return jnp.einsum("cij,cjk->cik", a, b)
        if expr.a.rank == 2 and expr.b.rank == 1:
            return jnp.einsum("cij,cj->ci", a, b)
        if expr.a.rank == 1 and expr.b.rank == 2:
            return jnp.einsum("ci,cij->cj", a, b)
        raise NotImplementedError
    if isinstance(expr, Solve):
        from .ops.batched_inverse import batched_solve
        A = _eval_local(expr.A, cache)
        b = _eval_local(expr.b, cache)
        return batched_solve(A, b)
    if isinstance(expr, Block):
        v = _eval_local(expr.a, cache)
        sl = (slice(None),) + tuple(expr.indices)
        return v[sl]
    raise NotImplementedError(type(expr).__name__)


def _outer_arguments(expr):
    """Arguments of the resulting global tensor (post contraction)."""
    if isinstance(expr, Tensor):
        return list(expr.form.arguments())
    if isinstance(expr, AssembledVector):
        return []
    if isinstance(expr, (Transpose,)):
        args = _outer_arguments(expr.a)
        return args[::-1]
    if isinstance(expr, (Negative, Block)):
        return _outer_arguments(expr.a)
    if isinstance(expr, Inverse):
        return _outer_arguments(expr.a)[::-1]
    if isinstance(expr, Add):
        return _outer_arguments(expr.a)
    if isinstance(expr, Mul):
        a = _outer_arguments(expr.a)
        b = _outer_arguments(expr.b)
        # contract a's last with b's first
        return a[:-1] + b[1:]
    if isinstance(expr, Solve):
        inv_args = _outer_arguments(expr.A)[::-1]   # [trial, test]
        b_args = _outer_arguments(expr.b)           # [test(, trial)]
        return inv_args[:-1] + b_args[1:]
    raise NotImplementedError


def assemble_slate(expr, bcs=None):
    """Assemble a Slate expression into a global scalar/vector/matrix."""
    from .assembly.sparsity import Sparsity
    from .assembly.matrix import Matrix
    cache = {}
    local = _eval_local(expr, cache)
    args = _outer_arguments(expr)
    if expr.rank == 0:
        return float(jnp.sum(local))
    test = args[0]
    V0 = test.space
    rows = jnp.asarray(V0.cell_dof_map)
    if expr.rank == 1:
        out = jnp.zeros(V0.dim).at[rows.reshape(-1)].add(local.reshape(-1))
        f = Cofunction(V0)
        f.dat = np.asarray(out)
        return f
    trial = args[1]
    V1 = trial.space
    cols = np.asarray(V1.cell_dof_map)
    sp = Sparsity(V0.dim, V1.dim, [(np.asarray(V0.cell_dof_map), cols)])
    data = jnp.zeros(sp.nnz).at[jnp.asarray(sp.block_positions[0])].add(
        local.reshape(-1))
    return Matrix(sp, data, V0, V1)
