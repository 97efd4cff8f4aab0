"""Matrix-free operators: the reference's matrix_free/operators.py:211
ImplicitMatrix role, TPU-style.

A `MatrixFreeOperator` fills the assembled-Matrix duck type
(matvec/diagonal/with_dirichlet/shape) without ever materializing
entries: `matvec` is ONE rank-1 assembly of action(a, x) — on
structured meshes the zero-gather stencil program — and `diagonal` is a
diagonal-only assembly (the diag stencil channel; general paths
assemble loc[i,i] only).  This is what makes the 16M-dof north-star
solve fit on one chip: a P2 tet operator at 17M dofs would need ~65
channel planes (~9+ GB f64 before tile padding), while the matrix-free
fine level needs only dof vectors.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class MatrixFreeOperator:
    """y = A @ x evaluated by assembling action(a, x); Matrix-duck-typed."""

    def __init__(self, a):
        from ..language.calculus import action
        from ..function import Function
        from ..assemble import FormAssembler
        args = a.arguments()
        if len(args) != 2:
            raise ValueError("MatrixFreeOperator needs a bilinear form")
        self.row_space = args[0].space
        self.col_space = args[1].space
        if self.row_space.dim != self.col_space.dim:
            raise NotImplementedError("matrix-free rectangular operators")
        self._w = Function(self.col_space, name="mf_x")
        self._af = action(a, self._w)
        self._a = a
        self._asm1 = FormAssembler(self._af)
        self._asm2 = None                    # built lazily for diagonal
        mesh = self.row_space.mesh_obj
        self._coords = jnp.asarray(mesh.coordinates.dat)
        self._coeff_dats = {c.count: jnp.asarray(c.dat)
                            for c in self._asm1.coefficients
                            if c is not self._w}
        self._consts = {c.count: jnp.asarray(c.values())
                        for c in self._asm1.constants}
        self._diag = None

    @property
    def shape(self):
        n = self.row_space.dim
        return (n, n)

    @property
    def dtype(self):
        return self._coords.dtype

    def matvec(self, x):
        asm = self._asm1
        cd = dict(self._coeff_dats)
        cd[self._w.count] = jnp.asarray(x)
        st = None if (asm._stencil is not None or asm._column is not None) \
            else asm._arg_statics
        return asm._run(self._coords, cd, self._consts, arg_statics=st,
                        acc=asm._acc_args if st is not None else None)

    __matmul__ = matvec

    def diagonal(self):
        if self._diag is None:
            from ..assemble import FormAssembler
            if self._asm2 is None:
                self._asm2 = FormAssembler(self._a)
            self._diag = self._asm2.assemble_diagonal()
        return self._diag

    def with_dirichlet(self, bc_rows, symmetric=True):
        return DirichletMatrixFree(self, bc_rows)

    def copy(self):
        return self

    def __repr__(self):
        return f"MatrixFreeOperator({self.shape})"


class DirichletMatrixFree:
    """P A P + (I - P) over a MatrixFreeOperator (the matrix-free
    Dirichlet conditioning of solving._constrained_op, as an object)."""

    def __init__(self, base, bc_rows):
        self.base = base
        n = base.shape[0]
        self._mask = jnp.zeros(n, dtype=bool).at[
            jnp.asarray(bc_rows)].set(True)
        self.row_space = base.row_space
        self.col_space = base.col_space

    @property
    def shape(self):
        return self.base.shape

    @property
    def dtype(self):
        return self.base.dtype

    def matvec(self, x):
        xi = jnp.where(self._mask, 0.0, x)
        y = self.base.matvec(xi)
        return jnp.where(self._mask, x, y)

    __matmul__ = matvec

    def diagonal(self):
        return jnp.where(self._mask, 1.0, self.base.diagonal())

    def with_dirichlet(self, bc_rows, symmetric=True):
        return DirichletMatrixFree(
            self.base,
            jnp.nonzero(self._mask.at[jnp.asarray(bc_rows)].set(True))[0])

    def copy(self):
        return self
