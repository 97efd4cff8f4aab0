"""Adjoint taping: reverse-mode gradients through assemble/solve.

Reference: the pyadjoint operator-overloading tape used by
firedrake/adjoint_utils/* (blocks recorded for every solve/assemble;
compute_gradient / ReducedFunctional / taylor_test re-exported from
firedrake/adjoint/__init__.py:1-40).

TPU-native design: instead of generic operator overloading, blocks store
SYMBOLIC forms, and the reverse sweep is classical adjoint-PDE machinery
built from this framework's own calculus:
  * functional block  J = assemble(j(u, m)):   ubar += dJ/du (assembled)
  * solve block       F(u; m) = 0:             solve  (dF/du)^T lam = ubar,
                                               mbar -= <lam, dF/dm>
Everything reuses derivative()/adjoint()/action() and the jitted
assemblers, so adjoint solves run on device like primal ones.
"""
from __future__ import annotations

import numpy as np

_annotating = [False]


def annotate_tape():
    return _annotating[0]


def continue_annotation():
    _annotating[0] = True
    return True


def pause_annotation():
    _annotating[0] = False
    return False


class Tape:
    def __init__(self):
        self.blocks = []

    def clear_tape(self):
        self.blocks.clear()

    def add_block(self, b):
        self.blocks.append(b)


_working_tape = Tape()


def get_working_tape():
    return _working_tape


def set_working_tape(tape):
    global _working_tape
    _working_tape = tape
    return tape


# ------------------------------------------------------------------ blocks
class SolveBlock:
    """Records solve(F == 0, u) / solve(a == L, u).

    ALL coefficient values are snapshotted (pyadjoint's block-variable
    versioning): a time loop reuses the same Function objects, so the
    reverse sweep must evaluate each step's Jacobian/derivatives at that
    step's values, not the final ones."""

    def __init__(self, F, u, bcs, solver_parameters=None):
        self.F = F                     # residual form, F(u) = 0
        self.u = u
        self.bcs = tuple(bcs or ())
        self.solver_parameters = dict(solver_parameters or {})
        self._snapshot()

    def _snapshot(self):
        self.u_snapshot = np.asarray(self.u.dat).copy()
        self.coeff_snapshots = {
            id(c): np.asarray(c.dat).copy()
            for c in (_leaf_coefficients(self.F)
                      + _leaf_constants(self.F))
            if hasattr(c, "dat") and c is not self.u}

    def adjoint_actions(self, ubar, adjoints):
        """Given ubar (dJ/du at this point), do the adjoint solve and push
        contributions onto upstream coefficients."""
        import jax.numpy as jnp
        from ..language.calculus import derivative, adjoint as form_adjoint
        from ..language.calculus import action
        from ..assemble import assemble
        from ..function import Function
        from ..solving import _run_ksp, direct_solve
        from ..solvers.preconditioners import make_pc

        u = self.u
        # restore THIS step's values (saving the current ones)
        saved = {id(u): np.asarray(u.dat)}
        u.dat = self.u_snapshot
        participants = _leaf_coefficients(self.F) + _leaf_constants(self.F)
        for c in participants:
            if id(c) in self.coeff_snapshots:
                saved[id(c)] = np.asarray(c.dat)
                c.dat = self.coeff_snapshots[id(c)]
        Ju = derivative(self.F, u)
        A_adj = assemble(form_adjoint(Ju))
        bc_idx = (np.unique(np.concatenate(
            [b.dof_indices for b in self.bcs]))
            if self.bcs else np.zeros(0, dtype=np.int32))
        rhs = jnp.asarray(ubar)
        if len(bc_idx):
            rhs = rhs.at[jnp.asarray(bc_idx)].set(0.0)
            A_adj = A_adj.with_dirichlet(jnp.asarray(bc_idx))
        lam = direct_solve(A_adj, rhs) if A_adj.shape[0] < 20000 else \
            _run_ksp(A_adj.matvec, rhs,
                     {"ksp_type": "gmres", "ksp_rtol": 1e-12},
                     pc=make_pc("jacobi", A_adj)).x
        lam_fun = Function(u.function_space())
        lam_fun.dat = np.asarray(lam)
        # propagate to every upstream coefficient in F (except u itself)
        for c in _leaf_coefficients(self.F):
            if c is u or not _differentiable(c):
                continue
            dFdm = derivative(self.F, c)
            if not dFdm.integrals():
                continue
            contrib = assemble(action(form_adjoint(dFdm), lam_fun))
            acc = adjoints.setdefault(id(c),
                                      np.zeros(np.asarray(c.dat).size
                                               if hasattr(c, "dat")
                                               else c.values().size))
            adjoints[id(c)] = acc - np.asarray(contrib.dat)
        # scalar Constant controls: cbar -= <lam, dF/dc>
        from ..language.core import ScalarValue
        for c in _leaf_constants(self.F):
            if c.values().size != 1:
                continue
            dFdc = derivative(self.F, c, du=ScalarValue(1.0))
            if not dFdc.integrals():
                continue
            vec = assemble(dFdc)
            acc = adjoints.setdefault(id(c), np.zeros(1))
            adjoints[id(c)] = acc - np.array(
                [float(np.dot(np.asarray(vec.dat), np.asarray(lam)))])
        # put the CURRENT values back (the sweep must not clobber state)
        u.dat = saved[id(u)]
        for c in participants:
            if id(c) in self.coeff_snapshots:
                c.dat = saved[id(c)]
        return adjoints


class AssignBlock:
    """Records target.assign(source) — the state hand-off of time loops
    (pyadjoint's assign block).  Reverse: the target's adjoint flows to
    the source."""

    def __init__(self, target, source):
        self.target = target
        self.source = source

    def adjoint_actions(self, adjoints):
        tbar = adjoints.pop(id(self.target), None)
        if tbar is None:
            return adjoints
        acc = adjoints.setdefault(
            id(self.source), np.zeros(np.asarray(self.source.dat).size))
        adjoints[id(self.source)] = acc + tbar
        return adjoints


class FunctionalBlock:
    """Records J = assemble(j) for a 0-form j."""

    def __init__(self, form, value):
        self.form = form
        self.value = value
        self.snapshots = {id(c): np.asarray(c.dat).copy()
                          for c in _leaf_coefficients(form)
                          if hasattr(c, "dat")}

    def seed(self, jbar, adjoints):
        from ..language.calculus import derivative
        from ..assemble import assemble
        saved = {id(c): np.asarray(c.dat)
                 for c in _leaf_coefficients(self.form)
                 if id(c) in self.snapshots}
        for c in _leaf_coefficients(self.form):
            if id(c) in self.snapshots:
                c.dat = self.snapshots[id(c)]
        for c in _leaf_coefficients(self.form):
            if not _differentiable(c):
                continue
            dj = derivative(self.form, c)
            if not dj.integrals():
                continue
            g = assemble(dj)
            acc = adjoints.setdefault(id(c),
                                      np.zeros(np.asarray(c.dat).size))
            adjoints[id(c)] = acc + jbar * np.asarray(g.dat)
        from ..language.core import ScalarValue
        for c in _leaf_constants(self.form):
            if c.values().size != 1:
                continue
            dj = derivative(self.form, c, du=ScalarValue(1.0))
            if not dj.integrals():
                continue
            val = assemble(dj)
            acc = adjoints.setdefault(id(c), np.zeros(1))
            adjoints[id(c)] = acc + jbar * np.array([float(val)])
        for c in _leaf_coefficients(self.form):
            if id(c) in saved:
                c.dat = saved[id(c)]
        return adjoints


def _leaf_coefficients(form):
    from ..language.core import Coefficient
    out = {}
    for it in form.integrals():
        for t in it.integrand.traverse():
            if isinstance(t, Coefficient):
                out.setdefault(t.count, t)
    return [out[k] for k in sorted(out)]


def _leaf_constants(form):
    from ..language.core import ConstantBase
    out = {}
    for it in form.integrals():
        for t in it.integrand.traverse():
            if isinstance(t, ConstantBase):
                out.setdefault(t.count, t)
    return [out[k] for k in sorted(out)]


def _differentiable(c):
    from ..function import Function
    return isinstance(c, Function)


# -------------------------------------------------------------- functional
class AdjFloat(float):
    """A float that remembers the block that produced it."""

    def __new__(cls, value, block=None):
        obj = super().__new__(cls, value)
        obj.block = block
        return obj


class Control:
    def __init__(self, coefficient):
        self.coefficient = coefficient

    def data(self):
        return np.asarray(self.coefficient.dat)


class ReducedFunctional:
    """J(m) with derivative via one reverse tape sweep (reference:
    pyadjoint ReducedFunctional re-exported by firedrake.adjoint)."""

    def __init__(self, functional, controls, tape=None):
        self.functional = functional
        self.controls = (list(controls) if isinstance(controls, (list,
                                                                 tuple))
                         else [controls])
        self.tape = tape or get_working_tape()
        self._J_block = getattr(functional, "block", None)

    def __call__(self, values):
        """Re-evaluate by replaying the tape with new control values."""
        values = values if isinstance(values, (list, tuple)) else [values]
        was = annotate_tape()
        pause_annotation()
        try:
            for ctrl, v in zip(self.controls, values):
                ctrl.coefficient.dat = np.asarray(
                    getattr(v, "dat", v)).copy()
            J = None
            from ..solving import (NonlinearVariationalProblem,
                                   NonlinearVariationalSolver)
            from ..assemble import assemble
            for b in self.tape.blocks:
                if isinstance(b, SolveBlock):
                    prob = NonlinearVariationalProblem(b.F, b.u, bcs=b.bcs)
                    NonlinearVariationalSolver(
                        prob,
                        solver_parameters=b.solver_parameters).solve()
                    b._snapshot()
                elif isinstance(b, AssignBlock):
                    b.target.dat = np.asarray(b.source.dat).copy()
                elif isinstance(b, FunctionalBlock):
                    b.snapshots = {
                        id(c): np.asarray(c.dat).copy()
                        for c in _leaf_coefficients(b.form)
                        if hasattr(c, "dat")}
                    J = assemble(b.form)
                    b.value = float(J)
        finally:
            if was:
                continue_annotation()
        return float(J) if J is not None else float(self.functional)

    def derivative(self, adj_input=1.0):
        adjoints = {}
        blocks = self.tape.blocks
        # seed from the functional block, then sweep solve blocks backwards
        j_block = self._J_block
        assert j_block is not None, \
            "functional was not produced by an annotated assemble()"
        j_block.seed(float(adj_input), adjoints)
        for b in reversed(blocks):
            if isinstance(b, SolveBlock):
                ubar = adjoints.pop(id(b.u), None)
                if ubar is None:
                    continue
                b.adjoint_actions(ubar, adjoints)
            elif isinstance(b, AssignBlock):
                b.adjoint_actions(adjoints)
        from ..function import Function, Constant
        from ..language.core import ConstantBase
        outs = []
        for ctrl in self.controls:
            c = ctrl.coefficient
            g = adjoints.get(id(c),
                             np.zeros(np.asarray(c.dat).size))
            if isinstance(c, ConstantBase):
                outs.append(Constant(float(np.asarray(g).reshape(()))
                                     if np.asarray(g).size == 1 else g))
                continue
            gf = Function(c.function_space())
            gf.dat = g
            outs.append(gf)
        return outs if len(outs) > 1 else outs[0]


def compute_gradient(J, controls, tape=None):
    rf = ReducedFunctional(J, controls, tape=tape)
    return rf.derivative()


def taylor_test(rf: ReducedFunctional, m, h, dJdm=None):
    """Residual convergence of the Taylor remainder — returns the observed
    order (should be ~2).  Reference: pyadjoint taylor_test."""
    m0 = np.asarray(getattr(m, "dat", m)).copy()
    hd = np.asarray(getattr(h, "dat", h))
    Jm = rf(_wrap(m, m0))
    g = rf.derivative()
    gd = np.asarray(g.dat)
    residuals = []
    eps = 0.01
    for _ in range(4):
        Jp = rf(_wrap(m, m0 + eps * hd))
        residuals.append(abs(Jp - Jm - eps * float(np.dot(gd, hd))))
        eps /= 2
    rf(_wrap(m, m0))
    rs = np.array(residuals)
    if np.all(rs < 1e-14):
        return 2.0
    orders = np.log2(rs[:-1] / rs[1:])
    return float(np.median(orders))


def _wrap(m, data):
    class _V:
        pass
    v = _V()
    v.dat = data
    return v
