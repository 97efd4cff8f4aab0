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


class _DiskStore:
    """Snapshot store that keeps tape state on disk (reference role:
    firedrake/adjoint_utils/checkpointing.py:528 enable_disk_checkpointing
    — bounds tape memory for long time loops).  Arrays are appended to
    flat .npy files and read back memory-mapped."""

    def __init__(self, directory=None):
        import tempfile
        self.dir = directory or tempfile.mkdtemp(prefix="fdtpu_tape_")
        import os
        os.makedirs(self.dir, exist_ok=True)
        self._n = 0

    def save(self, arr):
        import os
        key = os.path.join(self.dir, f"snap_{self._n:08d}.npy")
        self._n += 1
        np.save(key, np.asarray(arr))
        return _DiskRef(key)

    def clear(self):
        import os
        import glob
        for f in glob.glob(os.path.join(self.dir, "snap_*.npy")):
            os.unlink(f)
        self._n = 0


class _DiskRef:
    __slots__ = ("key",)

    def __init__(self, key):
        self.key = key

    def load(self):
        return np.load(self.key, mmap_mode="r")


def _snap(arr):
    """Snapshot an array through the working tape's store (RAM copy, or
    a disk ref when disk checkpointing is enabled)."""
    store = getattr(_working_tape, "_store", None)
    if store is not None:
        return store.save(arr)
    return np.asarray(arr).copy()


def _unsnap(s):
    return s.load() if isinstance(s, _DiskRef) else s


class Tape:
    def __init__(self):
        self.blocks = []
        self._store = None

    def clear_tape(self):
        self.blocks.clear()
        if self._store is not None:
            self._store.clear()

    def add_block(self, b):
        self.blocks.append(b)

    def enable_disk_checkpointing(self, directory=None):
        """Store all block snapshots on disk instead of RAM (reference:
        adjoint_utils/checkpointing.py:528).  Call before taping."""
        self._store = _DiskStore(directory)
        return self._store.dir


def enable_disk_checkpointing(directory=None):
    return get_working_tape().enable_disk_checkpointing(directory)


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
        self.u_snapshot = _snap(self.u.dat)
        self.coeff_snapshots = {
            id(c): _snap(c.dat)
            for c in (_leaf_coefficients(self.F)
                      + _leaf_constants(self.F))
            if hasattr(c, "dat") and c is not self.u}

    def _values_restored(self):
        """Context manager: set u + all participant coefficients to this
        block's snapshot values, restoring current values on exit."""
        import contextlib

        @contextlib.contextmanager
        def cm():
            u = self.u
            participants = (_leaf_coefficients(self.F)
                            + _leaf_constants(self.F))
            saved = {id(u): np.asarray(u.dat)}
            u.dat = np.asarray(_unsnap(self.u_snapshot))
            for c in participants:
                if id(c) in self.coeff_snapshots:
                    saved[id(c)] = np.asarray(c.dat)
                    c.dat = np.asarray(
                        _unsnap(self.coeff_snapshots[id(c)]))
            try:
                yield
            finally:
                u.dat = saved[id(u)]
                for c in participants:
                    if id(c) in self.coeff_snapshots:
                        c.dat = saved[id(c)]
        return cm()

    def _bc_idx(self):
        return (np.unique(np.concatenate(
            [b.dof_indices for b in self.bcs]))
            if self.bcs else np.zeros(0, dtype=np.int32))

    def _linear_solve(self, A, rhs):
        """Shared inner solve for adjoint/TLM/SOA systems."""
        import jax.numpy as jnp
        from ..solving import _run_ksp, direct_solve
        from ..solvers.preconditioners import make_pc
        bc_idx = self._bc_idx()
        rhs = jnp.asarray(rhs)
        if len(bc_idx):
            rhs = rhs.at[jnp.asarray(bc_idx)].set(0.0)
            A = A.with_dirichlet(jnp.asarray(bc_idx))
        if A.shape[0] < 20000:
            return np.asarray(direct_solve(A, rhs))
        return np.asarray(_run_ksp(
            A.matvec, rhs, {"ksp_type": "gmres", "ksp_rtol": 1e-12},
            pc=make_pc("jacobi", A)).x)

    # -------------------------------------------------- first-order sweep
    def adjoint_actions(self, ubar, adjoints, return_lam=False):
        """Given ubar (dJ/du at this point), do the adjoint solve and push
        contributions onto upstream coefficients."""
        from ..language.calculus import derivative, adjoint as form_adjoint
        from ..language.calculus import action
        from ..assemble import assemble
        from ..function import Function
        from ..language.core import ScalarValue

        u = self.u
        with self._values_restored():
            Ju = derivative(self.F, u)
            A_adj = assemble(form_adjoint(Ju))
            lam = self._linear_solve(A_adj, ubar)
            lam_fun = Function(u.function_space())
            lam_fun.dat = np.asarray(lam)
            # propagate to every upstream coefficient in F (except u)
            for c in _leaf_coefficients(self.F):
                if c is u or not _differentiable(c):
                    continue
                dFdm = derivative(self.F, c)
                if not dFdm.integrals():
                    continue
                contrib = assemble(action(form_adjoint(dFdm), lam_fun))
                acc = adjoints.setdefault(
                    id(c), np.zeros(np.asarray(c.dat).size
                                    if hasattr(c, "dat")
                                    else c.values().size))
                adjoints[id(c)] = acc - np.asarray(contrib.dat)
            # scalar Constant controls: cbar -= <lam, dF/dc>
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
        if return_lam:
            return lam
        return adjoints

    # ----------------------------------------------- tangent (TLM) sweep
    def _tangent_dirs(self, tangents):
        """Materialize direction Functions (at this block's tangent
        values) for every differentiable participant with a tangent."""
        from ..function import Function
        dirs = {}
        for c in _leaf_coefficients(self.F):
            if id(c) not in tangents or not _differentiable(c):
                continue
            cdot = Function(c.function_space())
            cdot.dat = np.asarray(tangents[id(c)]).copy()
            dirs[id(c)] = cdot
        return dirs

    def _fdot(self, form, dirs, tangents):
        """D form [tape tangent] — sum of directional derivatives w.r.t.
        every participant that has a tangent (Functions AND scalar
        Constants); None when empty."""
        from ..language.calculus import derivative
        from ..language.core import ScalarValue
        out = None
        for c in _leaf_coefficients(form):
            cdot = dirs.get(id(c))
            if cdot is None:
                continue
            d = _dir_derivative(form, c, cdot)
            if d.integrals():
                out = d if out is None else out + d
        for c in _leaf_constants(form):
            td = tangents.get(id(c))
            if td is None or c.values().size != 1:
                continue
            d = derivative(form, c,
                           du=ScalarValue(float(np.asarray(td).reshape(-1)[0])))
            if d.integrals():
                out = d if out is None else out + d
        return out

    def tlm_actions(self, tangents):
        """Forward tangent sweep: (dF/du) udot = -(D_m F)[mdot]; stores
        this block's tangent snapshot for the second-order reverse."""
        from ..language.calculus import derivative
        from ..assemble import assemble
        u = self.u
        with self._values_restored():
            mdirs = {k: v for k, v in self._tangent_dirs(tangents).items()
                     if k != id(u)}
            mtan = {k: v for k, v in tangents.items() if k != id(u)}
            rhs_form = self._fdot(self.F, mdirs, mtan)
            if rhs_form is None:
                udot = np.zeros(u.function_space().dim)
            else:
                rhs = -np.asarray(assemble(rhs_form).dat)
                A = assemble(derivative(self.F, u))
                udot = self._linear_solve(A, rhs)
        tangents[id(u)] = udot
        self.tlm_snapshot = {
            id(c): _snap(tangents[id(c)])
            for c in (_leaf_coefficients(self.F)
                      + _leaf_constants(self.F) + [u])
            if id(c) in tangents}
        return tangents

    # ------------------------------------- second-order (Hessian) sweep
    def soa_actions(self, lam, hess):
        """Second-order adjoint: with Fdot = D F[tape tangent],
            (dF/du)^T lamdot = ubar_dot - (d Fdot/du)^T lam
            hess[c] -= (d Fdot/dc)^T lam + (dF/dc)^T lamdot."""
        from ..language.calculus import derivative, adjoint as form_adjoint
        from ..language.calculus import action
        from ..assemble import assemble
        from ..function import Function
        from ..language.core import ScalarValue

        u = self.u
        ubar_dot = hess.pop(id(u), None)
        tangents = {k: np.asarray(_unsnap(v))
                    for k, v in getattr(self, "tlm_snapshot", {}).items()}
        with self._values_restored():
            dirs = self._tangent_dirs(tangents)
            Fdot = self._fdot(self.F, dirs, tangents)
            A_adj = assemble(form_adjoint(derivative(self.F, u)))
            lam_fun = Function(u.function_space())
            lam_fun.dat = np.asarray(lam)
            rhs2 = (np.asarray(ubar_dot) if ubar_dot is not None
                    else np.zeros(u.function_space().dim))
            if Fdot is not None:
                dFdot_du = derivative(Fdot, u)
                if dFdot_du.integrals():
                    rhs2 = rhs2 - np.asarray(assemble(
                        action(form_adjoint(dFdot_du), lam_fun)).dat)
            lamdot = self._linear_solve(A_adj, rhs2)
            lamdot_fun = Function(u.function_space())
            lamdot_fun.dat = np.asarray(lamdot)
            for c in _leaf_coefficients(self.F):
                if c is u or not _differentiable(c):
                    continue
                contrib = np.zeros(np.asarray(c.dat).size)
                dFdc = derivative(self.F, c)
                if dFdc.integrals():
                    contrib = contrib + np.asarray(assemble(
                        action(form_adjoint(dFdc), lamdot_fun)).dat)
                if Fdot is not None:
                    dFdot_dc = derivative(Fdot, c)
                    if dFdot_dc.integrals():
                        contrib = contrib + np.asarray(assemble(
                            action(form_adjoint(dFdot_dc), lam_fun)).dat)
                acc = hess.setdefault(id(c), np.zeros(contrib.size))
                hess[id(c)] = acc - contrib
            for c in _leaf_constants(self.F):
                if c.values().size != 1:
                    continue
                contrib = 0.0
                dFdc = derivative(self.F, c, du=ScalarValue(1.0))
                if dFdc.integrals():
                    contrib += float(np.dot(
                        np.asarray(assemble(dFdc).dat), lamdot))
                if Fdot is not None:
                    dFdot_dc = derivative(Fdot, c, du=ScalarValue(1.0))
                    if dFdot_dc.integrals():
                        contrib += float(np.dot(
                            np.asarray(assemble(dFdot_dc).dat),
                            np.asarray(lam)))
                if contrib:
                    acc = hess.setdefault(id(c), np.zeros(1))
                    hess[id(c)] = acc - np.array([contrib])
        return hess


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

    def tlm_actions(self, tangents):
        sdot = tangents.get(id(self.source))
        if sdot is None:
            tangents.pop(id(self.target), None)
        else:
            tangents[id(self.target)] = np.asarray(sdot).copy()
        return tangents


class FunctionalBlock:
    """Records J = assemble(j) for a 0-form j."""

    def __init__(self, form, value):
        self.form = form
        self.value = value
        self.snapshots = {id(c): _snap(c.dat)
                          for c in _leaf_coefficients(form)
                          if hasattr(c, "dat")}
        self.tlm_snapshot = {}

    def seed(self, jbar, adjoints):
        from ..language.calculus import derivative
        from ..assemble import assemble
        saved = {id(c): np.asarray(c.dat)
                 for c in _leaf_coefficients(self.form)
                 if id(c) in self.snapshots}
        for c in _leaf_coefficients(self.form):
            if id(c) in self.snapshots:
                c.dat = np.asarray(_unsnap(self.snapshots[id(c)]))
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

    def tlm_record(self, tangents):
        """Record the tape tangents reaching the functional."""
        self.tlm_snapshot = {
            id(c): _snap(tangents[id(c)])
            for c in (_leaf_coefficients(self.form)
                      + _leaf_constants(self.form))
            if id(c) in tangents}
        return tangents

    def hessian_seed(self, jbar, hess):
        """Seed the second-order sweep: hess[c] += jbar * d(jdot)/dc
        where jdot = D j [tape tangent] (0-form)."""
        from ..language.calculus import derivative
        from ..assemble import assemble
        from ..function import Function
        from ..language.core import ScalarValue
        tangents = {k: np.asarray(_unsnap(v))
                    for k, v in self.tlm_snapshot.items()}
        saved = {id(c): np.asarray(c.dat)
                 for c in _leaf_coefficients(self.form)
                 if id(c) in self.snapshots}
        for c in _leaf_coefficients(self.form):
            if id(c) in self.snapshots:
                c.dat = np.asarray(_unsnap(self.snapshots[id(c)]))
        try:
            jdot = None
            for c in _leaf_coefficients(self.form):
                td = tangents.get(id(c))
                if td is None or not _differentiable(c):
                    continue
                cdot = Function(c.function_space())
                cdot.dat = td.copy()
                d = _dir_derivative(self.form, c, cdot)
                if d.integrals():
                    jdot = d if jdot is None else jdot + d
            for c in _leaf_constants(self.form):
                td = tangents.get(id(c))
                if td is None or c.values().size != 1:
                    continue
                d = derivative(
                    self.form, c,
                    du=ScalarValue(float(np.asarray(td).reshape(-1)[0])))
                if d.integrals():
                    jdot = d if jdot is None else jdot + d
            if jdot is None:
                return hess
            for c in _leaf_coefficients(self.form):
                if not _differentiable(c):
                    continue
                dj = derivative(jdot, c)
                if not dj.integrals():
                    continue
                g = assemble(dj)
                acc = hess.setdefault(
                    id(c), np.zeros(np.asarray(c.dat).size))
                hess[id(c)] = acc + jbar * np.asarray(g.dat)
            for c in _leaf_constants(self.form):
                if c.values().size != 1:
                    continue
                dj = derivative(jdot, c, du=ScalarValue(1.0))
                if not dj.integrals():
                    continue
                val = assemble(dj)
                acc = hess.setdefault(id(c), np.zeros(1))
                hess[id(c)] = acc + jbar * np.array([float(val)])
        finally:
            for c in _leaf_coefficients(self.form):
                if id(c) in saved:
                    c.dat = saved[id(c)]
        return hess


def _dir_derivative(form, c, cdot):
    """derivative(form, c, du=cdot) that also handles mixed coefficients
    (the per-part branch of derivative() only fires when du is None)."""
    from ..language.calculus import derivative
    parts = getattr(c, "parts", None)
    if parts is not None:
        dparts = cdot.parts
        out = None
        for p, dp in zip(parts, dparts):
            d = derivative(form, p, du=dp)
            if d.integrals():
                out = d if out is None else out + d
        if out is None:
            out = derivative(form, parts[0], du=dparts[0])
        return out
    return derivative(form, c, du=cdot)


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
                        id(c): _snap(c.dat)
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


    def hessian(self, mdot):
        """Hessian action H(m)[mdot] via forward-over-reverse: one TLM
        sweep, then a combined first+second-order reverse sweep
        (reference role: pyadjoint ReducedFunctional.hessian used by
        firedrake.adjoint; taylor_test with Hm converges at rate 3)."""
        from ..function import Function, Constant
        from ..language.core import ConstantBase
        mdots = mdot if isinstance(mdot, (list, tuple)) else [mdot]
        tangents = {}
        for ctrl, md in zip(self.controls, mdots):
            c = ctrl.coefficient
            v = np.asarray(getattr(md, "dat", None)
                           if hasattr(md, "dat") else
                           (md.values() if hasattr(md, "values") else md))
            tangents[id(c)] = v.reshape(-1).copy()
        for b in self.tape.blocks:
            if isinstance(b, SolveBlock):
                b.tlm_actions(tangents)
            elif isinstance(b, AssignBlock):
                b.tlm_actions(tangents)
            elif isinstance(b, FunctionalBlock):
                b.tlm_record(tangents)
        adjoints, hess = {}, {}
        j_block = self._J_block
        assert j_block is not None, \
            "functional was not produced by an annotated assemble()"
        j_block.seed(1.0, adjoints)
        j_block.hessian_seed(1.0, hess)
        for b in reversed(self.tape.blocks):
            if isinstance(b, SolveBlock):
                ubar = adjoints.pop(id(b.u), None)
                if ubar is None:
                    hess.pop(id(b.u), None)
                    continue
                lam = b.adjoint_actions(ubar, adjoints, return_lam=True)
                b.soa_actions(lam, hess)
            elif isinstance(b, AssignBlock):
                b.adjoint_actions(adjoints)
                b.adjoint_actions(hess)
        outs = []
        for ctrl in self.controls:
            c = ctrl.coefficient
            h = hess.get(id(c), np.zeros(
                np.asarray(c.dat).size if hasattr(c, "dat")
                else c.values().size))
            if isinstance(c, ConstantBase):
                outs.append(Constant(
                    float(np.asarray(h).reshape(()))
                    if np.asarray(h).size == 1 else h))
                continue
            hf = Function(c.function_space())
            hf.dat = h
            outs.append(hf)
        return outs if len(outs) > 1 else outs[0]


def compute_gradient(J, controls, tape=None):
    rf = ReducedFunctional(J, controls, tape=tape)
    return rf.derivative()


def compute_hessian(J, controls, mdot, tape=None):
    rf = ReducedFunctional(J, controls, tape=tape)
    return rf.hessian(mdot)


def taylor_test(rf: ReducedFunctional, m, h, dJdm=None, Hm=None,
                eps0=None):
    """Residual convergence of the Taylor remainder — returns the observed
    order: ~2 with the gradient term, ~3 when the Hessian action Hm is
    also supplied.  Reference: pyadjoint taylor_test.

    eps0: largest perturbation size.  The third-order remainder decays
    fast — start large enough that it sits above the PDE-solver noise
    floor (default 0.1 with Hm, 0.01 without)."""
    m0 = np.asarray(getattr(m, "dat", m)).copy()
    hd = np.asarray(getattr(h, "dat", h))
    Jm = rf(_wrap(m, m0))
    g = rf.derivative()
    gd = np.asarray(g.dat)
    second = None
    if Hm is not None:
        Hd = np.asarray(getattr(Hm, "dat", Hm))
        second = 0.5 * float(np.dot(hd, Hd))
    residuals = []
    eps = eps0 if eps0 is not None else (0.1 if Hm is not None else 0.01)
    for _ in range(4):
        Jp = rf(_wrap(m, m0 + eps * hd))
        r = Jp - Jm - eps * float(np.dot(gd, hd))
        if second is not None:
            r -= eps * eps * second
        residuals.append(abs(r))
        eps /= 2
    rf(_wrap(m, m0))
    rs = np.array(residuals)
    if np.all(rs < 1e-14):
        return 3.0 if second is not None else 2.0
    orders = np.log2(rs[:-1] / rs[1:])
    return float(np.median(orders))


def _wrap(m, data):
    class _V:
        pass
    v = _V()
    v.dat = data
    return v
