"""Python preconditioner classes (the firedrake/preconditioners zoo).

Reference contracts:
- PCBase (firedrake/preconditioners/base.py): initialize/update/apply.
- AssembledPC (assembled.py): assemble the (possibly matrix-free)
  operator and precondition with options under `assembled_`.
- AuxiliaryOperatorPC (assembled.py:AuxiliaryOperatorPC): subclass
  provides `form(pc, test, trial) -> (a, bcs)`; inner options under
  `aux_`.
- MassInvPC (massinv.py): (1/mu)-weighted mass matrix on the space,
  options under `Mp_` — the Stokes Schur workhorse.
- PCDPC (pcd.py): pressure convection-diffusion Schur approximation
  y = Kp^-1 Fp Mp^-1 x, appctx keys "Re", "state"/"velocity", options
  under `Mp_`/`Kp_`/`Fp_`.

Here a PC is a traceable callable built once at solver setup; `apply`
composes inside jitted Krylov loops.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["PCBase", "AssembledPC", "AuxiliaryOperatorPC", "MassInvPC",
           "PCDPC", "FDMPC", "P1PC", "ASMLinesmoothPC",
           "ASMExtrudedStarPC", "ASMGridLinePC", "FacetSplitPC",
           "HiptmairPC", "GTMGPC", "BDDCPC", "CovariancePC"]

# late-bound so the submodules can import PCBase from here without cycles
_LATE = {"FDMPC": "fdm", "P1PC": "fdm",
         "ASMLinesmoothPC": "asm", "ASMExtrudedStarPC": "asm",
         "ASMGridLinePC": "asm",
         "FacetSplitPC": "facet_split", "HiptmairPC": "hiptmair",
         "GTMGPC": "gtmg", "BDDCPC": "bddc"}


def __getattr__(name):
    mod = _LATE.get(name)
    if mod is not None:
        import importlib
        return getattr(importlib.import_module(f".{mod}", __package__),
                       name)
    raise AttributeError(name)


class PCBase:
    """Base for python PCs. Subclasses implement initialize_ctx (or just
    `form` for auxiliary-operator style PCs) and expose apply(r)->z."""

    _prefix = ""

    @staticmethod
    def get_appctx(pc):
        return pc.appctx

    def initialize_ctx(self, ctx, params, prefix):
        raise NotImplementedError

    def apply(self, r):
        raise NotImplementedError


class AssembledPC(PCBase):
    """Assemble the operator's own bilinear form and precondition it
    with `assembled_*` options (reference: preconditioners/assembled.py
    AssembledPC — used to attach an assembled PC to a matfree outer
    operator)."""

    _prefix = "assembled_"

    def form(self, pc, test=None, trial=None):
        """(a, bcs) — default: the operator's own form/bcs."""
        return self._ctx.form, self._ctx.bcs

    def initialize_ctx(self, ctx, params, prefix):
        from ..assemble import assemble
        from .composition import OpCtx, build_ksp
        self._ctx = ctx
        self.appctx = ctx.appctx
        sub_prefix = prefix + self._prefix
        from ..language.core import Argument
        V = ctx.space
        test = Argument(V, 0)
        trial = Argument(V, 1)
        a, bcs = self.form(self, test, trial)
        if a is None:
            raise ValueError(f"{type(self).__name__} could not obtain a "
                             "form to assemble")
        A = assemble(a, bcs=list(bcs) if bcs else None)
        ictx = OpCtx(mat=A, space=V, form=a, bcs=bcs, appctx=ctx.appctx)
        # default inner config: preonly + lu (exact aux inverse)
        p = dict(params)
        p.setdefault(sub_prefix + "ksp_type", "preonly")
        p.setdefault(sub_prefix + "pc_type", "lu")
        self._solve = build_ksp(ictx, p, sub_prefix)

    def apply(self, r):
        return self._solve(r)


class AuxiliaryOperatorPC(AssembledPC):
    """Precondition with a user-supplied auxiliary operator: subclass
    and override `form(self, pc, test, trial) -> (a, bcs)` (reference:
    assembled.py AuxiliaryOperatorPC). Options prefix `aux_`."""

    _prefix = "aux_"

    def form(self, pc, test, trial):
        raise NotImplementedError(
            "subclass AuxiliaryOperatorPC and implement form()")


class MassInvPC(AuxiliaryOperatorPC):
    """Inverse (1/mu)-weighted mass matrix on the space — spectrally
    equivalent to the Stokes Schur complement (reference: massinv.py).
    Viscosity from appctx["mu"] (default 1). Options prefix `Mp_`."""

    _prefix = "Mp_"

    def form(self, pc, test, trial):
        from ..language.measure import dx
        from ..language.tensor_algebra import inner
        mu = self.get_appctx(pc).get("mu", 1.0)
        a = inner((1.0 / mu) * trial, test) * dx
        return a, ()


def _dense_pinv_solver(A):
    """Pseudo-inverse apply — robust for the singular Neumann Laplacian
    (constant nullspace) inside PCD."""
    Ainv = jnp.asarray(np.linalg.pinv(A.to_dense(), rcond=1e-10))
    return lambda r: Ainv @ r


class PCDPC(PCBase):
    """Pressure-Convection-Diffusion Schur complement approximation for
    Navier-Stokes (reference: pcd.py:155): S^-1 ~ Kp^-1 Fp Mp^-1 with
    Mp the pressure mass matrix, Kp the pressure stiffness and
    Fp = (1/Re) Kp + convection by the current velocity.

    appctx: "Re" (default 1), "state" (mixed solution Function) +
    "velocity_space" (field index, default 0) — or "velocity" directly.
    Note the reference's sign convention: the user's pressure block must
    carry the sign that makes S ~ -(this); same here."""

    _prefix = "pcd_"

    def initialize_ctx(self, ctx, params, prefix):
        from ..assemble import assemble
        from .composition import OpCtx, build_ksp, opt
        from ..language.core import Argument
        from ..language.measure import dx
        from ..language.tensor_algebra import inner
        from ..language.operators import grad
        self.appctx = ctx.appctx
        Q = ctx.space
        q = Argument(Q, 0)      # test
        p = Argument(Q, 1)      # trial
        Re = ctx.appctx.get("Re", 1.0)
        u0 = ctx.appctx.get("velocity")
        if u0 is None:
            state = ctx.appctx["state"]
            velid = ctx.appctx.get("velocity_space", 0)
            u0 = state.subfunctions[velid]
        mass = inner(p, q) * dx
        stiff = inner(grad(p), grad(q)) * dx
        fp = (1.0 / Re) * inner(grad(p), grad(q)) * dx \
            + inner(u0, grad(p)) * q * dx
        Mp = assemble(mass)
        Kp = assemble(stiff)
        self._Fp = assemble(fp)
        # Mp solve: options under <prefix>Mp_, default exact dense
        mctx = OpCtx(mat=Mp, space=Q, form=mass, appctx=ctx.appctx)
        pm = dict(params)
        pm.setdefault(prefix + "Mp_ksp_type", "preonly")
        pm.setdefault(prefix + "Mp_pc_type", "lu")
        self._Mp_solve = build_ksp(mctx, pm, prefix + "Mp_")
        # Kp is singular (Neumann): pseudo-inverse unless user configured
        if opt(params, prefix, "Kp_pc_type") is None:
            self._Kp_solve = _dense_pinv_solver(Kp)
        else:
            kctx = OpCtx(mat=Kp, space=Q, form=stiff, appctx=ctx.appctx)
            self._Kp_solve = build_ksp(kctx, dict(params), prefix + "Kp_")

    def apply(self, r):
        a = self._Mp_solve(r)
        b = self._Fp.matvec(a)
        return self._Kp_solve(b)


class CovariancePC(PCBase):
    """Apply the opposite of a CovarianceMat's operation — the
    action/inverse pairing makes a Krylov solve over a covariance
    operator converge in O(1) iterations (reference:
    preconditioners/covariance.py:6-119).

    The CovarianceMat is found on ctx.mat, or under appctx
    {"covariance": <CovarianceOperatorBase>} (then the Mat operation
    defaults to ACTION and this PC applies the INVERSE)."""

    def initialize_ctx(self, ctx, params, prefix):
        from ..adjoint.covariance import CovarianceMat
        mat = ctx.mat if isinstance(ctx.mat, CovarianceMat) else None
        if mat is None:
            cov = ctx.appctx.get("covariance")
            if cov is None:
                raise TypeError(
                    "CovariancePC needs a CovarianceMat operator or "
                    "appctx={'covariance': <operator>}")
            mat = CovarianceMat(cov, CovarianceMat.ACTION)
        cov = mat.covariance
        self.covariance = cov
        if mat.operation == CovarianceMat.ACTION:
            self.operation = CovarianceMat.INVERSE
            self._apply = cov._inverse
        else:
            self.operation = CovarianceMat.ACTION
            self._apply = cov._action

    def apply(self, r):
        return self._apply(r)
