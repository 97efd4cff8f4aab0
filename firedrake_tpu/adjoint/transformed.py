"""L2-transformed optimization functionals.

Reference: firedrake/adjoint/transformed_functional.py (L2RieszMap :19,
L2TransformedFunctional :141 — the factorization of section 4.1 of
doi:10.1137/18M1175239).  An optimization problem J(m) over a finite
element control space is re-posed over the coefficients of an
L2-ORTHONORMAL basis of a DG space containing it:

    J~(m~) = J( Pi( C^{-T} m~ ) ),    C C^T = M_D  (DG mass matrix)

so the Euclidean (l2) inner product that first-order optimizers use on
the raw coefficient vector IS the L2 inner product on functions —
gradient-descent/LBFGS convergence becomes mesh-independent.

TPU shape: the DG mass matrix is block-diagonal per cell with every
dof in exactly one cell, so C is the batch of per-cell Cholesky
factors and C^{-T}/C^{-1} actions are one `jnp.linalg` batched
triangular solve + a dof gather/scatter — no global factorization
(the reference calls PETSc PCCHOLESKY on the local diagonal block,
transformed_functional.py L2Cholesky)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..function import Function, Cofunction
from ..language import TestFunction, TrialFunction, inner, dx


class L2RieszMap:
    """L2 Riesz map on a space: dual -> primal via the mass solve
    (reference: transformed_functional.py:19 L2RieszMap)."""

    def __init__(self, target, constant_jacobian=True):
        self.target = target
        self.constant_jacobian = constant_jacobian

    def __call__(self, u):
        return u.riesz_representation("L2")


class L2Cholesky:
    """Per-cell Cholesky of a DG space's mass matrix: C C^T = M_D.

    DG dofs live in exactly one cell, so the global factor is the
    batch of cell factors in the cell dof ordering."""

    def __init__(self, space):
        from ..slate import _local_form_tensor
        u, v = TrialFunction(space), TestFunction(space)
        M_loc = np.asarray(_local_form_tensor(inner(u, v) * dx).cell)
        self._H = jnp.asarray(np.linalg.cholesky(M_loc))   # (C, n, n)
        cmap = np.asarray(space.cell_dof_map)
        counts = np.zeros(space.dim)
        np.add.at(counts, cmap.reshape(-1), 1.0)
        if not (counts == 1.0).all():
            raise ValueError(
                "L2TransformedFunctional needs a DG space (each dof in "
                "exactly one cell); got shared dofs")
        self.cmap = jnp.asarray(cmap)
        self.dim = space.dim

    def C_T_inv(self, dat):
        """x = C^{-T} v (orthonormal coefficients -> DG dofs)."""
        x = jnp.asarray(dat)[self.cmap][..., None]
        y = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(self._H, 1, 2), x, lower=False)[..., 0]
        out = jnp.zeros(self.dim)
        return np.asarray(out.at[self.cmap.reshape(-1)].set(
            y.reshape(-1)))

    def C_inv(self, dat):
        """x = C^{-1} v (dual DG coefficients -> orthonormal dual)."""
        x = jnp.asarray(dat)[self.cmap][..., None]
        y = jax.scipy.linalg.solve_triangular(
            self._H, x, lower=True)[..., 0]
        out = jnp.zeros(self.dim)
        return np.asarray(out.at[self.cmap.reshape(-1)].set(
            y.reshape(-1)))

    def C_T(self, dat):
        """v = C^T x (DG dofs -> orthonormal coefficients)."""
        x = jnp.asarray(dat)[self.cmap][..., None]
        y = (jnp.swapaxes(self._H, 1, 2) @ x)[..., 0]
        out = jnp.zeros(self.dim)
        return np.asarray(out.at[self.cmap.reshape(-1)].set(
            y.reshape(-1)))


class L2TransformedFunctional:
    """J composed with the L2-orthonormal change of basis (reference:
    transformed_functional.py:141).

    Controls must live in a DG space (pass space_D or use a DG control
    directly); non-DG controls are projected L2-orthogonally from the
    DG space, with the projection's adjoint applied in derivative().
    """

    def __init__(self, functional, control, *, space_D=None,
                 riesz_map=None, alpha=0.0, tape=None):
        from .tape import ReducedFunctional, Control
        if not isinstance(control, Control):
            control = Control(control)
        self._J = ReducedFunctional(functional, [control], tape=tape)
        self._control = control
        S = control.coefficient.function_space()
        self._space = S
        self._space_D = space_D if space_D is not None else S
        self._chol = L2Cholesky(self._space_D)
        self._identity = self._space_D is S
        self._alpha = float(alpha)
        if not self._identity:
            from ..assemble import assemble
            # mixed mass B[s, d] = <phi_s, psi_d>: Pi m_D solves
            # M_S x = B m_D
            uD = TrialFunction(self._space_D)
            vS = TestFunction(S)
            self._B = assemble(inner(uD, vS) * dx)
            uS, vS2 = TrialFunction(S), TestFunction(S)
            self._MS = assemble(inner(uS, vS2) * dx)
        # transformed initial guess: m~ = C^T m_D (inverse of C^{-T});
        # for non-DG controls seed with the dual transform of m
        m0 = np.asarray(control.coefficient.dat)
        if self._identity:
            self.m_t = Function(self._space_D,
                                val=self._chol.C_T(m0))
        else:
            # m_D with Pi(m_D) = m: take the trivial injection m_D = m
            # interpolated (S subset of D in the broken/containing case)
            mD = Function(self._space_D)
            mD.interpolate(control.coefficient)
            self.m_t = Function(self._space_D,
                                val=self._chol.C_T(np.asarray(mD.dat)))

    # ------------------------------------------------------------ eval
    def _primal(self, mt_dat):
        """m = Pi(C^{-T} m~) in the control space; also returns m_D."""
        mD = self._chol.C_T_inv(mt_dat)
        if self._identity:
            return mD, mD
        from ..solvers.preconditioners import direct_solve
        rhs = self._B.matvec(jnp.asarray(mD))
        m = direct_solve(self._MS, rhs)
        return np.asarray(m), mD

    def __call__(self, mt):
        mt_dat = np.asarray(getattr(mt, "dat", mt))
        m, mD = self._primal(mt_dat)
        J = self._J([m])
        if self._alpha and not self._identity:
            # + alpha/2 ||m_D - Pi(m_D)||^2_{L2}
            PmD = Function(self._space_D)
            mS = Function(self._space, val=m)
            PmD.interpolate(mS)
            d = jnp.asarray(mD) - jnp.asarray(PmD.dat)
            ML = self._chol._H @ jnp.swapaxes(self._chol._H, 1, 2)
            dd = d[self._chol.cmap][..., None]
            J = J + 0.5 * self._alpha * float(
                jnp.sum(dd * (ML @ dd)))
        return J

    def derivative(self):
        """Gradient in the transformed (l2 == L2-orthonormal) basis."""
        g = self._J.derivative()              # dual coefficients on S
        g_dat = np.asarray(g.dat)
        if not self._identity:
            from ..solvers.preconditioners import direct_solve
            # Pi^T: g_D = B^T M_S^{-1} g_S
            y = direct_solve(self._MS, jnp.asarray(g_dat))
            g_dat = np.asarray(
                self._B.transpose_matvec(jnp.asarray(y)))
        out = Function(self._space_D, val=self._chol.C_inv(g_dat))
        return out

    @property
    def controls(self):
        return [self.m_t]
