"""Covariance operators, white-noise sampling, and CovariancePC.

TPU-native rebuild of the reference data-assimilation layer
(/root/reference/firedrake/adjoint/covariance_operator.py:28-998 and
/root/reference/firedrake/preconditioners/covariance.py:6-119):

* :class:`WhiteNoiseGenerator` — samples w ~ N(0, M) (M the mass
  matrix) by the Croci et al. 2018 broken-space trick: per-cell
  Cholesky factors H_e of the LOCAL mass matrices, w = sum_e R_e^T
  H_e z_e with z iid standard normal.  The reference builds H_e
  through PyOP2 parloops + per-cell LAPACK (covariance_operator.py:130
  PyOP2NoiseBackend); here the factors come from ONE batched
  `jnp.linalg.cholesky` over the (C, n, n) cell-tensor stack (the
  slate evaluator) and the scatter is the same jitted segment
  accumulation every rank-1 assembly uses.

* :class:`AutoregressiveCovariance` — the m-th order autoregressive
  (Matern-family) operator B = lam (K^{-1} M)^m M^{-1} lam realized by
  m implicit diffusion steps (Mirouze & Weaver 2010), matching
  covariance_operator.py:701-934.  Where the reference loops PETSc
  KSPSolve calls from Python, every apply here composes the traceable
  solvers of solvers/composition.build_ksp into ONE jittable function
  — usable directly inside a jitted outer Krylov loop.

* :class:`CovarianceMat` / :class:`CovariancePC` — operator + PC pair
  (preconditioners/covariance.py:6): the PC applies whichever of
  {action, inverse} the Mat does not, so `B y = r` solves converge in
  O(1) iterations.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..language import (TestFunction, TrialFunction, dx, inner, grad,
                        avg, outer, FacetNormal, dS)
from ..function import Function, Cofunction, Constant
from ..assemble import assemble


# -- autoregressive-function parameters (covariance_operator.py:423-477)

def lengthscale_m(Lar: float, m: int):
    """Lengthscale parameter of the m-th order autoregressive function
    with Daley lengthscale `Lar`."""
    return Lar / math.sqrt(2 * m - 3)


def lambda_m(Lar: float, m: int):
    """Normalisation factor of the m-th order autoregressive kernel."""
    L = lengthscale_m(Lar, m)
    num = (2 ** (2 * m - 1)) * math.factorial(m - 1) ** 2
    den = math.factorial(2 * m - 2)
    return L * num / den


def kappa_m(Lar: float, m: int):
    """Diffusion coefficient for the autoregressive operator."""
    return lengthscale_m(Lar, m) ** 2


def diffusion_form(u, v, kappa, formulation="CG", cell_size=None):
    """One Backward-Euler diffusion step's bilinear form
    (covariance_operator.py:937-998): 'CG' mass+stiffness, 'IP' the
    interior-penalty analogue for discontinuous spaces."""
    if formulation == "CG":
        return inner(u, v) * dx + inner(kappa * grad(u), grad(v)) * dx
    if formulation == "IP":
        mesh = v.space.mesh_obj
        n = FacetNormal(mesh)
        from ..language import CellDiameter
        h = cell_size if cell_size is not None else CellDiameter(mesh)
        alpha = 4.0 / avg(h)
        ju = outer(u, n)("+") + outer(u, n)("-")
        jv = outer(v, n)("+") + outer(v, n)("-")
        return (inner(u, v) * dx + kappa * (
            inner(grad(u), grad(v)) * dx
            - inner(ju, avg(grad(v))) * dS
            - inner(avg(grad(u)), jv) * dS
            + alpha * inner(ju, jv) * dS))
    raise ValueError(f"unknown diffusion formulation {formulation!r}")


class WhiteNoiseGenerator:
    """Samples w ~ N(0, M) in V* (and, with apply_riesz, M^{-1} w in V).

    E[w w^T] = sum_e R_e^T H_e H_e^T R_e = M exactly, for H_e the
    Cholesky factor of the per-cell mass matrix (Croci et al. 2018;
    reference covariance_operator.py:337-418).
    """

    def __init__(self, V, rng=None, seed: int | None = None):
        from ..slate import _local_form_tensor
        self.V = V
        self._np_rng = rng if rng is not None \
            else np.random.default_rng(seed)
        u, v = TrialFunction(V), TestFunction(V)
        M_loc = np.asarray(_local_form_tensor(inner(u, v) * dx).cell)
        # batched per-cell Cholesky: H_e H_e^T = M_e  (C, n, n)
        self._H = jnp.asarray(np.linalg.cholesky(M_loc))
        cmap = V.cell_dof_map if hasattr(V, "cell_dof_map") \
            else V.cell_node_map
        self._cmap = jnp.asarray(
            np.asarray(cmap).reshape(M_loc.shape[0], -1))
        self._ndof = V.dim

        @jax.jit
        def _scatter(z):
            loc = jnp.einsum("cij,cj->ci", self._H, z)
            return jnp.zeros(self._ndof).at[self._cmap].add(loc)

        self._scatter = _scatter
        self._mass = None

    def function_space(self):
        return self.V

    @property
    def rng(self):
        return self._np_rng

    def sample(self, *, rng=None, tensor=None, apply_riesz=False):
        g = rng if rng is not None else self._np_rng
        z = jnp.asarray(g.standard_normal(self._H.shape[:2]))
        w = self._scatter(z)
        if apply_riesz:
            if self._mass is None:
                from ..solvers.composition import OpCtx, build_ksp
                u, v = TrialFunction(self.V), TestFunction(self.V)
                M = assemble(inner(u, v) * dx)
                self._mass = build_ksp(
                    OpCtx(mat=M, space=self.V),
                    {"ksp_type": "cg", "pc_type": "jacobi",
                     "ksp_rtol": 1e-12}, "")
            w = self._mass(w)
            out = tensor if tensor is not None else Function(self.V)
        else:
            out = tensor if tensor is not None else Cofunction(self.V)
        out.dat = w
        return out


class CovarianceOperatorBase:
    """B: V* -> V and B^{-1}: V -> V*
    (reference covariance_operator.py:480-620)."""

    def function_space(self):
        raise NotImplementedError

    def rng(self):
        raise NotImplementedError

    def sample(self, *, rng=None, tensor=None):
        raise NotImplementedError

    def apply_action(self, x, *, tensor=None):
        raise NotImplementedError

    def apply_inverse(self, x, *, tensor=None):
        raise NotImplementedError

    def norm(self, x):
        """||x||^2_{B^{-1}} = x^T B^{-1} x."""
        xd = jnp.asarray(x.dat if hasattr(x, "dat") else x)
        bx = self.apply_inverse(x)
        return float(xd @ jnp.asarray(bx.dat))


class AutoregressiveCovariance(CovarianceOperatorBase):
    """m-th order autoregressive covariance via m implicit diffusion
    steps (reference covariance_operator.py:701-934).

        B     = lam (K^{-1} M)^m M^{-1} lam
        B^-1  = (1/lam) K (M^{-1} K)^{m-1} (1/lam)
        B^1/2 z = lam (K^{-1} M)^{m/2} M^{-1} (M^{1/2} z)

    with K one Backward-Euler diffusion step, M the mass matrix and
    lam = sigma*sqrt(lambda_m) the unit-variance normalisation.  All
    applies are traceable compositions of build_ksp solvers.
    """

    def __init__(self, V, L, sigma=1.0, m: int = 2, rng=None,
                 seed=None, form=None, weight=None, bcs=None,
                 solver_parameters=None, mass_parameters=None):
        from ..solvers.composition import OpCtx, build_ksp
        if L < 0:
            raise ValueError("correlation lengthscale must be positive")
        if m < 0 or (m % 2) != 0:
            raise ValueError("iteration count m must be even and >= 0")
        self.V = V
        self._rng = rng or WhiteNoiseGenerator(V, seed=seed)
        self.stddev = float(sigma)
        self.lengthscale = float(L)
        self.iterations = int(m)
        if m == 0:
            return
        u, v = TrialFunction(V), TestFunction(V)
        if form is None or isinstance(form, str):
            self.kappa = kappa_m(L, m)
            self.lam = lambda_m(L, m)
            self._weight = float(sigma) * math.sqrt(self.lam)
            K = diffusion_form(u, v, Constant(self.kappa),
                               formulation=form or "CG")
        else:
            K = form
            self._weight = float(weight) if weight is not None else 1.0
        Mform = inner(u, v) * dx
        self._K = assemble(K, bcs=bcs)
        self._M = assemble(Mform)
        sp = dict(solver_parameters
                  or {"ksp_type": "cg", "pc_type": "jacobi",
                      "ksp_rtol": 1e-12, "ksp_max_it": 2000})
        mp = dict(mass_parameters
                  or {"ksp_type": "cg", "pc_type": "jacobi",
                      "ksp_rtol": 1e-12, "ksp_max_it": 2000})
        self._Ksolve = build_ksp(OpCtx(mat=self._K, space=V, form=K), sp)
        self._Msolve = build_ksp(OpCtx(mat=self._M, space=V, form=Mform),
                                 mp)
        w, m_, Kmv, Mmv = (self._weight, self.iterations,
                           self._K.matvec, self._M.matvec)
        Ks, Ms = self._Ksolve, self._Msolve

        def action(xd):
            # lam (K^{-1} M)^m M^{-1} lam : V* -> V
            u = w * Ms(xd)
            for _ in range(m_):
                u = Ks(Mmv(u))
            return w * u

        def inverse(xd):
            # (1/lam) K (M^{-1} K)^{m-1} (1/lam) : V -> V*
            u = xd / w
            for _ in range(m_ - 1):
                u = Ms(Kmv(u))
            return Kmv(u) / w

        def half_action(wd):
            # lam (K^{-1} M)^{m/2} applied to a primal field
            u = wd
            for _ in range(m_ // 2):
                u = Ks(Mmv(u))
            return w * u

        def half_inverse(xd):
            # (M^{-1} K)^{m/2} (1/lam) x, for the efficient norm
            u = xd / w
            for _ in range(m_ // 2):
                u = Ms(Kmv(u))
            return u

        self._action = jax.jit(action)
        self._inverse = jax.jit(inverse)
        self._half_action = jax.jit(half_action)
        self._half_inverse = jax.jit(half_inverse)

    def function_space(self):
        return self.V

    def rng(self):
        return self._rng

    def _dat(self, x):
        return jnp.asarray(x.dat if hasattr(x, "dat") else x)

    def sample(self, *, rng=None, tensor=None):
        tensor = tensor if tensor is not None else Function(self.V)
        w = (rng or self._rng).sample(apply_riesz=True)
        if self.iterations == 0:
            tensor.dat = self.stddev * self._dat(w)
            return tensor
        tensor.dat = self._half_action(self._dat(w))
        return tensor

    def apply_action(self, x, *, tensor=None):
        tensor = tensor if tensor is not None else Function(self.V)
        xd = self._dat(x)
        if self.iterations == 0:
            cx = x.riesz_representation("L2") if hasattr(x, "dat") else x
            tensor.dat = (self.stddev ** 2) * self._dat(cx)
            return tensor
        tensor.dat = self._action(xd)
        return tensor

    def apply_inverse(self, x, *, tensor=None):
        tensor = tensor if tensor is not None else Cofunction(self.V)
        xd = self._dat(x)
        if self.iterations == 0:
            cx = x.riesz_representation("L2") if hasattr(x, "dat") else x
            tensor.dat = self._dat(cx) / (self.stddev ** 2)
            return tensor
        tensor.dat = self._inverse(xd)
        return tensor

    def norm(self, x):
        """||x||^2_{B^{-1}} via m/2 mass solves: ||(M^{-1}K)^{m/2}
        (1/lam) x||^2_M (covariance_operator.py:882-894)."""
        xd = self._dat(x)
        if self.iterations == 0:
            u, v = TrialFunction(self.V), TestFunction(self.V)
            M = getattr(self, "_M", None) or assemble(inner(u, v) * dx)
            return float(xd @ M.matvec(xd)) / self.stddev ** 2
        u = self._half_inverse(xd)
        return float(u @ self._M.matvec(u))


class MixedCovarianceOperator(CovarianceOperatorBase):
    """Block-diagonal covariance over a MixedFunctionSpace: one
    sub-covariance per field (covariance_operator.py:623-698)."""

    def __init__(self, W, subcovariances):
        self.W = W
        self.subs = tuple(subcovariances)
        dims = [c.function_space().dim for c in self.subs]
        if sum(dims) != W.dim:
            raise ValueError("subcovariance dims do not tile the mixed "
                             f"space: {dims} vs {W.dim}")
        off = np.cumsum([0] + dims)
        self._slices = [slice(int(a), int(b))
                        for a, b in zip(off[:-1], off[1:])]

    def function_space(self):
        return self.W

    def rng(self):
        return self.subs[0].rng()

    def _blockwise(self, x, op, out):
        xd = np.asarray(x.dat if hasattr(x, "dat") else x)
        res = np.zeros(self.W.dim)
        for c, s in zip(self.subs, self._slices):
            res[s] = np.asarray(getattr(c, op)(jnp.asarray(xd[s])).dat)
        out.dat = res
        return out

    def apply_action(self, x, *, tensor=None):
        return self._blockwise(
            x, "apply_action", tensor or Function(self.W))

    def apply_inverse(self, x, *, tensor=None):
        return self._blockwise(
            x, "apply_inverse", tensor or Cofunction(self.W))

    def sample(self, *, rng=None, tensor=None):
        out = tensor if tensor is not None else Function(self.W)
        res = np.zeros(self.W.dim)
        for c, s in zip(self.subs, self._slices):
            res[s] = np.asarray(c.sample(rng=rng).dat)
        out.dat = res
        return out

    def norm(self, x):
        xd = np.asarray(x.dat if hasattr(x, "dat") else x)
        return sum(c.norm(jnp.asarray(xd[s]))
                   for c, s in zip(self.subs, self._slices))


class CovarianceMat:
    """Operator wrapper selecting B or B^{-1} as the matvec
    (reference CovarianceMatCtx, covariance_operator.py:1001-1087) —
    pass as `A` (or OpCtx.mat) to a Krylov solve over the covariance."""

    ACTION = "action"
    INVERSE = "inverse"

    def __init__(self, covariance, operation=None):
        op = operation or self.ACTION
        if op not in (self.ACTION, self.INVERSE):
            raise ValueError(f"unknown operation {op!r}")
        self.covariance = covariance
        self.operation = op
        n = covariance.function_space().dim
        self.shape = (n, n)
        if op == self.ACTION:
            self.matvec = covariance._action
        else:
            self.matvec = covariance._inverse

    def diagonal(self):
        raise ValueError("CovarianceMat has no assembled diagonal; "
                         "precondition with CovariancePC")
