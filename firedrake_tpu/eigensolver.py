"""Eigenproblem solvers (reference: firedrake/eigensolver.py:18
LinearEigenproblem / :99 LinearEigensolver wrapping SLEPc).

Generalized problems A x = lambda M x.  Backend: scipy ARPACK on the host
(robust, any spectrum target) — a device LOBPCG path for SPD problems is
planned on top of jax.experimental.sparse.linalg."""
from __future__ import annotations

import numpy as np

from .assemble import assemble
from .function import Function


class LinearEigenproblem:
    def __init__(self, A, M=None, bcs=None, bc_shift=0.0,
                 restrict=False):
        self.A_form = A
        self.M_form = M
        self.bcs = tuple(bcs or ())
        self.bc_shift = bc_shift
        test, trial = A.arguments()[0], A.arguments()[-1]
        self.output_space = trial.space

    def dirichlet_bcs(self):
        return self.bcs


class LinearEigensolver:
    """solver_parameters subset: eps_gen_{hermitian,non_hermitian},
    eps_target / which ('LM','SM','LR','SR'), n_evals."""

    def __init__(self, problem: LinearEigenproblem, n_evals=1, *,
                 options_prefix=None, solver_parameters=None, ncv=None):
        self.problem = problem
        self.n_evals = n_evals
        self.params = dict(solver_parameters or {})
        self._evals = None
        self._evecs = None

    def solve(self):
        import scipy.sparse.linalg as spla
        p = self.problem
        A = assemble(p.A_form).to_scipy().tocsc()
        M = (assemble(p.M_form).to_scipy().tocsc()
             if p.M_form is not None else None)
        self._keep = None
        if p.bcs:
            # restrict to non-bc dofs (the reference's restrict=True path)
            n = A.shape[0]
            bc = np.unique(np.concatenate(
                [b.dof_indices for b in p.bcs]))
            keep = np.setdiff1d(np.arange(n), bc)
            self._keep = (keep, n)
            A = A[np.ix_(keep, keep)].tocsc()
            if M is not None:
                M = M[np.ix_(keep, keep)].tocsc()
        k = self.n_evals
        which = self.params.get("eps_which", "SM")
        sigma = self.params.get("eps_target")
        hermitian = self.params.get("eps_gen_non_hermitian") is None
        try:
            if hermitian:
                vals, vecs = spla.eigsh(
                    A, k=k, M=M,
                    sigma=sigma if sigma is not None
                    else (0.0 if which in ("SM", "SR") else None),
                    which="LM" if sigma is not None or which in ("SM", "SR")
                    else which)
            else:
                vals, vecs = spla.eigs(A, k=k, M=M, sigma=sigma,
                                       which=which)
        except Exception:
            # dense fallback for tiny problems
            import scipy.linalg as sla
            Ad = A.toarray()
            Md = M.toarray() if M is not None else None
            vals, vecs = sla.eigh(Ad, Md) if hermitian else sla.eig(Ad, Md)
            order = np.argsort(np.abs(vals))
            vals, vecs = vals[order][:k], vecs[:, order][:, :k]
        order = np.argsort(vals)
        self._evals = np.asarray(vals)[order]
        self._evecs = np.asarray(vecs)[:, order]
        return len(self._evals)

    def eigenvalue(self, i):
        return self._evals[i]

    def _embed(self, vec):
        if self._keep is None:
            return vec
        keep, n = self._keep
        full = np.zeros(n, dtype=vec.dtype)
        full[keep] = vec
        return full

    def eigenfunction(self, i):
        fr = Function(self.problem.output_space)
        fr.dat = np.real(self._embed(self._evecs[:, i]))
        fi = Function(self.problem.output_space)
        fi.dat = np.imag(self._embed(self._evecs[:, i]))
        return fr, fi
