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
        if (self.params.get("eps_backend") == "lobpcg" and hermitian
                and sigma is None):
            vals, vecs = self._lobpcg_device(A, M, k, which)
            order = np.argsort(vals)
            self._evals = np.asarray(vals)[order]
            self._evecs = np.asarray(vecs)[:, order]
            return len(self._evals)
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

    def _lobpcg_device(self, A, M, k, which):
        """Device LOBPCG (jax.experimental.sparse.linalg) for Hermitian
        problems: largest-k natively; smallest-k via a Gershgorin shift
        (sigma*I - A keeps SPD-ness); generalized problems by LUMPED
        mass (diagonal) congruence D^-1/2 A D^-1/2 — the standard FEM
        lumping; use the scipy backend when the consistent mass matters.
        """
        import jax
        import jax.numpy as jnp
        from jax.experimental.sparse.linalg import lobpcg_standard
        Ac = A.tocsr()
        d = None
        if M is not None:
            d = np.asarray(M.sum(axis=1)).ravel()     # lumped mass
            Dinv = 1.0 / np.sqrt(d)
            import scipy.sparse as sp
            S = sp.diags(Dinv)
            Ac = (S @ Ac @ S).tocsr()
        n = Ac.shape[0]
        # ELL layout for a device matvec
        kmax = int(np.diff(Ac.indptr).max())
        cols = np.zeros((n, kmax), dtype=np.int32)
        vals = np.zeros((n, kmax))
        for r in range(n):
            lo, hi = Ac.indptr[r], Ac.indptr[r + 1]
            cols[r, :hi - lo] = Ac.indices[lo:hi]
            vals[r, :hi - lo] = Ac.data[lo:hi]
        cols_j, vals_j = jnp.asarray(cols), jnp.asarray(vals)
        smallest = which in ("SM", "SR")
        # Gershgorin upper bound on the spectrum
        sig = float(np.abs(Ac).sum(axis=1).max()) if smallest else 0.0

        def op(X):                                    # (n, k) block
            AX = jnp.einsum("rk,rkb->rb", vals_j, X[cols_j])
            return sig * X - AX if smallest else AX

        rng = np.random.RandomState(0)
        X0 = jnp.asarray(np.linalg.qr(rng.randn(n, k))[0])
        theta, U, _ = lobpcg_standard(op, X0,
                                      m=int(self.params.get(
                                          "eps_max_it", 200)))
        lam = (sig - np.asarray(theta)) if smallest else np.asarray(theta)
        U = np.asarray(U)
        if d is not None:
            U = U / np.sqrt(d)[:, None]               # back-transform
        return lam, U

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
