"""Deflation for finding multiple solutions of nonlinear PDEs.

Reference: firedrake/deflation.py (DeflatedSNES/DeflatedKSP/Deflation,
the shifted deflation operator of doi:10.1137/140984798).  There the
Newton direction from the *unmodified* linear solve is rescaled by

    tau = 1 / (1 - E'(y)·dy / M(y)),

where M(y) = prod_r (||y - y_r||^-p + shift) is the deflation operator
over the known roots y_r and E' its Frechet derivative — deflation
never touches the Jacobian, only postprocesses dy (deflation.py:126-137
compute_tau).

TPU shape: no custom-KSP plumbing is needed — the Newton loop
(solving.py NonlinearVariationalSolver) consults appctx["deflation"]
after each linear solve and scales dy by tau; M and E' are a couple of
assembled functionals (norms ride the existing assembly programs).
Activate by passing ``appctx={"deflation": Deflation([...])}`` to the
solver (the reference's spelling via snes_type python +
``appctx["deflation"]``, deflation.py:63-68); converged solutions are
appended to the Deflation automatically, so repeated ``solver.solve()``
calls walk through distinct roots.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["Deflation", "DeflatedSNES"]

#: Marker so `"snes_type": "deflated"` reads naturally in options trees
#: (the actual dispatch is via appctx["deflation"], as in the reference).
DeflatedSNES = "deflated"


class Deflation:
    """Shifted deflation operator M(y) = prod_r (d(y,y_r)^{-p/2} + shift)
    with d the squared distance functional (default L2:
    ``inner(x - y, x - y)*dx``).  Reference: deflation.py:164-227."""

    def __init__(self, roots=None, power=2, shift=1, op=None):
        self.power = power
        self.shift = shift
        self.roots = list(roots) if roots else []
        if op is None:
            from .language import inner
            from .language.measure import dx
            op = lambda x, y: inner(x - y, x - y) * dx   # noqa: E731
        self.op = op

    def append(self, root):
        self.roots.append(root)

    def __iter__(self):
        return iter(self.roots)

    def __len__(self):
        return len(self.roots)

    def evaluate(self, y):
        """M(y) at the current guess (deflation.py:189-199)."""
        from .assemble import assemble
        m = 1.0
        for root in self.roots:
            normsq = float(assemble(self.op(y, root)))
            m *= normsq ** (-self.power / 2.0) + float(self.shift)
        return m

    def deriv(self, y):
        """E'(y) as a dof vector (deflation.py:201-227): with
        f_r = n_r^{-p/2} + shift and eta = prod f_r,
        E' = sum_r (eta/f_r) * (-p/2) n_r^{-p/2-1} * d n_r/dy."""
        from .assemble import assemble
        from .language.calculus import derivative
        p = float(self.power)
        out = None
        normsqs, dnormsqs = [], []
        for root in self.roots:
            form = self.op(y, root)
            normsqs.append(float(assemble(form)))
            dnormsqs.append(np.asarray(assemble(derivative(form, y)).dat))
        factors = [n ** (-p / 2.0) + float(self.shift) for n in normsqs]
        eta = float(np.prod(factors))
        for n, f, dn in zip(normsqs, factors, dnormsqs):
            term = (eta / f) * (-p / 2.0) * n ** (-p / 2.0 - 1.0) * dn
            out = term if out is None else out + term
        return out

    def tau(self, u_func, du):
        """Newton-update scaling (deflation.py compute_tau).  `du` is
        the ADDITIVE update (u <- u + du); the reference's dy is the
        subtractive PETSc one (x <- x - dy), so its -deriv·dy is our
        +deriv·du: solving (M J + F M'^T) du_defl = -M F via
        Sherman-Morrison gives du_defl = du / (1 - (M'·du)/M)."""
        if not self.roots:
            return 1.0
        m = self.evaluate(u_func)
        deriv = jnp.asarray(self.deriv(u_func))
        Edy = float(jnp.vdot(deriv, jnp.asarray(du)))
        return 1.0 / (1.0 - Edy / m)
