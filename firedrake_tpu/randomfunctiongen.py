"""Random Functions (reference: firedrake/randomfunctiongen.py:121-282 —
numpy.random Generator wrappers that produce Functions; per-rank streams).

Usage parity:
    rg = Generator(PCG64(seed=123))
    f = rg.normal(V, 0.0, 1.0)       # Function with normal dat
    g = rg.uniform(V)
"""
from __future__ import annotations

import numpy as np

from .functionspace import FunctionSpace
from .function import Function

PCG64 = np.random.PCG64
Philox = np.random.Philox
SFC64 = np.random.SFC64
MT19937 = np.random.MT19937

_DISTS = ("normal", "uniform", "beta", "binomial", "chisquare",
          "exponential", "f", "gamma", "geometric", "gumbel",
          "hypergeometric", "laplace", "logistic", "lognormal",
          "logseries", "negative_binomial", "noncentral_chisquare",
          "noncentral_f", "pareto", "poisson", "power", "rayleigh",
          "standard_cauchy", "standard_exponential", "standard_gamma",
          "standard_normal", "standard_t", "triangular", "vonmises",
          "wald", "weibull", "zipf", "random")


class Generator:
    """numpy Generator whose distribution methods, when handed a
    FunctionSpace as first argument, return a Function."""

    def __init__(self, bit_generator=None):
        self._rng = np.random.Generator(bit_generator or PCG64())

    def __getattr__(self, name):
        if name not in _DISTS:
            return getattr(self._rng, name)
        base = getattr(self._rng, name)

        def maybe_function(*args, **kwargs):
            if args and hasattr(args[0], "dim") and hasattr(args[0],
                                                            "mesh_obj"):
                V = args[0]
                f = Function(V)
                f.dat = np.asarray(base(*args[1:], size=V.dim, **kwargs),
                                   dtype=np.float64)
                return f
            return base(*args, **kwargs)

        return maybe_function


def default_rng(seed=None):
    return Generator(PCG64(seed))


RandomGenerator = Generator
