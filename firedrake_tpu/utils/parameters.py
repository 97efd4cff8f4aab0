"""Global parameters dict (reference: firedrake/parameters.py:12 —
type-checked Parameters; form-compiler defaults under
parameters['form_compiler'])."""
from __future__ import annotations


class Parameters(dict):
    """Reference: firedrake/parameters.py Parameters (nested, attr access)."""

    def __init__(self, name=None, **kwargs):
        super().__init__()
        self._name = name
        for k, v in kwargs.items():
            self.add(k, v)

    def add(self, key, value=None):
        if isinstance(key, Parameters):
            self[key.name()] = key
        else:
            self[key] = value

    def name(self):
        return self._name

    def rename(self, name):
        self._name = name

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError:
            raise AttributeError(key)


parameters = Parameters()
parameters.add(Parameters(
    "form_compiler",
    quadrature_degree="auto",
    scalar_type="float64",
    mode="vanilla-jnp",
))
parameters.add("default_matrix_type", "aij")
parameters.add("default_sub_matrix_type", "baij")
parameters.add(Parameters(
    "slope_limiter",
    **{}
))
