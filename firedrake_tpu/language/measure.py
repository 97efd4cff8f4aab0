"""Measures, integrals, forms (UFL surface: dx/ds/dS, Form).

Reference behavior: integrand*dx builds a Form; measures support subdomain
ids and per-measure quadrature metadata (``dx(degree=4)``), mirroring
tsfc/driver.py:177-178 integral metadata."""
from __future__ import annotations

import numpy as np

from .core import Expr, Argument, Coefficient, ConstantBase, as_expr, Zero


_VALID_TYPES = ("cell", "exterior_facet", "interior_facet")


class Measure:
    def __init__(self, integral_type: str, subdomain_id="everywhere",
                 metadata=None, domain=None):
        assert integral_type in _VALID_TYPES, integral_type
        self.integral_type = integral_type
        self.subdomain_id = subdomain_id
        self.metadata = dict(metadata or {})
        self.domain = domain

    def __call__(self, subdomain_id=None, degree=None, scheme=None,
                 metadata=None, domain=None):
        # ufl semantics: dx(mesh) pins the domain, dx(3) the subdomain
        if subdomain_id is not None and hasattr(subdomain_id,
                                                "topology"):
            domain = subdomain_id if domain is None else domain
            subdomain_id = None
        md = dict(self.metadata)
        if metadata:
            md.update(metadata)
        if degree is not None:
            md["quadrature_degree"] = degree
        if scheme is not None:
            md["quadrature_rule"] = scheme
        sid = subdomain_id if subdomain_id is not None else self.subdomain_id
        return Measure(self.integral_type, sid, md,
                       domain if domain is not None else self.domain)

    def integral(self, integrand) -> "Form":
        integrand = as_expr(integrand)
        if integrand.shape != ():
            raise ValueError("form integrand must be scalar")
        if integrand.is_zero():
            return Form(())
        return Form((Integral(integrand, self.integral_type,
                              self.subdomain_id, self.metadata,
                              self.domain),))

    def __rmul__(self, integrand):
        return self.integral(integrand)


dx = Measure("cell")
ds = Measure("exterior_facet")
dS = Measure("interior_facet")
# extruded-mesh boundary measures (reference: firedrake ds_b/ds_t/ds_v)
ds_b = Measure("exterior_facet", subdomain_id="bottom")
ds_t = Measure("exterior_facet", subdomain_id="top")
ds_v = Measure("exterior_facet", subdomain_id="sides")


class Integral:
    __slots__ = ("integrand", "integral_type", "subdomain_id", "metadata",
                 "domain")

    def __init__(self, integrand, integral_type, subdomain_id, metadata,
                 domain=None):
        self.integrand = integrand
        self.integral_type = integral_type
        self.subdomain_id = subdomain_id
        self.metadata = metadata
        self.domain = domain

    def reconstruct(self, integrand):
        return Integral(integrand, self.integral_type, self.subdomain_id,
                        self.metadata, self.domain)

    def __repr__(self):
        return (f"Integral({self.integrand!r}, {self.integral_type!r}, "
                f"{self.subdomain_id!r})")


class Form:
    """Sum of integrals."""

    def __init__(self, integrals):
        self.integrals_list = tuple(integrals)

    def integrals(self):
        return self.integrals_list

    def integrals_by_type(self, t):
        return tuple(i for i in self.integrals_list if i.integral_type == t)

    # ------------------------------------------------------------ algebra
    def __add__(self, other):
        if isinstance(other, (int, float)) and other == 0:
            return self
        if not isinstance(other, Form):
            return NotImplemented
        return Form(self.integrals_list + other.integrals_list)

    __radd__ = __add__

    def __sub__(self, other):
        return self + (-other)

    def __rsub__(self, other):
        return (-self) + other

    def __neg__(self):
        from .core import Product, ScalarValue
        return Form(tuple(i.reconstruct(Product(ScalarValue(-1.0),
                                                i.integrand))
                          for i in self.integrals_list))

    def __mul__(self, s):
        if isinstance(s, (int, float)):
            from .core import Product, ScalarValue
            return Form(tuple(i.reconstruct(Product(ScalarValue(float(s)),
                                                    i.integrand))
                              for i in self.integrals_list))
        return NotImplemented

    __rmul__ = __mul__

    def __eq__(self, other):
        """a == L builds an Equation (Firedrake solve() surface)."""
        return Equation(self, other)

    def __hash__(self):
        return hash(self.signature())

    # ------------------------------------------------------------ queries
    def arguments(self):
        seen = {}
        for it in self.integrals_list:
            for e in it.integrand.traverse():
                if isinstance(e, Argument):
                    seen[(e.number, -1 if e.part is None else e.part)] = e
        return tuple(seen[k] for k in sorted(seen))

    def coefficients(self):
        seen = {}
        for it in self.integrals_list:
            for e in it.integrand.traverse():
                if isinstance(e, Coefficient):
                    seen.setdefault(e.count, e)
        return tuple(seen[k] for k in sorted(seen))

    def constants(self):
        seen = {}
        for it in self.integrals_list:
            for e in it.integrand.traverse():
                if isinstance(e, ConstantBase):
                    seen.setdefault(e.count, e)
        return tuple(seen[k] for k in sorted(seen))

    def mesh(self):
        for it in self.integrals_list:
            if it.domain is not None:
                return it.domain
            for e in it.integrand.traverse():
                if isinstance(e, (Argument, Coefficient)):
                    return e.space.mesh_obj
                from .core import GeometricQuantity
                if isinstance(e, GeometricQuantity):
                    return e.mesh
        return None

    ufl_domain = mesh

    def empty(self):
        return not self.integrals_list

    def signature(self):
        rn = {}
        parts = []
        for it in sorted(self.integrals_list,
                         key=lambda i: (i.integral_type, str(i.subdomain_id))):
            parts.append(f"{it.integral_type}[{it.subdomain_id}]"
                         f"{sorted(it.metadata.items())}:"
                         + it.integrand._sig(rn))
        return "|".join(parts)

    def __repr__(self):
        return f"Form({list(self.integrals_list)!r})"


class Equation:
    def __init__(self, lhs, rhs):
        self.lhs = lhs
        self.rhs = rhs


class ZeroBaseForm:
    """stand-in for `0` rhs in solve(F == 0, u)."""
    pass
