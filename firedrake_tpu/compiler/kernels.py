"""Per-integral kernel construction (the TSFC compile_form analogue,
reference: tsfc/driver.py:57; kernel interface argument ordering
tsfc/kernel_interface/firedrake_loopy.py:284).

A "kernel" here is a traceable python function over ONE entity's gathered
inputs; the executor vmaps it over all entities and XLA fuses the whole
gather -> quadrature -> scatter pipeline into a few HLO ops.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .smalldot import einsum as _small_einsum

from ..language.core import Argument, Coefficient, ConstantBase
from ..language.measure import Integral
from .preprocess import push_grad, estimate_degree
from .lowering import (CellContext, ExteriorFacetContext,
                       InteriorFacetContext, Lowerer)


class CompiledIntegral:
    def __init__(self, integral: Integral, test, trial, mesh,
                 ftype=None):
        self.integral_type = integral.integral_type
        self.subdomain_id = integral.subdomain_id
        # facet-cell class on mixed-facet cells (prism: facet integrals
        # are split into a triangle-facet and a quad-facet program)
        self.ftype = ftype
        self.test = test
        self.trial = trial
        self.mesh = mesh
        integrand = push_grad(integral.integrand)
        self.integrand = integrand
        # participants, in deterministic order
        self.coefficients = tuple(sorted(
            {t.count: t for t in integrand.traverse()
             if isinstance(t, Coefficient)}.values(),
            key=lambda c: c.count))
        self.constants = tuple(sorted(
            {t.count: t for t in integrand.traverse()
             if isinstance(t, ConstantBase)}.values(),
            key=lambda c: c.count))
        cd = getattr(mesh, "_coord_degree", 1)  # coordinate degree
        md = integral.metadata or {}
        # explicit rule: dx(scheme=QuadratureRule(...)) — reference
        # consumes FInAT rules through tsfc; here the rule's points/
        # weights replace the estimated Gauss rule (cell integrals)
        self.qrule = md.get("quadrature_rule")
        deg = md.get("quadrature_degree")
        if deg is None or deg == "auto":
            deg = estimate_degree(integrand, cd)
            if mesh.cell.name in ("quadrilateral", "hexahedron", "prism"):
                deg += cd   # non-affine Jacobian factors
            if cd > 1:
                # curved cells: detJ is degree tdim*(cd-1), Jinv rational
                deg += mesh.topological_dimension * (cd - 1)
        self.degree = max(int(deg), 1)

    # ------------------------------------------------------- kernel build
    def cell_kernel(self):
        mesh, deg = self.mesh, self.degree

        def fn(coords_e, coeffs, consts):
            ctx = CellContext(mesh, deg, coords_e, rule=self.qrule)
            low = Lowerer(ctx, self.test, self.trial,
                          {c.count: w for c, w in zip(self.coefficients,
                                                      coeffs)},
                          {c.count: v for c, v in zip(self.constants,
                                                      consts)})
            v = low.run(self.integrand)                # (ni', nj', nq)
            out = _small_einsum("ijq,q->ij", v, ctx.scale())
            return jnp.broadcast_to(out, self.local_shape())

        return fn

    def exterior_facet_kernel(self):
        mesh, deg = self.mesh, self.degree

        def fn(coords_e, lf, coeffs, consts):
            ctx = ExteriorFacetContext(mesh, deg, coords_e, lf,
                                       ftype=self.ftype)
            low = Lowerer(ctx, self.test, self.trial,
                          {c.count: w for c, w in zip(self.coefficients,
                                                      coeffs)},
                          {c.count: v for c, v in zip(self.constants,
                                                      consts)})
            v = low.run(self.integrand)
            out = _small_einsum("ijq,q->ij", v, ctx.scale())
            return jnp.broadcast_to(out, self.local_shape())

        return fn

    def interior_facet_kernel(self):
        mesh, deg = self.mesh, self.degree

        def fn(coords_p, coords_m, lf_p, lf_m, o_rel, coeffs_p, coeffs_m,
               consts):
            ctx = InteriorFacetContext(mesh, deg, coords_p, coords_m,
                                       lf_p, lf_m, o_rel,
                                       ftype=self.ftype)
            cd = {}
            for c, wp, wm in zip(self.coefficients, coeffs_p, coeffs_m):
                cd[c.count] = {"+": wp, "-": wm}
            low = Lowerer(ctx, self.test, self.trial, cd,
                          {c.count: v for c, v in zip(self.constants,
                                                      consts)})
            v = low.run(self.integrand)
            out = _small_einsum("ijq,q->ij", v, ctx.scale())
            return jnp.broadcast_to(out, self.local_shape())

        return fn

    def cell_kernel_batched(self):
        """Cell-last kernel: coords (ndofc, g, C), coeffs (nslot, C) ->
        local tensors (ni, nj, C).  See compiler/batched.py."""
        from .batched import BatchedCellContext, BatchedLowerer
        mesh, deg = self.mesh, self.degree

        def fn(coords_T, coeffs_T, consts):
            ctx = BatchedCellContext(mesh, deg, coords_T,
                                     rule=self.qrule)
            low = BatchedLowerer(
                ctx, self.test, self.trial,
                {c.count: w for c, w in zip(self.coefficients, coeffs_T)},
                {c.count: v for c, v in zip(self.constants, consts)})
            v = low.run(self.integrand)                # (ni', nj', nq, C)
            out = _small_einsum("ijqc,qc->ijc", v, ctx.scale())
            ni, nj = self.local_shape()
            C = max(coords_T.shape[-1], out.shape[-1])
            return jnp.broadcast_to(out, (ni, nj, C))

        return fn

    def num_quad_points(self):
        """Cell-rule point count (sizes the (ni, nj, nq, C) batched
        intermediate; feeds the kernel-chunking memory bound)."""
        if self.qrule is not None:
            return len(np.asarray(self.qrule.points))
        from .lowering import _cell_rule
        return len(_cell_rule(self.mesh.cell.name, self.degree)[0])

    def kernel(self):
        return {
            "cell": self.cell_kernel,
            "exterior_facet": self.exterior_facet_kernel,
            "interior_facet": self.interior_facet_kernel,
        }[self.integral_type]()

    # expected local tensor shape (before squeezing by rank)
    def local_shape(self):
        double = self.integral_type == "interior_facet"
        ni = nj = 1
        if self.test is not None:
            ni = self.test.space.element.ndof * (2 if double else 1)
        if self.trial is not None:
            nj = self.trial.space.element.ndof * (2 if double else 1)
        return ni, nj
