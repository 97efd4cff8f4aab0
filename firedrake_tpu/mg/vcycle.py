"""Geometric multigrid V-cycle preconditioner.

Reference: PETSc PCMG composed through dmhooks + firedrake/mg/ufl_utils.py
`coarsen` (re-discretization on each level).  Here: the bilinear form is
re-built symbolically on every hierarchy level, assembled, and the V-cycle
(Chebyshev/Jacobi smoothing, tabulated transfers, dense coarse inverse) is
a single traceable callable usable as `pc` inside any jitted Krylov loop —
the whole MG-preconditioned CG solve is ONE XLA program.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..functionspace import FunctionSpace
from ..language.core import (Argument, Coefficient, ConstantBase,
                             GeometricQuantity, SpatialCoordinate,
                             FacetNormal, CellDiameter, CellVolume)
from ..language.calculus import map_expr
from ..language.measure import Form
from .transfer import get_transfer


def coarsen_form(form: Form, fine_mesh, coarse_mesh, space_map):
    """Re-discretize a form on a coarser level (reference:
    firedrake/mg/ufl_utils.py coarsen).  Function coefficients are
    transferred by injection (mg/ufl_utils.py coarsen of Functions)."""
    from ..functionspace import FunctionSpace as _FS
    from ..function import Function as _Fn
    from .transfer import get_transfer
    import jax.numpy as _jnp
    mapping = {}
    for it in form.integrals():
        for t in it.integrand.traverse():
            if isinstance(t, Argument):
                Vc = space_map(t.space)
                mapping[t] = Argument(Vc, t.number, t.part)
            elif isinstance(t, GeometricQuantity) and t.mesh is fine_mesh:
                mapping[t] = type(t)(coarse_mesh)
            elif isinstance(t, Coefficient) and t not in mapping:
                if not isinstance(t, _Fn):
                    raise NotImplementedError(
                        "cannot coarsen this coefficient type")
                Vf = t.function_space()
                Vc = _FS(coarse_mesh, Vf.element)
                tr = get_transfer(Vc, Vf)
                fc = _Fn(Vc, name=f"{t.name}_coarse")
                fc.dat = tr.inject_fn(_jnp.asarray(t.dat))
                mapping[t] = fc
    out = []
    for it in form.integrals():
        integrand = map_expr(it.integrand, mapping)
        dom = coarse_mesh if it.domain is not None else None
        ni = it.reconstruct(integrand)
        ni.domain = dom
        out.append(ni)
    return Form(tuple(out))


def _estimate_lmax(op, d_inv, n, iters=12, seed=0):
    """Power iteration for lambda_max(D^-1 A) (host-side setup)."""
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(n))
    lam = 1.0
    for _ in range(iters):
        y = d_inv * op(x)
        lam = float(jnp.linalg.norm(y))
        x = y / lam
    return lam


class GMGPreconditioner:
    """V(nu,nu)-cycle over re-discretized level operators."""

    def __init__(self, a_fine: Form, bcs, fine_space: FunctionSpace,
                 smooth_its=2, coarse_size_limit=2000):
        from ..assemble import assemble
        from ..bcs import DirichletBC
        mesh = fine_space.mesh_obj
        hierarchy = getattr(mesh, "_mg_hierarchy", None)
        if hierarchy is None:
            raise ValueError("pc_type 'mg' needs a mesh from MeshHierarchy")
        lvl = mesh._mg_level
        meshes = hierarchy.meshes[:lvl + 1]
        elem = fine_space.element
        spaces = [FunctionSpace(m, elem) for m in meshes[:-1]] \
            + [fine_space]

        forms = [a_fine]
        for i in range(len(meshes) - 2, -1, -1):
            fm = meshes[i + 1]
            forms.insert(0, coarsen_form(
                forms[0], fm, meshes[i],
                lambda Vf, i=i: spaces[i]))
        level_bcs = []
        for V in spaces:
            lb = [DirichletBC(V, 0.0, bc.sub_domain, bc.sub_component)
                  for bc in (bcs or ())]
            level_bcs.append(lb)

        self.levels = []
        for i, (V, f, lb) in enumerate(zip(spaces, forms, level_bcs)):
            A = assemble(f, bcs=lb)
            diag = A.diagonal()
            dinv = jnp.where(jnp.abs(diag) > 0, 1.0 / diag, 1.0)
            bc_idx = (np.unique(np.concatenate(
                [b.dof_indices for b in lb]))
                if lb else np.zeros(0, dtype=np.int32))
            mask = np.ones(V.dim)
            mask[bc_idx] = 0.0
            lam = _estimate_lmax(A.matvec, dinv, V.dim)
            self.levels.append(dict(
                V=V, A=A, dinv=dinv, mask=jnp.asarray(mask),
                emin=0.25 * lam, emax=1.05 * lam))
        # coarse dense inverse
        A0 = self.levels[0]["A"]
        self.coarse_inv = jnp.asarray(
            np.linalg.inv(A0.to_dense()))
        self.transfers = [get_transfer(spaces[i], spaces[i + 1])
                          for i in range(len(spaces) - 1)]
        self.smooth_its = smooth_its
        self.nlevels = len(spaces)

    def _smooth(self, lv, x, b, its):
        """Chebyshev smoothing on [emin, emax] of D^-1 A."""
        A, dinv = lv["A"], lv["dinv"]
        theta = (lv["emax"] + lv["emin"]) / 2
        delta = (lv["emax"] - lv["emin"]) / 2
        alpha = 1.0 / theta
        p = dinv * (b - A.matvec(x))
        x = x + alpha * p
        for _ in range(its - 1):
            beta = (delta * alpha / 2) ** 2
            alpha = 1.0 / (theta - beta / alpha)
            z = dinv * (b - A.matvec(x))
            p = z + beta * p
            x = x + alpha * p
        return x

    def _cycle(self, level, b):
        lv = self.levels[level]
        if level == 0:
            return self.coarse_inv @ b
        x = jnp.zeros_like(b)
        x = self._smooth(lv, x, b, self.smooth_its)
        r = (b - lv["A"].matvec(x)) * lv["mask"]
        t = self.transfers[level - 1]
        rc = t.restrict_fn(r) * self.levels[level - 1]["mask"]
        xc = self._cycle(level - 1, rc)
        x = x + t.prolong_fn(xc) * lv["mask"]
        x = self._smooth(lv, x, b, self.smooth_its)
        return x

    def __call__(self, r):
        return self._cycle(self.nlevels - 1, r)
