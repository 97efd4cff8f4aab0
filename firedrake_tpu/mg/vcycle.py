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


def coarsen_form(form: Form, fine_mesh, coarse_mesh, space_map,
                 replace=None):
    """Re-discretize a form on a coarser level (reference:
    firedrake/mg/ufl_utils.py coarsen).  Function coefficients are
    transferred by injection (mg/ufl_utils.py coarsen of Functions);
    `replace` pre-seeds the node mapping for coefficients that must
    stay LIVE on the coarse level (FAS maps the solution Function to
    the level's own state variable instead of freezing an injection)."""
    from ..functionspace import FunctionSpace as _FS
    from ..function import Function as _Fn
    from .transfer import get_transfer
    import jax.numpy as _jnp
    mapping = dict(replace or {})
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
    """Power iteration for lambda_max(D^-1 A), as ONE jitted device
    program returning a DEVICE scalar — reading it back would poison
    every later dispatch through the axon tunnel (PERF_NOTES 2b)."""
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.standard_normal(n))

    @jax.jit
    def power(x):
        def body(i, x):
            y = d_inv * op(x)
            return y / jnp.linalg.norm(y)
        x = jax.lax.fori_loop(0, iters, body, x)
        return jnp.linalg.norm(d_inv * op(x))

    return power(x0)


class GMGPreconditioner:
    """V(nu,nu)-cycle over re-discretized level operators.

    Options-tree composition (PETSc PCMG semantics): per-level smoothers
    configured by `<prefix>mg_levels_ksp_type` (default chebyshev,
    max_it 2) + `<prefix>mg_levels_pc_type` (default jacobi; patch/vanka
    allowed), the coarse solve by `<prefix>mg_coarse_*` (default
    preonly+lu)."""

    def __init__(self, a_fine: Form, bcs, fine_space: FunctionSpace,
                 smooth_its=2, coarse_size_limit=2000, params=None,
                 prefix="", appctx=None):
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

        params = dict(params or {})
        # smoother defaults (PETSc mg_levels: chebyshev(2)+jacobi, no
        # convergence test -> rtol 0 runs exactly max_it iterations)
        params.setdefault(prefix + "mg_levels_ksp_type", "chebyshev")
        params.setdefault(prefix + "mg_levels_ksp_max_it", smooth_its)
        params.setdefault(prefix + "mg_levels_ksp_rtol", 0.0)
        params.setdefault(prefix + "mg_levels_pc_type", "jacobi")
        params.setdefault(prefix + "mg_coarse_ksp_type", "preonly")
        params.setdefault(prefix + "mg_coarse_pc_type", "lu")

        from ..solvers.composition import OpCtx, build_ksp
        # matrix-free levels: above this size, the level operator is an
        # action-assembly MatrixFreeOperator instead of channel planes
        # (a 17M-dof P2 tet StencilMatrix would hold ~65 planes, ~9 GB
        # f64 before tile padding — the dof-vector-only action is what
        # makes the 16M north-star solve fit on one chip).  Explicit
        # `mg_fine_mat_type: matfree` forces it on the finest level.
        matfree_threshold = float(params.get(
            prefix + "mg_matfree_threshold",
            4e6) if params else 4e6)
        force_fine_mf = (params or {}).get(
            prefix + "mg_fine_mat_type") == "matfree"
        self.levels = []
        for i, (V, f, lb) in enumerate(zip(spaces, forms, level_bcs)):
            use_mf = (V.dim >= matfree_threshold
                      or (force_fine_mf and i == len(spaces) - 1))
            if use_mf:
                from ..assembly.matfree import MatrixFreeOperator
                A = MatrixFreeOperator(f)
                if lb:
                    rows = np.unique(np.concatenate(
                        [b.dof_indices for b in lb]))
                    A = A.with_dirichlet(jnp.asarray(rows))
            else:
                A = assemble(f, bcs=lb)
            bc_idx = (np.unique(np.concatenate(
                [b.dof_indices for b in lb]))
                if lb else np.zeros(0, dtype=np.int32))
            mask = np.ones(V.dim)
            mask[bc_idx] = 0.0
            lv = dict(V=V, A=A, mask=jnp.asarray(mask))
            if i > 0:
                ctx = OpCtx(mat=A, space=V, form=f, bcs=lb, appctx=appctx)
                # per-level override mg_levels_<i>_* falls back to
                # mg_levels_* (PETSc semantics)
                lvl_prefix = prefix + f"mg_levels_{i}_"
                use = lvl_prefix if any(
                    k.startswith(lvl_prefix) for k in params) else \
                    prefix + "mg_levels_"
                if use == lvl_prefix:
                    for k in ("ksp_type", "ksp_max_it", "ksp_rtol",
                              "pc_type"):
                        params.setdefault(
                            lvl_prefix + k,
                            params[prefix + "mg_levels_" + k])
                lv["smooth"] = build_ksp(ctx, params, use)
            self.levels.append(lv)
        # coarse solve (default dense inverse via preonly+lu)
        A0, V0, f0, lb0 = (self.levels[0]["A"], spaces[0], forms[0],
                           level_bcs[0])
        ctx0 = OpCtx(mat=A0, space=V0, form=f0, bcs=lb0, appctx=appctx)
        self.coarse_solve = build_ksp(ctx0, params, prefix + "mg_coarse_")
        self.transfers = [get_transfer(spaces[i], spaces[i + 1])
                          for i in range(len(spaces) - 1)]
        self.smooth_its = smooth_its
        self.nlevels = len(spaces)

    def _cycle(self, level, b):
        lv = self.levels[level]
        if level == 0:
            return self.coarse_solve(b)
        x = lv["smooth"](b, x0=jnp.zeros_like(b))
        r = (b - lv["A"].matvec(x)) * lv["mask"]
        t = self.transfers[level - 1]
        rc = t.restrict_fn(r) * self.levels[level - 1]["mask"]
        xc = self._cycle(level - 1, rc)
        x = x + t.prolong_fn(xc) * lv["mask"]
        x = lv["smooth"](b, x0=x)
        return x

    def __call__(self, r):
        return self._cycle(self.nlevels - 1, r)
