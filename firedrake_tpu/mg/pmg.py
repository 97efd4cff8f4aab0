"""p-multigrid: coarsen by polynomial degree on one mesh.

Reference: firedrake/preconditioners/pmg.py (PMGPC/PMGSNES, 1484 LoC —
element-degree coarsening driven through PETSc options).  TPU version:
degree levels k -> max(k//2, 1) -> ... -> 1; transfers are PER-CELL nodal
tables (coarse basis at fine element nodes — no mesh maps needed), and
the V-cycle is the same traceable Chebyshev-smoothed cycle as the
geometric one (mg/vcycle.py).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..functionspace import FunctionSpace
from ..language.core import Argument
from ..language.calculus import map_expr
from ..language.measure import Form
from .vcycle import _estimate_lmax


class PLevelTransfer:
    """Transfers between P_kc and P_kf on the SAME mesh (kc < kf)."""

    def __init__(self, Vc: FunctionSpace, Vf: FunctionSpace):
        assert Vc.mesh_obj is Vf.mesh_obj
        ec, ef = Vc.scalar_element, Vf.scalar_element
        # coarse basis evaluated at fine nodes: (ndof_f, ndof_c)
        T = ec.tabulate(ef.nodes, 0)[0]
        bs = Vc.block_size
        assert bs == Vf.block_size
        self.T = jnp.asarray(T)
        self.cmap = jnp.asarray(Vc.cell_dof_map)
        self.fmap = jnp.asarray(Vf.cell_dof_map)
        self.bs = bs
        self.nVc, self.nVf = Vc.dim, Vf.dim
        mult = np.zeros(Vf.dim)
        np.add.at(mult, np.asarray(Vf.cell_dof_map).reshape(-1), 1.0)
        self.fine_mult = jnp.asarray(np.where(mult > 0, mult, 1.0))
        ndc, ndf = ec.ndof, ef.ndof

        def _blk(x, nd):
            return x.reshape(x.shape[0], nd, bs)

        @jax.jit
        def prolong(cdat):
            cd = _blk(cdat[self.cmap], ndc)           # (nc, ndc, bs)
            vals = jnp.einsum("fj,njb->nfb", self.T, cd)
            out = jnp.zeros(self.nVf, dtype=cdat.dtype)
            return out.at[self.fmap.reshape(-1)].set(vals.reshape(-1))

        @jax.jit
        def restrict_(fdual):
            fw = fdual / self.fine_mult
            fd = _blk(fw[self.fmap], ndf)
            vals = jnp.einsum("fj,nfb->njb", self.T, fd)
            out = jnp.zeros(self.nVc, dtype=fdual.dtype)
            return out.at[self.cmap.reshape(-1)].add(vals.reshape(-1))

        # primal injection for FAS over p-levels (PMGSNES role): the
        # coarse state is the fine function evaluated at coarse nodes
        T2 = ef.tabulate(ec.nodes, 0)[0]          # (ndof_c, ndof_f)
        T2j = jnp.asarray(T2)
        cmult = np.zeros(Vc.dim)
        np.add.at(cmult, np.asarray(Vc.cell_dof_map).reshape(-1), 1.0)
        cmult = jnp.asarray(np.where(cmult > 0, cmult, 1.0))

        @jax.jit
        def inject(fdat):
            fd = _blk(fdat[self.fmap], ndf)
            vals = jnp.einsum("cj,njb->ncb", T2j, fd)
            out = jnp.zeros(self.nVc, dtype=fdat.dtype)
            out = out.at[self.cmap.reshape(-1)].add(vals.reshape(-1))
            return out / cmult

        self.prolong_fn = prolong
        self.restrict_fn = restrict_
        self.inject_fn = inject


def _coarsen_degree_form(form: Form, space_map):
    """Swap argument spaces for the lower-degree ones (same mesh, so
    coefficients/geometry stay untouched)."""
    mapping = {}
    for it in form.integrals():
        for t in it.integrand.traverse():
            if isinstance(t, Argument):
                mapping[t] = Argument(space_map(t.space), t.number, t.part)
    out = []
    for it in form.integrals():
        out.append(it.reconstruct(map_expr(it.integrand, mapping)))
    return Form(tuple(out))


class PMGPC:
    """V-cycle over degree levels (reference: PMGPC coarsening strategy
    `coarsen_element`: degree k -> max(k//2, 1))."""

    def __init__(self, a_fine: Form, bcs, fine_space: FunctionSpace,
                 smooth_its=3, coarsen=lambda k: max(k // 2, 1),
                 params=None, prefix="", appctx=None):
        from ..assemble import assemble
        from ..bcs import DirichletBC
        # options routing (PETSc PMGPC reads its sub-options under the
        # PC's prefix; reference preconditioners/pmg.py configure):
        #   <prefix>pmg_mg_levels_ksp_max_it   smoothing steps
        #   <prefix>pmg_mg_coarse_*            coarse KSP options tree
        params = dict(params or {})
        self._params, self._prefix = params, prefix
        smooth_its = int(params.get(
            prefix + "pmg_mg_levels_ksp_max_it", smooth_its))
        sm_type = params.get(prefix + "pmg_mg_levels_ksp_type",
                             "chebyshev")
        if sm_type != "chebyshev":
            import warnings
            warnings.warn(f"pmg smoother {sm_type!r} unsupported; "
                          "using chebyshev")
        V = fine_space
        k = V.scalar_element.degree
        degrees = [k]
        while degrees[-1] > 1:
            degrees.append(coarsen(degrees[-1]))
        degrees = degrees[::-1]             # coarse -> fine
        mesh = V.mesh_obj
        fam = "CG"
        mk = (lambda d: FunctionSpace(
            mesh, fam, d, vector_dim=V.block_size)
            if V.block_size > 1 else FunctionSpace(mesh, fam, d))
        spaces = [mk(d) for d in degrees[:-1]] + [V]

        self.levels = []
        for Vl in spaces:
            f = a_fine if Vl is V else _coarsen_degree_form(
                a_fine, lambda _s, Vl=Vl: Vl)
            lb = [DirichletBC(Vl, 0.0, bc.sub_domain, bc.sub_component)
                  for bc in (bcs or ())]
            A = assemble(f, bcs=lb)
            diag = A.diagonal()
            dinv = jnp.where(jnp.abs(diag) > 0, 1.0 / diag, 1.0)
            bc_idx = (np.unique(np.concatenate(
                [b.dof_indices for b in lb]))
                if lb else np.zeros(0, dtype=np.int32))
            mask = np.ones(Vl.dim)
            mask[bc_idx] = 0.0
            lam = _estimate_lmax(A.matvec, dinv, Vl.dim)
            self.levels.append(dict(V=Vl, A=A, dinv=dinv,
                                    mask=jnp.asarray(mask),
                                    emin=0.25 * lam, emax=1.05 * lam))
        A0 = self.levels[0]["A"]
        coarse_pref = prefix + "pmg_mg_coarse_"
        if any(k.startswith(coarse_pref) for k in params):
            from ..solvers.composition import OpCtx, build_ksp
            V0 = self.levels[0]["V"]
            f0 = (a_fine if V0 is V else _coarsen_degree_form(
                a_fine, lambda _s, V0=V0: V0))
            ctx0 = OpCtx(mat=A0, space=V0, form=f0, bcs=bcs, appctx=appctx)
            self.coarse_solve = build_ksp(ctx0, params, coarse_pref)
        elif jax.default_backend() == "tpu" and hasattr(A0,
                                                        "to_dense_device"):
            # device f32 Gauss-Jordan + one f64 refinement step: no f64
            # LU on XLA:TPU, and a host readback poisons the tunnel
            # (PERF_NOTES round 2b)
            from ..ops.batched_inverse import batched_inv
            Ainv32 = batched_inv(
                A0.to_dense_device().astype(jnp.float32)[None])[0]
            mv0 = A0.matvec

            def coarse_solve(b):
                x = (Ainv32 @ b.astype(jnp.float32)).astype(b.dtype)
                return x + (Ainv32 @ (b - mv0(x)).astype(jnp.float32)
                            ).astype(b.dtype)
            self.coarse_solve = coarse_solve
        else:
            Ainv = jnp.asarray(np.linalg.inv(A0.to_dense()))
            self.coarse_solve = lambda b: Ainv @ b
        self.transfers = [PLevelTransfer(spaces[i], spaces[i + 1])
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
            return self.coarse_solve(b)
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
