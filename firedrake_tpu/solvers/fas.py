"""FAS (full approximation scheme) nonlinear multigrid.

Reference role: PETSc SNESFAS composed through firedrake's dmhooks
level machinery (the reference exposes it as snes_type 'fas' with
re-discretized residuals per level; firedrake/mg/ufl_utils.py coarsens
the residual form).  This closes the SNES-level composition family
(PatchSNES analogue = npc_snes_type 'patch' in solving.py; deflation
in deflation.py; FAS here): the nonlinearity is treated ON EVERY
LEVEL instead of only under an outermost Newton.

Algorithm (V-cycle on levels l = L..0, solving R_l(u) = b_l):
    pre-smooth:   damped nonlinear Jacobi  u += w * r / diag(J_l(u))
    tau:          v   = inject(u)
                  b_c = R_{l-1}(v) + restrict(b_l - R_l(u))
    coarse:       w_c = FAS-cycle(l-1, start=v, rhs=b_c)
                  u  += prolong(w_c - v)
    post-smooth.
The coarsest level runs full Newton with a direct solve.  Dirichlet
dofs are held fixed throughout (states satisfy the bc, every update is
masked), matching GMGPreconditioner's handling.

TPU shape: every level residual/diagonal is ONE jitted assembly
program (the stencil/column/gather executors unchanged); transfers are
the same pad/slice programs the linear V-cycle uses.  The outer cycle
is a host loop, like Newton.

Options (PETSc spellings):
    snes_type: "fas"
    fas_levels_max_it   smoothing sweeps per leg (default 3)
    fas_levels_damping  nonlinear-Jacobi damping (default 2/3)
    fas_coarse_snes_max_it / fas_coarse_snes_rtol  coarsest Newton
    snes_rtol / snes_atol / snes_max_it            outer cycles
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..functionspace import FunctionSpace
from ..mg.vcycle import coarsen_form
from ..mg.transfer import get_transfer


class FASSolver:
    """Nonlinear multigrid for F(u; v) == 0.

    mode "h": levels are a MeshHierarchy (PETSc SNESFAS role).
    mode "p": levels are degree-coarsened spaces on the SAME mesh —
    the PMGSNES role (reference: preconditioners/pmg.py:1484 class
    PMGSNES, nonlinear p-coarsening with psnes type 'fas'); transfers
    are the PLevelTransfer prolong/restrict/inject triples and level
    forms swap argument/solution spaces only (coefficients and
    geometry live on the one mesh unchanged)."""

    def __init__(self, F, u, bcs=(), params=None, appctx=None,
                 mode="h"):
        from ..function import Function
        from ..language.calculus import derivative
        from ..bcs import DirichletBC
        from ..assemble import get_assembler
        from ..solving import _bc_data

        params = dict(params or {})
        self.params = params
        V = u.function_space()
        mesh = V.mesh_obj
        self.u = u
        if mode == "p":
            from ..mg.pmg import PLevelTransfer, _coarsen_degree_form
            k = V.scalar_element.degree
            if k < 2:
                raise ValueError("snes_type 'pfas' needs degree >= 2")
            degrees = [k]
            while degrees[-1] > 1:
                degrees.append(max(degrees[-1] // 2, 1))
            degrees = degrees[::-1]          # coarse -> fine
            fam = V.scalar_element.family
            shp = V.value_shape
            def mkspace(d):
                from ..functionspace import (FunctionSpace as FS,
                                             VectorFunctionSpace as VFS)
                if shp:
                    return VFS(mesh, fam, d, dim=shp[0])
                return FS(mesh, fam, d)
            spaces = [mkspace(d) for d in degrees[:-1]] + [V]
            self.spaces = spaces
            self.us = [Function(Vl, name=f"pfas_u{i}")
                       for i, Vl in enumerate(spaces[:-1])] + [u]
            forms = []
            for i, Vl in enumerate(spaces):
                if i == len(spaces) - 1:
                    forms.append(F)
                    continue
                fl = _coarsen_degree_form(F, lambda _V, i=i: spaces[i])
                from ..language.calculus import replace as _replace
                fl = _replace(fl, {u: self.us[i]})
                forms.append(fl)
            self.transfers = [PLevelTransfer(spaces[i], spaces[i + 1])
                              for i in range(len(spaces) - 1)]
        else:
            hierarchy = getattr(mesh, "_mg_hierarchy", None)
            if hierarchy is None:
                raise ValueError("snes_type 'fas' needs a mesh from "
                                 "MeshHierarchy")
            lvl = mesh._mg_level
            meshes = hierarchy.meshes[:lvl + 1]
            elem = V.element
            spaces = [FunctionSpace(m, elem) for m in meshes[:-1]] + [V]
            self.spaces = spaces
            self.us = [Function(Vl, name=f"fas_u{i}")
                       for i, Vl in enumerate(spaces[:-1])] + [u]

            # level residual forms: the solution coefficient stays LIVE
            # (mapped to the level state), other coefficients inject
            forms = [F]
            for i in range(len(meshes) - 2, -1, -1):
                fm = meshes[i + 1]
                forms.insert(0, coarsen_form(
                    forms[0], fm, meshes[i],
                    lambda Vf, i=i: spaces[i],
                    replace={self.us[i + 1]: self.us[i]}))
            self.transfers = [get_transfer(spaces[i], spaces[i + 1])
                              for i in range(len(spaces) - 1)]
        self.res_asms = [get_assembler(f) for f in forms]
        jacs = [derivative(f, ul) for f, ul in zip(forms, self.us)]
        self.jac_asms = [get_assembler(J) for J in jacs]
        self.jacs = jacs

        # bc masks + fine bc values per level
        self.masks, self.bc_idx = [], []
        for i, Vl in enumerate(spaces):
            lb = [DirichletBC(Vl, b.g if i == len(spaces) - 1 else 0.0,
                              b.sub_domain, b.sub_component)
                  for b in (bcs or ())]
            idx, g = _bc_data(lb, Vl.dim)
            m = np.ones(Vl.dim)
            m[idx] = 0.0
            self.masks.append(jnp.asarray(m))
            self.bc_idx.append(np.asarray(idx, dtype=np.int64))
        _, gf = _bc_data(list(bcs or ()), V.dim)
        self.g_fine = jnp.asarray(gf)

        self.nlevels = len(spaces)
        self.smooth_its = int(params.get("fas_levels_max_it", 3))
        self.damping = float(params.get("fas_levels_damping", 2.0 / 3))
        self.coarse_max_it = int(params.get("fas_coarse_snes_max_it",
                                            30))
        self.coarse_rtol = float(params.get("fas_coarse_snes_rtol",
                                            1e-12))

    # --------------------------------------------------------- pieces
    def _R(self, l, uvec):
        """Level-l residual vector at state uvec (bc rows masked)."""
        self.us[l].dat = uvec
        return jnp.asarray(self.res_asms[l].assemble().dat)

    def _diag(self, l, uvec):
        self.us[l].dat = uvec
        return self.jac_asms[l].assemble_diagonal()

    def _smooth(self, l, uvec, b):
        m = self.masks[l]
        for _ in range(self.smooth_its):
            r = (b - self._R(l, uvec)) * m
            d = self._diag(l, uvec)
            dinv = jnp.where(jnp.abs(d) > 0, 1.0 / d, 1.0)
            uvec = uvec + self.damping * dinv * r
        return uvec

    def _coarse_newton(self, uvec, b):
        """Exact Newton + direct solve on the coarsest level."""
        from ..assemble import assemble
        from .preconditioners import direct_solve
        m = self.masks[0]
        r = (b - self._R(0, uvec)) * m
        r0 = float(jnp.linalg.norm(r))
        for _ in range(self.coarse_max_it):
            if float(jnp.linalg.norm(r)) <= max(
                    self.coarse_rtol * max(r0, 1e-30), 1e-14):
                break
            self.us[0].dat = uvec
            J = assemble(self.jacs[0])
            if len(self.bc_idx[0]):
                J = J.with_dirichlet(jnp.asarray(self.bc_idx[0]))
            uvec = uvec + direct_solve(J, r) * m
            r = (b - self._R(0, uvec)) * m
        return uvec

    def _cycle(self, l, uvec, b):
        if l == 0:
            return self._coarse_newton(uvec, b)
        m = self.masks[l]
        uvec = self._smooth(l, uvec, b)
        r = (b - self._R(l, uvec)) * m
        t = self.transfers[l - 1]
        v = t.inject_fn(uvec)
        bc = self._R(l - 1, v) + t.restrict_fn(r) * self.masks[l - 1]
        w = self._cycle(l - 1, v, bc)
        uvec = uvec + t.prolong_fn(w - v) * m
        return self._smooth(l, uvec, b)

    # --------------------------------------------------------- public
    def solve(self):
        params = self.params
        rtol = float(params.get("snes_rtol", 1e-8))
        atol = float(params.get("snes_atol", 1e-50))
        max_it = int(params.get("snes_max_it", 50))
        L = self.nlevels - 1
        uvec = jnp.asarray(self.u.dat)
        if len(self.bc_idx[L]):
            idx = jnp.asarray(self.bc_idx[L])
            uvec = uvec.at[idx].set(self.g_fine[idx])
        zero = jnp.zeros(self.spaces[L].dim)
        r = (zero - self._R(L, uvec)) * self.masks[L]
        r0 = float(jnp.linalg.norm(r))
        self.iterations = 0
        self.converged = r0 == 0.0
        for it in range(max_it):
            if float(jnp.linalg.norm(r)) <= max(rtol * max(r0, 1e-30),
                                                atol):
                self.converged = True
                break
            uvec = self._cycle(L, uvec, zero)
            r = (zero - self._R(L, uvec)) * self.masks[L]
            self.iterations = it + 1
        else:
            self.converged = float(jnp.linalg.norm(r)) <= max(
                rtol * max(r0, 1e-30), atol)
        self.u.dat = uvec
        return self.u
