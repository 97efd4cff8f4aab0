"""HybridizationPC: solve a conforming H(div) x DG mixed system by
hybridization + static condensation onto facet trace multipliers.

Reference: firedrake/slate/static_condensation/hybridization.py
(HybridizationPC.initialize :62 builds the broken space, trace space and
Schur complement via Slate; :310 back-substitutes the eliminated fields).

TPU-native shape of the algorithm: every step is batched-per-cell dense
algebra (Slate) driving one small global trace solve —
  [[A, K^T], [K, 0]] [x, lam] = [F, 0]
  S = K A^{-1} K^T,  E = K A^{-1} F       (per-cell condensation)
  solve S lam = E                          (global, trace dofs only)
  x = A^{-1} (F - K^T lam)                 (per-cell back-substitution)
The per-cell inverses ride the batched Gauss-Jordan / solve kernels
(ops/batched_inverse.py) — the reference needs generated C + LAPACK here.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..functionspace import FunctionSpace
from ..mixed import MixedFunctionSpace
from ..language.core import Argument, FacetNormal
from ..language.operators import jump
from ..language.tensor_algebra import dot, inner
from ..language.measure import dS, ds
from ..language.calculus import map_expr
from ..function import Function
from ..slate import Tensor, AssembledVector, assemble_slate
from ..elements.trace import BrokenElement, HDivTrace


def _broken_problem(a, L, W):
    """Rebuild (a, L) with the flux argument/unknown living in the broken
    space; returns (a_b, L_b, Wd, T)."""
    mesh = W.mesh_obj
    Sigma, U = W.subspaces
    elem = Sigma.element
    fam = getattr(elem, "family", "")
    if fam in ("Raviart-Thomas", "RT"):
        tdeg = elem.degree - 1       # RT_k normal trace is P_{k-1}
    elif fam in ("Brezzi-Douglas-Marini", "BDM"):
        tdeg = elem.degree           # BDM_k normal trace is P_k
    else:
        raise NotImplementedError(
            f"HybridizationPC: flux family {fam!r} (RT/BDM)")
    Sb = FunctionSpace(mesh, BrokenElement(elem))
    T = FunctionSpace(mesh, "HDiv Trace", tdeg)
    Wd = MixedFunctionSpace([Sb, U])

    mapping = {}
    for form in (a, L):
        if form is None:
            continue
        for arg in form.arguments():
            new = Argument(Wd.sub(arg.part), arg.number, part=arg.part)
            mapping[arg] = new

    def rebuild(form):
        if form is None:
            return None
        out = []
        for it in form.integrals():
            out.append(it.reconstruct(map_expr(it.integrand, mapping)))
        from ..language.measure import Form
        return Form(tuple(out))

    return rebuild(a), rebuild(L), Wd, T


def _trace_coupling(Wd, T, mesh):
    """K: <gammar, [[sigma . n]]> over dS plus the boundary term over ds
    (test = trace, trial = broken flux in the full broken mixed axis)."""
    gammar = Argument(T, 0)
    sigma_t = Argument(Wd.sub(0), 1, part=0)
    n = FacetNormal(mesh)
    return (inner(gammar("+"), jump(sigma_t, n)) * dS
            + inner(gammar, dot(sigma_t, n)) * ds)


def _broken_to_conforming(Sigma, Sb, sigma_dat):
    """Broken flux -> conforming H(div): per-cell copy back to the
    canonical dof convention (normal continuity holds by construction;
    average to kill round-off).  Broken dofs are raw LOCAL reference
    dofs; the conforming space stores CANONICAL dofs with
    local = B @ canonical, so invert diagonal signs or the matrix
    entity transforms."""
    rt_map = Sigma.cell_dof_map
    sb_map = Sb.cell_dof_map
    loc = np.asarray(sigma_dat)[sb_map]                     # (C, nd)
    if getattr(Sigma, "has_dof_transforms", False):
        B = Sigma.cell_dof_transforms                       # (C, nd, nd)
        can = np.linalg.solve(B, loc[..., None])[..., 0]
    elif getattr(Sigma, "has_dof_signs", False):
        can = Sigma.cell_dof_signs * loc                # signs^-1 = signs
    else:
        can = loc
    vals = np.zeros(Sigma.dim)
    counts = np.zeros(Sigma.dim)
    np.add.at(vals, rt_map, can)
    np.add.at(counts, rt_map, 1.0)
    return vals / np.maximum(counts, 1.0)


def solve_hybridization(problem, params, appctx=None):
    """Solve problem.a == problem.L for problem.u on W = RT x DG."""
    from .preconditioners import direct_solve
    from ..bcs import DirichletBC

    p = problem
    W = p.u.function_space()
    if not isinstance(W, MixedFunctionSpace) or W.num_sub_spaces != 2:
        raise NotImplementedError(
            "HybridizationPC expects a 2-field H(div) x DG problem")
    if p.bcs:
        raise NotImplementedError(
            "HybridizationPC with strong bcs on the mixed problem "
            "(flux bcs): round 2")
    a_b, L_b, Wd, T = _broken_problem(p.a, p.L, W)
    mesh = W.mesh_obj
    Sigma, U = W.subspaces
    Sb = Wd.subspaces[0]

    k_form = _trace_coupling(Wd, T, mesh)

    A = Tensor(a_b, axes=(Wd, Wd))
    K = Tensor(k_form, axes=(T, Wd))
    F = Tensor(L_b, axes=(Wd,))

    Ainv = A.inv
    S = K * Ainv * K.T
    E = K * Ainv * F

    bc = DirichletBC(T, 0.0, "on_boundary")
    Smat = assemble_slate(S, bcs=[bc])
    rhs = jnp.asarray(assemble_slate(E).dat)
    rhs = rhs.at[jnp.asarray(bc.nodes)].set(0.0)

    # trace-solve options live under the hybridization_ prefix
    # (nested-dict solver_parameters are flattened in solving.py);
    # legacy nested access kept for direct callers
    hp = {("hybridization_" + k): v
          for k, v in dict(params.get("hybridization", {})).items()}
    hp.update({k: v for k, v in params.items()
               if k.startswith("hybridization_")})
    pre = "hybridization_"
    ksp = hp.get(pre + "ksp_type", "preonly")
    if ksp == "preonly" and hp.get(pre + "pc_type", "lu") in (
            "lu", "cholesky"):
        lam_dat = direct_solve(Smat, rhs)
        its = 1
    else:
        # full recursive composition on the trace operator (python PCs
        # like GTMGPC read callbacks from the appctx)
        from .composition import OpCtx, build_ksp
        hp.setdefault(pre + "ksp_rtol", 1e-7)    # outer-level defaults:
        hp.setdefault(pre + "ksp_max_it", 10000)  # this IS the solve
        ictx = OpCtx(mat=Smat, space=T, form=None, bcs=[bc],
                     appctx=appctx or {})
        tsolve = build_ksp(ictx, hp, pre)
        if ksp == "preonly":
            lam_dat, its = tsolve(rhs), 1
        else:
            res = tsolve._full(rhs, x0=jnp.zeros(T.dim))
            lam_dat, its = res.x, int(res.iterations)
    lam = Function(T)
    lam.dat = np.asarray(lam_dat)

    # back-substitution: x = A^{-1} (F - K^T lam), per cell
    x = A.solve(F - K.T * AssembledVector(lam))
    sigma_b = assemble_slate(x.blocks[0])
    u_co = assemble_slate(x.blocks[1])

    p.u.subfunctions[0].dat = _broken_to_conforming(
        Sigma, Sb, sigma_b.dat)
    p.u.subfunctions[1].dat = np.asarray(u_co.dat)
    return its
