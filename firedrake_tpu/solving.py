"""solve() dispatch + linear/nonlinear variational solvers.

Reference: firedrake/solving.py:34 (solve), firedrake/variational_solver.py
(LinearVariationalSolver :293, NonlinearVariationalSolver with SNES
:309-461), firedrake/solving_utils.py:138 (_SNESContext), firedrake/
linear_solver.py.  PETSc SNES/KSP are replaced by JAX-native Newton +
Krylov (solvers/krylov.py); the `solver_parameters` dict API is preserved.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .language.measure import Form, Equation
from .language.calculus import lhs, rhs, derivative, action, replace
from .language.core import Argument, Zero
from .function import Function
from .bcs import DirichletBC, EquationBC, as_bcs
from .assemble import assemble, get_assembler
from .solvers.krylov import KSP_METHODS
from .solvers.preconditioners import make_pc, direct_solve, identity_pc

__all__ = ["solve", "LinearVariationalProblem", "LinearVariationalSolver",
           "NonlinearVariationalProblem", "NonlinearVariationalSolver",
           "LinearSolver"]

# PETSc defaults are gmres+ilu; we default gmres+jacobi (ilu has no
# TPU-friendly analogue yet — block-jacobi lands with the PC zoo)
DEFAULT_KSP_PARAMS = {
    "ksp_type": "gmres",
    "pc_type": "jacobi",
    "ksp_rtol": 1e-7,
    "ksp_atol": 1e-50,
    "ksp_max_it": 10000,
}
DEFAULT_SNES_PARAMS = {
    "snes_type": "newtonls",
    "snes_rtol": 1e-8,
    "snes_atol": 1e-50,
    "snes_max_it": 50,
    "snes_linesearch_type": "basic",
}


def flatten_parameters(params, sep="_"):
    """PETSc-style nested solver_parameters: a dict value is a subtree
    whose keys get the parent key as prefix (reference:
    petsctools/options flatten_parameters) — so
    ``{"gt": {"mg_levels": {"ksp_type": "chebyshev"}}}`` becomes
    ``{"gt_mg_levels_ksp_type": "chebyshev"}``."""
    out = {}
    for k, v in (params or {}).items():
        if isinstance(v, dict):
            for ik, iv in flatten_parameters(v, sep).items():
                out[k + sep + ik] = iv
        else:
            out[k] = v
    return out


def _merged_params(solver_parameters, nonlinear=False):
    p = dict(DEFAULT_KSP_PARAMS)
    if nonlinear:
        p.update(DEFAULT_SNES_PARAMS)
    p.update(flatten_parameters(solver_parameters))
    return p


def _split_bcs(bcs):
    bcs = as_bcs(bcs)
    dirichlet = tuple(b for b in bcs if isinstance(b, DirichletBC))
    equation = tuple(b for b in bcs if isinstance(b, EquationBC))
    return dirichlet, equation


def _bc_data(bcs, n):
    """(bc_idx int array, g full vector) — Dirichlet bcs only."""
    bcs = _split_bcs(bcs)[0]
    if not bcs:
        return np.zeros(0, dtype=np.int32), np.zeros(n)
    idx = np.unique(np.concatenate([bc.dof_indices for bc in bcs]))
    g = np.zeros(n)
    for bc in bcs:
        gv = bc.value_vector()
        g[bc.dof_indices] = gv[bc.dof_indices]
    return idx.astype(np.int32), g


def _run_ksp(op, b, params, pc=None, x0=None):
    ksp_type = params.get("ksp_type", "cg")
    if ksp_type == "preonly":
        raise RuntimeError("preonly handled by caller")
    if x0 is not None and x0.dtype != b.dtype:
        # complex systems with a real initial guess (and vice versa):
        # while_loop carries need one consistent dtype
        ct = jnp.result_type(b.dtype, x0.dtype)
        b, x0 = b.astype(ct), x0.astype(ct)
    meth = KSP_METHODS[ksp_type]
    kw = dict(rtol=params.get("ksp_rtol", 1e-7),
              atol=params.get("ksp_atol", 1e-50),
              max_it=int(params.get("ksp_max_it", 10000)))
    if ksp_type == "gmres":
        kw["restart"] = int(params.get("ksp_gmres_restart", 30))
    res = meth(op, b, x0=x0, pc=pc or identity_pc, **kw)
    return res


class LinearVariationalProblem:
    """Reference: variational_solver.py:259-290 (wraps a x = L)."""

    def __init__(self, a, L, u, bcs=None, aP=None,
                 form_compiler_parameters=None, constant_jacobian=False):
        self.a = a
        # NB: don't write `L == 0` — Form.__eq__ builds an Equation.
        if L is None or (isinstance(L, (int, float)) and L == 0) \
                or (isinstance(L, Form) and L.empty()):
            L = None
        self.L = L
        self.u = u
        self.bcs = as_bcs(bcs)
        self.constant_jacobian = constant_jacobian


class LinearVariationalSolver:
    def __init__(self, problem: LinearVariationalProblem, *,
                 solver_parameters=None, options_prefix=None, appctx=None,
                 nullspace=None, **kwargs):
        self.problem = problem
        self.params = _merged_params(solver_parameters)
        self.nullspace = nullspace
        self.appctx = appctx or {}
        self._mat = None
        self._hoisted_ksp = None

    def solve(self):
        p = self.problem
        params = self.params
        V = p.u.function_space()
        n = V.dim
        bc_idx, g = _bc_data(p.bcs, n)
        gj = jnp.asarray(g)

        if (params.get("pc_type") == "hybridization"
                or params.get("pc_python_type", "").endswith(
                    "HybridizationPC")):
            if params.get("distributed"):
                # SPMD hybridization: per-shard condensation + one
                # shard_map trace solve (parallel/dhybrid.py)
                from .parallel.dhybrid import DistributedHybridization
                nsh = params["distributed"]
                nsh = None if nsh is True else int(nsh)
                dh = DistributedHybridization(
                    p, nshards=nsh,
                    rtol=params.get("hybridization_ksp_rtol",
                                    params.get("ksp_rtol", 1e-10)),
                    maxit=int(params.get("hybridization_ksp_max_it",
                                         5000)))
                self.ksp_iterations = dh.solve()
                return
            from .solvers.hybridization import solve_hybridization
            self.ksp_iterations = solve_hybridization(
                p, params, appctx=self.appctx)
            return
        if (params.get("pc_type") == "scpc"
                or params.get("pc_python_type", "").endswith("SCPC")):
            from .solvers.scpc import solve_scpc
            self.ksp_iterations = solve_scpc(p, params,
                                             appctx=self.appctx)
            return
        if params.get("distributed"):
            # SPMD solve over the device mesh (reference: firedrake
            # under mpiexec; here parallel/dsolve.py shard_map CG)
            from .parallel.dsolve import distributed_solve
            nsh = params["distributed"]
            nsh = None if nsh is True else int(nsh)
            from .mixed import is_mixed
            if params.get("pc_type") == "fieldsplit":
                if not is_mixed(V):
                    raise ValueError("pc_type 'fieldsplit' needs a "
                                     "mixed space")
                from .parallel.dfieldsplit import (
                    distributed_fieldsplit_solve)
                distributed_fieldsplit_solve(
                    p.a, p.L, p.u, bcs=p.bcs, nshards=nsh,
                    rtol=params.get("ksp_rtol", 1e-9),
                    maxit=int(params.get("ksp_max_it", 500)),
                    restart=int(params.get("ksp_gmres_restart", 50)),
                    ksp_type=params.get("ksp_type", "fgmres"),
                    fs_type=params.get("pc_fieldsplit_type", "schur"),
                    schur_form=self.appctx.get("schur_form"),
                    schur_scale=float(params.get(
                        "pc_fieldsplit_schur_scale", -1.0)),
                    sub_rtol=float(params.get(
                        "fieldsplit_ksp_rtol", 1e-8)),
                    sub_maxit=int(params.get(
                        "fieldsplit_ksp_max_it", 200)))
                self.ksp_iterations = p.u._dist_iterations
                return
            distributed_solve(
                p.a, p.L, p.u, bcs=p.bcs, nshards=nsh,
                rtol=params.get("ksp_rtol", 1e-10),
                maxit=int(params.get("ksp_max_it", 5000)),
                pc_type=params.get("pc_type", "jacobi"),
                ksp_type=params.get("ksp_type", "cg"),
                # PETSc spellings: aij => shard-local assembled ELL,
                # matfree => per-iteration action assembly (default)
                mat_type={"aij": "assembled", "matfree": "action"}.get(
                    params.get("mat_type", "action"),
                    params.get("mat_type", "action")),
                restart=int(params.get("ksp_gmres_restart", 30)))
            self.ksp_iterations = p.u._dist_iterations
            return

        b = (jnp.asarray(assemble(p.L).dat) if p.L is not None
             else jnp.zeros(n))

        mat_type = params.get("mat_type", "aij")
        if mat_type == "matfree":
            # action-assembly operator (reference: matrix_free/
            # operators.py ImplicitMatrix) — Matrix-duck-typed, so
            # jacobi/chebyshev/mg compose with it unchanged
            from .assembly.matfree import MatrixFreeOperator
            if self._mat is None or not p.constant_jacobian:
                A0 = MatrixFreeOperator(p.a)
            else:
                A0 = self._mat
        else:
            A0 = assemble(p.a) if (self._mat is None
                                   or not p.constant_jacobian) \
                else self._mat
        if p.constant_jacobian:
            self._mat = A0
        bvec = b - A0.matvec(gj) if len(bc_idx) else b
        if len(bc_idx):
            bvec = bvec.at[jnp.asarray(bc_idx)].set(gj[
                jnp.asarray(bc_idx)])
            A = A0.with_dirichlet(jnp.asarray(bc_idx))
        else:
            A = A0
        if params.get("ksp_type") == "preonly" and \
                params.get("pc_type") in ("lu", "cholesky", "ilu"):
            if mat_type == "matfree":
                raise ValueError("pc_type 'lu' needs an assembled "
                                 "operator; got mat_type 'matfree'")
            # exact host sparse LU at the outermost level
            p.u.dat = direct_solve(A, bvec)
            self.ksp_iterations = 1
            return
        from .solvers.composition import OpCtx, build_pc
        ctx = OpCtx(mat=A, space=V, form=p.a, bcs=p.bcs,
                    appctx=self.appctx)
        if params.get("pc_type") == "mg" and not hasattr(self, "_gmg"):
            self._gmg = build_pc(ctx, params, "")
        pc = self._gmg if params.get("pc_type") == "mg" \
            else build_pc(ctx, params, "")
        if params.get("ksp_type") == "preonly":
            p.u.dat = pc(bvec)
            self.ksp_iterations = 1
            return
        opfn = A.matvec
        if self.nullspace is not None and not \
                getattr(self.nullspace, "is_trivial", lambda: False)():
            ns = self.nullspace
            base = A.matvec

            def opfn(x, _base=base, _ns=ns):
                px = _ns.orthogonalize(x)
                return _ns.orthogonalize(_base(px)) + (x - px)

            bvec = ns.orthogonalize(bvec)
        import os as _os
        hoist_min = int(float(_os.environ.get("FDTPU_HOIST_MIN", 5e5)))
        if n >= hoist_min and not isinstance(bvec, jax.core.Tracer):
            # large programs: closed-over operators/level arrays as
            # runtime parameters, not HLO literals — plain tracing at
            # the 16M north star serializes a module past the remote
            # compile helper's body limit (utils/hoist.py).  Cached on
            # the solver only when the traced closure is call-stable
            # (constant Jacobian + the persistent GMG pc).
            from .utils.hoist import hoisted_jit
            x0 = jnp.asarray(p.u.dat)
            cacheable = p.constant_jacobian and pc is getattr(
                self, "_gmg", None)
            hoisted = self._hoisted_ksp if cacheable else None
            if hoisted is None:
                hoisted = hoisted_jit(
                    lambda bb, xx: _run_ksp(opfn, bb, params, pc=pc,
                                            x0=xx), bvec, x0)
                if cacheable:
                    self._hoisted_ksp = hoisted
            res = hoisted(bvec, x0)
        else:
            res = _run_ksp(opfn, bvec, params, pc=pc,
                           x0=jnp.asarray(p.u.dat))
        p.u.dat = res.x
        self.ksp_iterations = int(res.iterations)
        self.converged = bool(res.converged)
        if not self.converged:
            import warnings
            warnings.warn(f"linear solve did not converge: "
                          f"rnorm={float(res.residual_norm):.3e} after "
                          f"{self.ksp_iterations} its")


def _action_form(a):
    from .language.calculus import action
    trial = a.arguments()[-1]
    w = Function(trial.space, name="mf_x")
    f = action(a, w)
    f._mf_coeff = w
    return f


_action_cache = {}


def _action_cached(a):
    """One action form (and hence ONE matvec-input coefficient) per
    bilinear form object.  The cache holds a STRONG reference to `a`:
    id() keys of dead objects get recycled by CPython, and a stale hit
    silently returns another form's action (seen as a never-converging
    fgmres when Stokes tests ran back-to-back)."""
    key = id(a)
    hit = _action_cache.get(key)
    if hit is None or hit[0] is not a:
        _action_cache[key] = (a, _action_form(a))
    return _action_cache[key][1]


def _constrained_op(raw_op, b, bc_idx, g, n):
    """Matrix-free Dirichlet: op = P A P + (I-P); rhs = P(b - A g) + g."""
    if len(bc_idx) == 0:
        return raw_op, b
    idx = jnp.asarray(bc_idx)
    mask = jnp.zeros(n, dtype=bool).at[idx].set(True)

    def P(x):
        return jnp.where(mask, 0.0, x)

    def op(x):
        return P(raw_op(P(x))) + jnp.where(mask, x, 0.0)

    bvec = P(b - raw_op(g)) + jnp.where(mask, g, 0.0)
    return op, bvec


# --------------------------------------------------------------- nonlinear
class NonlinearVariationalProblem:
    """Reference: variational_solver.py NonlinearVariationalProblem."""

    def __init__(self, F, u, bcs=None, J=None, Jp=None,
                 form_compiler_parameters=None):
        self.F = F
        self.u = u
        self.bcs = as_bcs(bcs)
        self.J = J if J is not None else derivative(F, u)


class NonlinearVariationalSolver:
    """Newton with line search — the SNES analogue (reference:
    solving_utils.py:138 _SNESContext; SNESComputeFunction/Jacobian
    callbacks :527/:561)."""

    def __init__(self, problem, *, solver_parameters=None,
                 options_prefix=None, appctx=None, nullspace=None,
                 pre_jacobian_callback=None, pre_function_callback=None,
                 **kwargs):
        self.problem = problem
        self.params = _merged_params(solver_parameters, nonlinear=True)
        self.appctx = appctx or {}

    def _residual(self, uvec):
        p = self.problem
        p.u.dat = uvec
        r = jnp.asarray(assemble(p.F).dat)
        V = p.u.function_space()
        for ebc in _split_bcs(p.bcs)[1]:
            rb = jnp.asarray(assemble(ebc.F).dat)
            eidx = jnp.asarray(ebc.dof_indices)
            r = r.at[eidx].set(rb[eidx])
        bc_idx, g = _bc_data(p.bcs, V.dim)
        if len(bc_idx):
            idx = jnp.asarray(bc_idx)
            r = r.at[idx].set(uvec[idx] - jnp.asarray(g)[idx])
        return r

    def solve(self):
        p = self.problem
        params = self.params
        V = p.u.function_space()
        n = V.dim
        bc_idx, g = _bc_data(p.bcs, n)
        rtol = params.get("snes_rtol", 1e-8)
        atol = params.get("snes_atol", 1e-50)
        max_it = int(params.get("snes_max_it", 50))
        ls = params.get("snes_linesearch_type", "basic")
        mat_type = params.get("mat_type", "aij")

        # put the initial guess on the constraint manifold
        u = jnp.asarray(p.u.dat)
        if len(bc_idx):
            u = u.at[jnp.asarray(bc_idx)].set(jnp.asarray(g)[
                jnp.asarray(bc_idx)])

        spt = params.get("snes_python_type", "")
        if params.get("snes_type") == "python" and spt \
                and not spt.endswith("PMGSNES"):
            # SNES-level python types (reference SNESBase subclasses):
            # AuxiliaryOperatorSNES-style nonlinear Richardson
            from .solvers.snes import (resolve_snes_python,
                                       AuxiliaryOperatorSNES)
            cls = resolve_snes_python(spt)
            if not issubclass(cls, AuxiliaryOperatorSNES):
                raise TypeError(f"snes_python_type {spt!r} must "
                                "subclass AuxiliaryOperatorSNES")
            obj = cls()
            self.snes_iterations = obj.solve(p, params,
                                             appctx=self.appctx)
            self.converged = obj.converged
            return

        if params.get("snes_type") in ("fas", "pfas") \
                or spt.endswith("PMGSNES"):
            # FAS nonlinear multigrid (PETSc SNESFAS role): h-levels
            # from the MeshHierarchy, or p-levels (degree coarsening,
            # the reference PMGSNES, pmg.py:1484) for 'pfas'
            from .solvers.fas import FASSolver
            mode = "p" if (params.get("snes_type") == "pfas"
                           or spt.endswith("PMGSNES")) else "h"
            fas = FASSolver(p.F, p.u, bcs=p.bcs, params=params,
                            appctx=self.appctx, mode=mode)
            fas.solve()
            self.snes_iterations = fas.iterations
            self.converged = fas.converged
            if not self.converged:
                import warnings
                warnings.warn(f"FAS did not converge after "
                              f"{fas.iterations} cycles")
            return

        stol = params.get("snes_stol", 1e-8)
        deflation = (self.appctx or {}).get("deflation")
        npc = params.get("npc_snes_type")
        r = self._residual(u)
        r0 = float(jnp.linalg.norm(r))
        rnorm = r0
        self.snes_iterations = 0
        stalled = False
        for it in range(max_it):
            if rnorm <= max(rtol * r0, atol) or r0 == 0.0:
                break
            if npc == "patch":
                # left nonlinear preconditioning (PETSc npc_snes_type,
                # reference PatchSNES/SNESPATCH role): sweeps of batched
                # vertex-star nonlinear relaxation before the global step
                u = self._patch_smooth(u, bc_idx, params)
                r = self._residual(u)
                rnorm = float(jnp.linalg.norm(r))
                if rnorm <= max(rtol * r0, atol):
                    self.snes_iterations = it + 1
                    break
            du = self._newton_step(u, r, bc_idx, params, mat_type)
            if deflation is not None and len(deflation):
                # deflated Newton (deflation.py): scale dy by tau so the
                # iteration cannot reconverge to a known root
                p.u.dat = u
                du = deflation.tau(p.u, du) * du
            # PETSc snes_stol: step too small relative to the iterate
            if float(jnp.linalg.norm(du)) <= stol * max(
                    float(jnp.linalg.norm(u)), 1e-30):
                stalled = True
                break
            # line search
            if ls in ("basic", "none"):
                t = 1.0
                u_new = u + du
                r_new = self._residual(u_new)
            else:   # backtracking "bt" / "l2"
                t = 1.0
                for _ in range(8):
                    u_new = u + t * du
                    r_new = self._residual(u_new)
                    if float(jnp.linalg.norm(r_new)) < rnorm:
                        break
                    t *= 0.5
            u, r = u_new, r_new
            rnorm = float(jnp.linalg.norm(r))
            self.snes_iterations = it + 1
        p.u.dat = u
        self.converged = stalled or rnorm <= max(rtol * r0, atol)
        if self.converged and deflation is not None:
            # record the solution just found (reference DeflatedSNES.solve)
            deflation.append(Function(p.u))
        if not self.converged:
            import warnings
            warnings.warn(f"Newton did not converge: |r|={rnorm:.3e} "
                          f"after {self.snes_iterations} iterations")

    def _newton_step(self, u, r, bc_idx, params, mat_type):
        p = self.problem
        p.u.dat = u
        if mat_type == "matfree":
            af = _action_cached(p.J)
            asm = get_assembler(af)
            xf = af._mf_coeff
            coords = jnp.asarray(
                p.u.function_space().mesh_obj.coordinates.dat)

            def raw_op(x):
                cd = {c.count: jnp.asarray(c.dat)
                      for c in asm.coefficients}
                cd[xf.count] = x
                cv = {c.count: jnp.asarray(c.values())
                      for c in asm.constants}
                return asm._run(coords, cd, cv)

            n = u.shape[0]
            op, rhsv = _constrained_op(raw_op, -r, bc_idx,
                                       jnp.zeros(n), n)
            # Newton rhs: bc rows of -r already hold -(u-g); the
            # constrained op keeps identity there, so pass through:
            if len(bc_idx):
                idx = jnp.asarray(bc_idx)
                rhsv = rhsv.at[idx].set(-r[idx])
            from .solvers.composition import OpCtx, build_pc
            mf_params = dict(params)
            if mf_params.get("pc_type", "none") == "jacobi":
                mf_params["pc_type"] = "none"
            ctx = OpCtx(matvec=op, space=p.u.function_space(), form=p.J,
                        bcs=p.bcs, appctx=getattr(self, "appctx", {}))
            pc = build_pc(ctx, mf_params, "")
            res = _run_ksp(op, rhsv, params, pc=pc)
            return res.x
        J = assemble(p.J)
        rhs_v = -r
        ebcs = _split_bcs(p.bcs)[1]
        if ebcs:
            # replace boundary rows with the boundary-equation Jacobian
            import scipy.sparse as sp
            Js = J.to_scipy().tolil()
            for ebc in ebcs:
                Jb = assemble(ebc.J).to_scipy().tolil()
                eidx = np.asarray(ebc.dof_indices)
                Js[eidx] = Jb[eidx]
            Js = Js.tocsr()
            if len(bc_idx):
                Js = Js.tolil()
                Js[bc_idx] = 0.0
                Js[bc_idx, bc_idx] = 1.0
                Js = Js.tocsr()
            from scipy.sparse.linalg import spsolve
            return jnp.asarray(spsolve(Js.tocsc(), np.asarray(rhs_v)))
        if len(bc_idx):
            J = J.with_dirichlet(jnp.asarray(bc_idx))
        if params.get("ksp_type") == "preonly" and \
                params.get("pc_type") in ("lu", "cholesky", "ilu"):
            return direct_solve(J, rhs_v)
        from .solvers.composition import OpCtx, build_pc
        ctx = OpCtx(mat=J, space=p.u.function_space(), form=p.J,
                    bcs=p.bcs, appctx=getattr(self, "appctx", {}))
        pc = build_pc(ctx, params, "")
        if params.get("ksp_type") == "preonly":
            return pc(rhs_v)
        res = _run_ksp(J.matvec, rhs_v, params, pc=pc)
        return res.x

    def _patch_smooth(self, u, bc_idx, params):
        """Batched vertex-star nonlinear relaxation — the PatchSNES /
        SNESPATCH role (reference firedrake/preconditioners/patch.py:
        per-patch nonlinear solves composed as a nonlinear smoother via
        PETSc nonlinear preconditioning).

        TPU shape: each sweep assembles the global residual + Jacobian
        once and takes ONE damped Newton step on every vertex-star patch
        simultaneously — a single batched dense solve (npatch, K, K)
        riding the MXU, with overlap-count (RAS) averaging.  Patches
        exclude Dirichlet dofs, so the constraint manifold is preserved."""
        p = self.problem
        V = p.u.function_space()
        sweeps = int(params.get("npc_snes_max_it", 1))
        damp = float(params.get("npc_snes_linesearch_damping", 1.0))
        cached = getattr(self, "_npc_patches", None)
        if cached is None:
            mesh = V.mesh_obj
            topo = mesh.topology
            cmap = V.cell_dof_map.astype(np.int64)
            cv = topo.cell_vertices
            nvert = int(cv.max()) + 1
            bcset = set(int(b) for b in np.asarray(bc_idx)) \
                if len(bc_idx) else set()
            plists = [set() for _ in range(nvert)]
            for c in range(topo.num_cells):
                dofs = [int(d) for d in cmap[c] if int(d) not in bcset]
                for vv in cv[c]:
                    plists[int(vv)].update(dofs)
            plists = [sorted(q) for q in plists if q]
            K = max(len(q) for q in plists)
            idx = np.zeros((len(plists), K), dtype=np.int64)
            mask = np.zeros((len(plists), K))
            for i, q in enumerate(plists):
                idx[i, :len(q)] = q
                mask[i, :len(q)] = 1.0
            counts = np.zeros(V.dim)
            np.add.at(counts, idx.reshape(-1), mask.reshape(-1))
            counts[counts == 0] = 1.0
            cached = self._npc_patches = (idx, mask, counts)
        idx, mask, counts = cached
        npatch, K = idx.shape
        for _ in range(sweeps):
            p.u.dat = u
            r = np.asarray(self._residual(u))
            Asp = assemble(p.J).to_scipy().tocsr()
            Ap = np.zeros((npatch, K, K))
            for i in range(npatch):
                n = int(mask[i].sum())
                q = idx[i, :n]
                Ap[i, :n, :n] = Asp[np.ix_(q, q)].toarray()
                Ap[i, n:, n:] = np.eye(K - n)
            rp = r[idx] * mask
            dp = np.linalg.solve(Ap, rp[..., None])[..., 0] * mask
            upd = np.zeros(V.dim)
            np.add.at(upd, idx.reshape(-1), dp.reshape(-1))
            u = u - damp * jnp.asarray(upd / counts)
        return u


class LinearSolver:
    """Solve with a pre-assembled Matrix (reference:
    firedrake/linear_solver.py)."""

    def __init__(self, A, *, P=None, solver_parameters=None, **kwargs):
        self.A = A
        self.params = _merged_params(solver_parameters)

    def solve(self, x: Function, b):
        bvec = jnp.asarray(b.dat if isinstance(b, Function) else b)
        A = self.A
        bcs = getattr(A, "bcs", ())
        if self.params.get("ksp_type") == "preonly":
            x.dat = direct_solve(A, bvec)
            return
        from .solvers.composition import OpCtx, build_pc
        ctx = OpCtx(mat=A, space=getattr(A, "row_space", None), bcs=bcs)
        pc = build_pc(ctx, self.params, "")
        res = _run_ksp(A.matvec, bvec, self.params, pc=pc)
        x.dat = res.x
        self.ksp_iterations = int(res.iterations)


# ------------------------------------------------------------------ solve()
def solve(*args, **kwargs):
    """solve(a == L, u, bcs=...), solve(F == 0, u, bcs=...), or
    solve(A, x, b) (reference: firedrake/solving.py:34)."""
    if isinstance(args[0], Equation):
        eq, u = args[0], args[1]
        bcs = kwargs.get("bcs")
        sp = kwargs.get("solver_parameters")
        J = kwargs.get("J")
        appctx = kwargs.get("appctx")
        nullspace = kwargs.get("nullspace")
        nums = {a.number for a in eq.lhs.arguments()}
        is_linear = nums == {0, 1}
        if is_linear:
            problem = LinearVariationalProblem(eq.lhs, eq.rhs, u, bcs=bcs)
            solver = LinearVariationalSolver(problem, solver_parameters=sp,
                                             appctx=appctx,
                                             nullspace=nullspace)
        else:
            F = eq.lhs
            if isinstance(eq.rhs, Form) and not eq.rhs.empty():
                F = F - eq.rhs
            problem = NonlinearVariationalProblem(F, u, bcs=bcs, J=J)
            solver = NonlinearVariationalSolver(problem,
                                                solver_parameters=sp,
                                                appctx=appctx)
        solver.solve()
        from .adjoint.tape import (annotate_tape, get_working_tape,
                                   SolveBlock)
        if annotate_tape():
            if is_linear:
                from .language.calculus import action
                resid = action(eq.lhs, u) - (
                    eq.rhs if isinstance(eq.rhs, Form) else
                    Form(()))
            else:
                resid = F
            get_working_tape().add_block(
                SolveBlock(resid, u, bcs, sp))
        return u
    # linear-algebra form: solve(A, x, b)
    A, x, b = args[:3]
    solver = LinearSolver(A, solver_parameters=kwargs.get(
        "solver_parameters"))
    solver.solve(x, b)
    return x
