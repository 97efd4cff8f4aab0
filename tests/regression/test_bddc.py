"""BDDCPC balancing domain decomposition (reference:
tests/firedrake/regression/test_bddc.py — Poisson/elasticity solved in
few, near-mesh-independent iterations)."""
import numpy as np
import jax.numpy as jnp

from firedrake_tpu import (UnitSquareMesh, UnitCubeMesh, FunctionSpace,
                           VectorFunctionSpace, Function, TrialFunction,
                           TestFunction, SpatialCoordinate, Constant,
                           DirichletBC, dx, inner, grad, sym, tr,
                           Identity, div, solve, errornorm, assemble)
from firedrake_tpu.solvers.krylov import KSP_METHODS
from firedrake_tpu.solvers.composition import OpCtx, build_pc

BDDC = {"pc_type": "python", "pc_python_type": "firedrake_tpu.BDDCPC"}


def _its(V, a, bcs, pc_params, rtol=1e-10, seed=7, max_it=500):
    A = assemble(a, bcs=bcs)
    rng = np.random.default_rng(seed)
    b = jnp.asarray(rng.standard_normal(V.dim))
    maskf = np.ones(V.dim)
    for bc in bcs:
        maskf[bc.dof_indices] = 0.0
    b = b * jnp.asarray(maskf)
    ctx = OpCtx(mat=A, space=V, form=a, bcs=bcs, appctx={})
    pc = build_pc(ctx, pc_params, "")
    res = KSP_METHODS["cg"](A.matvec, b, pc=pc, rtol=rtol, max_it=max_it)
    resid = float(jnp.max(jnp.abs(A.matvec(res.x) - b)))
    return int(res.iterations), resid


def _poisson(mesh, degree=2):
    V = FunctionSpace(mesh, "CG", degree)
    u, v = TrialFunction(V), TestFunction(V)
    a = inner(grad(u), grad(v)) * dx
    bcs = [DirichletBC(V, 0.0, "on_boundary")]
    return V, a, bcs


def test_bddc_poisson_iterations():
    """Few iterations, and the count barely moves under refinement with
    a fixed subdomain count (the (1+log(H/h))^2 bound)."""
    its = {}
    for n in (16, 32):
        V, a, bcs = _poisson(UnitSquareMesh(n, n))
        it, resid = _its(V, a, bcs, {**BDDC, "bddc_subdomains": 16})
        assert resid < 1e-8
        its[n] = it
    assert its[16] <= 15
    assert its[32] <= its[16] + 3, its


def test_bddc_beats_jacobi():
    V, a, bcs = _poisson(UnitSquareMesh(24, 24))
    it_b, _ = _its(V, a, bcs, BDDC)
    it_j, _ = _its(V, a, bcs, {"pc_type": "jacobi"}, max_it=2000)
    assert it_b < 0.25 * it_j, (it_b, it_j)


def test_bddc_elasticity():
    """Vector-valued (2D elasticity): rigid modes handled by the
    corner + edge-average primal space."""
    mesh = UnitSquareMesh(16, 16)
    V = VectorFunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    mu, lam = 1.0, 1.0

    def eps(w):
        return sym(grad(w))

    a = (2 * mu * inner(eps(u), eps(v))
         + lam * inner(div(u), div(v))) * dx
    bcs = [DirichletBC(V, Constant((0.0, 0.0)), 1)]
    it, resid = _its(V, a, bcs, {**BDDC, "bddc_subdomains": 9})
    assert resid < 1e-8
    assert it <= 40, it


def test_bddc_solve_path():
    """End-to-end through solve(): matches the LU answer."""
    mesh = UnitSquareMesh(12, 12)
    V = FunctionSpace(mesh, "CG", 3)
    u, v = TrialFunction(V), TestFunction(V)
    x, y = SpatialCoordinate(mesh)
    f = Function(V).interpolate(x * y)
    a = (inner(grad(u), grad(v)) + inner(u, v)) * dx
    L = inner(f, v) * dx
    bcs = [DirichletBC(V, 0.0, "on_boundary")]
    u_lu = Function(V)
    solve(a == L, u_lu, bcs=bcs,
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    uh = Function(V)
    solve(a == L, uh, bcs=bcs,
          solver_parameters={"ksp_type": "cg", "ksp_rtol": 1e-11, **BDDC})
    assert errornorm(u_lu, uh) < 1e-8


def test_bddc_3d():
    mesh = UnitCubeMesh(6, 6, 6)
    V, a, bcs = _poisson(mesh, degree=1)
    it, resid = _its(V, a, bcs, {**BDDC, "bddc_subdomains": 8})
    assert resid < 1e-8
    assert it <= 30, it


def test_bddc_primal_markers():
    """appctx primal_markers force extra dofs into the coarse space."""
    mesh = UnitSquareMesh(16, 16)
    V, a, bcs = _poisson(mesh)
    A = assemble(a, bcs=bcs)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(V.dim))
    maskf = np.ones(V.dim)
    for bc in bcs:
        maskf[bc.dof_indices] = 0.0
    b = b * jnp.asarray(maskf)
    interface = np.setdiff1d(np.arange(0, V.dim, 97),
                             bcs[0].dof_indices)[:8]
    ctx = OpCtx(mat=A, space=V, form=a, bcs=bcs,
                appctx={"primal_markers": interface})
    pc = build_pc(ctx, {**BDDC, "bddc_subdomains": 16}, "")
    res = KSP_METHODS["cg"](A.matvec, b, pc=pc, rtol=1e-10, max_it=200)
    resid = float(jnp.max(jnp.abs(A.matvec(res.x) - b)))
    assert resid < 1e-8
