"""GTMGPC non-nested multigrid on the hybridization trace system
(reference: tests/firedrake/multigrid/test_poisson_gtmg.py)."""
import numpy as np

from firedrake_tpu import (UnitSquareMesh, FunctionSpace,
                           MixedFunctionSpace, Function, TrialFunction,
                           TestFunction, TrialFunctions, TestFunctions,
                           SpatialCoordinate, DirichletBC, dx, inner,
                           grad, div, solve, errornorm)


def _mixed_poisson(n=10, gt_extra=None):
    mesh = UnitSquareMesh(n, n)
    x = SpatialCoordinate(mesh)

    def get_p1_space():
        return FunctionSpace(mesh, "CG", 1)

    def get_p1_prb_bcs():
        return DirichletBC(get_p1_space(), 0.0, "on_boundary")

    def p1_callback():
        P1 = get_p1_space()
        p = TrialFunction(P1)
        q = TestFunction(P1)
        return inner(grad(p), grad(q)) * dx

    RT = FunctionSpace(mesh, "RT", 1)
    DG = FunctionSpace(mesh, "DG", 0)
    W = MixedFunctionSpace([RT, DG])
    sigma, u = TrialFunctions(W)
    tau, v = TestFunctions(W)
    f = Function(DG)
    f.interpolate(-2 * (x[0] - 1) * x[0] - 2 * (x[1] - 1) * x[1])
    a = (inner(sigma, tau) - inner(u, div(tau))
         + inner(div(sigma), v)) * dx
    L = inner(f, v) * dx
    w = Function(W)
    params = {"pc_type": "hybridization",
              "hybridization": {"ksp_type": "cg",
                                "ksp_rtol": 1e-10,
                                "pc_type": "python",
                                "pc_python_type":
                                    "firedrake_tpu.GTMGPC",
                                **(gt_extra or {})}}
    appctx = {"get_coarse_operator": p1_callback,
              "get_coarse_space": get_p1_space,
              "coarse_space_bcs": get_p1_prb_bcs()}
    solve(a == L, w, solver_parameters=params, appctx=appctx)
    uh = w.subfunctions[1]
    exact = Function(DG)
    exact.interpolate(x[0] * (1 - x[0]) * x[1] * (1 - x[1]))
    return errornorm(exact, uh), mesh


def test_gtmg_mixed_poisson():
    err, _ = _mixed_poisson()
    assert err < 2e-3, err  # DG0 interpolant accuracy at n=10


def test_gtmg_custom_smoother():
    err, _ = _mixed_poisson(gt_extra={
        "gt": {"mg_levels": {"ksp_type": "chebyshev",
                             "ksp_max_it": 3,
                             "pc_type": "jacobi"},
               "mg_coarse": {"ksp_type": "preonly",
                             "pc_type": "lu"}}})
    assert err < 2e-3, err


def test_gtmg_iterations_beat_jacobi():
    """The P1 coarse correction makes the trace solve fast."""
    import jax.numpy as jnp
    from firedrake_tpu.solvers.krylov import KSP_METHODS
    from firedrake_tpu.solvers.composition import OpCtx, build_pc
    from firedrake_tpu import assemble
    from firedrake_tpu.solvers.hybridization import solve_hybridization

    # build the trace operator by running hybridization once, then
    # compare PC quality directly on a Poisson-like trace problem: use
    # the P1 operator itself as a stand-in fine problem with GTMG
    mesh = UnitSquareMesh(12, 12)
    P1 = FunctionSpace(mesh, "CG", 1)
    p, q = TrialFunction(P1), TestFunction(P1)
    aP = inner(grad(p), grad(q)) * dx
    bcs = [DirichletBC(P1, 0.0, "on_boundary")]
    A = assemble(aP, bcs=bcs)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(P1.dim))
    maskf = np.ones(P1.dim)
    for bc in bcs:
        maskf[bc.dof_indices] = 0.0
    b = b * jnp.asarray(maskf)
    appctx = {"get_coarse_space": lambda: P1,
              "get_coarse_operator": lambda: aP,
              "coarse_space_bcs": bcs}
    ctx = OpCtx(mat=A, space=P1, form=aP, bcs=bcs, appctx=appctx)
    pc = build_pc(ctx, {"pc_type": "python",
                        "pc_python_type": "firedrake_tpu.GTMGPC"}, "")
    res = KSP_METHODS["cg"](A.matvec, b, pc=pc, rtol=1e-10, max_it=100)
    # identical coarse space + exact coarse solve => a handful of its
    assert int(res.iterations) <= 3, int(res.iterations)
