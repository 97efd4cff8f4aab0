"""Recursive solver-parameter composition (the PETSc options-tree role,
reference: firedrake/dmhooks.py + preconditioners/massinv.py, pcd.py,
assembled.py, asm.py ASMVankaPC).

Checks that nested prefixed options actually configure nested solvers:
mg inside fieldsplit inside an outer Krylov, MassInv/PCD Schur
approximations, Vanka smoothing, composite PCs.
"""
import numpy as np
import pytest

import firedrake_tpu as fd
import numpy as pi_mod
from firedrake_tpu import (UnitSquareMesh, MeshHierarchy, FunctionSpace,
                           VectorFunctionSpace, Function, TestFunction,
                           TrialFunction, TestFunctions, TrialFunctions,
                           SpatialCoordinate, DirichletBC, Constant,
                           inner, grad, div, dx, solve, as_vector,
                           sin, cos)

pi = pi_mod.pi


def big_stack(fn):
    """Run the test in a thread with a 512MB stack: XLA:CPU compilation
    recurses deeply on nested while-loop programs (fgmres with inner
    Krylov PCs) and the MAIN thread's stack cannot always grow past
    existing heap mappings late in a long pytest process (segfaults in
    backend_compile), while a fresh thread gets its stack allocated
    up-front."""
    import functools
    import threading

    @functools.wraps(fn)
    def wrapper(*a, **k):
        old = threading.stack_size(512 * 1024 * 1024)
        exc = []

        def runner():
            try:
                fn(*a, **k)
            except BaseException as e:     # noqa: BLE001 — re-raised
                exc.append(e)
        t = threading.Thread(target=runner)
        t.start()
        t.join()
        threading.stack_size(old)
        if exc:
            raise exc[0]
    return wrapper


def stokes_problem(n, mesh=None):
    mesh = mesh or UnitSquareMesh(n, n)
    V = VectorFunctionSpace(mesh, "CG", 2)
    Q = FunctionSpace(mesh, "CG", 1)
    W = V * Q
    u, p = TrialFunctions(W)
    v, q = TestFunctions(W)
    a = (inner(grad(u), grad(v)) - p * div(v) - q * div(u)) * dx
    X = SpatialCoordinate(mesh)
    # Poiseuille flow: u = (y(1-y), 0), p = -2x + const
    L = inner(Constant([0.0, 0.0]), v) * dx
    uex = as_vector([X[1] * (1 - X[1]), 0.0])
    bcs = [DirichletBC(W.sub(0), Function(V).interpolate(uex),
                       (1, 2, 3, 4))]
    w = Function(W)
    return a, L, w, bcs, mesh


def poiseuille_error(w, mesh):
    u = w.subfunctions[0]
    X = SpatialCoordinate(mesh)
    return fd.errornorm(as_vector([X[1] * (1 - X[1]), 0.0]), u)


@big_stack
def test_schur_massinv_mesh_independent():
    """fieldsplit(schur) with MassInvPC on the pressure block: iteration
    counts stay bounded under refinement (spectral equivalence)."""
    its = []
    for n in (8, 16):
        a, L, w, bcs, mesh = stokes_problem(n)
        problem = fd.LinearVariationalProblem(a, L, w, bcs=bcs)
        solver = fd.LinearVariationalSolver(
            problem,
            solver_parameters={
                "ksp_type": "fgmres",
                "ksp_rtol": 1e-8,
                "pc_type": "fieldsplit",
                "pc_fieldsplit_type": "schur",
                "pc_fieldsplit_schur_fact_type": "full",
                "fieldsplit_0_ksp_type": "preonly",
                "fieldsplit_0_pc_type": "lu",
                "fieldsplit_1_ksp_type": "preonly",
                "fieldsplit_1_pc_type": "python",
                "fieldsplit_1_pc_python_type": "firedrake.MassInvPC",
                "fieldsplit_1_Mp_ksp_type": "preonly",
                "fieldsplit_1_Mp_pc_type": "lu",
            })
        solver.solve()
        assert poiseuille_error(w, mesh) < 1e-7
        its.append(solver.ksp_iterations)
    # exact A00 inverse + spectrally-equivalent Schur PC => few, flat its
    assert its[-1] <= its[0] + 3
    assert its[-1] < 40


@big_stack
def test_mg_inside_fieldsplit():
    """fieldsplit_0_pc_type: mg — geometric multigrid nested inside the
    velocity block of a Schur fieldsplit, all one options dict."""
    hier = MeshHierarchy(UnitSquareMesh(4, 4), 2)
    a, L, w, bcs, mesh = stokes_problem(None, mesh=hier.meshes[-1])
    problem = fd.LinearVariationalProblem(a, L, w, bcs=bcs)
    solver = fd.LinearVariationalSolver(
        problem,
        solver_parameters={
            "ksp_type": "fgmres",
            "ksp_rtol": 1e-8,
            "pc_type": "fieldsplit",
            "pc_fieldsplit_type": "schur",
            "pc_fieldsplit_schur_fact_type": "full",
            "fieldsplit_0_ksp_type": "preonly",
            "fieldsplit_0_pc_type": "mg",
            "fieldsplit_0_mg_levels_ksp_type": "chebyshev",
            "fieldsplit_0_mg_levels_ksp_max_it": 3,
            "fieldsplit_1_pc_type": "python",
            "fieldsplit_1_pc_python_type": "firedrake.MassInvPC",
        })
    solver.solve()
    assert poiseuille_error(w, mesh) < 1e-6
    assert solver.ksp_iterations < 60


@big_stack
def test_schur_selfp():
    """pc_fieldsplit_schur_precondition: selfp assembles
    A11 - A10 diag(A00)^-1 A01 and preconditions the Schur solve."""
    a, L, w, bcs, mesh = stokes_problem(8)
    problem = fd.LinearVariationalProblem(a, L, w, bcs=bcs)
    solver = fd.LinearVariationalSolver(
        problem,
        solver_parameters={
            "ksp_type": "fgmres",
            "ksp_rtol": 1e-8,
            "pc_type": "fieldsplit",
            "pc_fieldsplit_type": "schur",
            "pc_fieldsplit_schur_fact_type": "lower",
            "pc_fieldsplit_schur_precondition": "selfp",
            "fieldsplit_0_ksp_type": "preonly",
            "fieldsplit_0_pc_type": "lu",
            "fieldsplit_1_ksp_type": "gmres",
            "fieldsplit_1_ksp_rtol": 1e-6,
            "fieldsplit_1_ksp_max_it": 200,
            "fieldsplit_1_pc_type": "jacobi",
        })
    solver.solve()
    assert poiseuille_error(w, mesh) < 1e-6


@big_stack
def test_vanka_smoother():
    """Monolithic Vanka-patch preconditioned outer Krylov on Stokes."""
    a, L, w, bcs, mesh = stokes_problem(6)
    problem = fd.LinearVariationalProblem(a, L, w, bcs=bcs)
    solver = fd.LinearVariationalSolver(
        problem,
        solver_parameters={
            "ksp_type": "fgmres",
            "ksp_rtol": 1e-8,
            "ksp_max_it": 500,
            "pc_type": "vanka",
        })
    solver.solve()
    assert poiseuille_error(w, mesh) < 1e-6


@big_stack
def test_pcksp_nesting():
    """pc_type: ksp — a full inner Krylov solve as preconditioner
    (PCKSP), inner options under ksp_*."""
    mesh = UnitSquareMesh(12, 12)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    a = (inner(grad(u), grad(v)) + u * v) * dx
    x, y = SpatialCoordinate(mesh)
    L = sin(pi * x) * sin(pi * y) * v * dx
    uh = Function(V)
    problem = fd.LinearVariationalProblem(a, L, uh)
    solver = fd.LinearVariationalSolver(
        problem,
        solver_parameters={
            "ksp_type": "fgmres",
            "ksp_rtol": 1e-10,
            "pc_type": "ksp",
            "ksp_ksp_type": "cg",
            "ksp_ksp_rtol": 1e-2,
            "ksp_pc_type": "jacobi",
        })
    solver.solve()
    # inner solve at 1e-2 makes the outer converge in very few its
    assert solver.ksp_iterations <= 10
    ref = Function(V)
    solve(a == L, ref, solver_parameters={"ksp_type": "cg",
                                          "ksp_rtol": 1e-12})
    assert fd.errornorm(ref, uh) < 1e-8


@big_stack
def test_mg_levels_options():
    """mg_levels_* options select the smoother: richardson+patch vs
    default chebyshev+jacobi both converge mesh-independently."""
    hier = MeshHierarchy(UnitSquareMesh(4, 4), 2)
    mesh = hier.meshes[-1]
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    a = inner(grad(u), grad(v)) * dx
    x, y = SpatialCoordinate(mesh)
    L = sin(pi * x) * sin(pi * y) * v * dx
    bcs = [DirichletBC(V, 0.0, "on_boundary")]
    its = {}
    for name, opts in {
        "cheb": {"mg_levels_ksp_type": "chebyshev",
                 "mg_levels_ksp_max_it": 2},
        "rich_patch": {"mg_levels_ksp_type": "richardson",
                       "mg_levels_ksp_max_it": 1,
                       "mg_levels_ksp_richardson_scale": 0.8,
                       "mg_levels_pc_type": "patch"},
    }.items():
        uh = Function(V)
        problem = fd.LinearVariationalProblem(a, L, uh, bcs=bcs)
        solver = fd.LinearVariationalSolver(
            problem, solver_parameters={
                "ksp_type": "cg", "ksp_rtol": 1e-10, "pc_type": "mg",
                **opts})
        solver.solve()
        its[name] = solver.ksp_iterations
        assert solver.converged
    assert its["cheb"] <= 15
    # a single damped-richardson+patch sweep is a much weaker smoother
    # than chebyshev(2); the check is that the options were honoured and
    # the cycle still converges
    assert its["rich_patch"] <= 150
    assert its["rich_patch"] != its["cheb"]


@big_stack
def test_composite_pc():
    mesh = UnitSquareMesh(10, 10)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    a = (inner(grad(u), grad(v)) + u * v) * dx
    x, y = SpatialCoordinate(mesh)
    L = cos(pi * x) * v * dx
    uh = Function(V)
    problem = fd.LinearVariationalProblem(a, L, uh)
    solver = fd.LinearVariationalSolver(
        problem, solver_parameters={
            "ksp_type": "cg", "ksp_rtol": 1e-10,
            "pc_type": "composite",
            "pc_composite_type": "additive",
            "pc_composite_pcs": "jacobi,jacobi"})
    solver.solve()
    assert solver.converged


def test_substitution_warns():
    """Requesting sor/ilu warns about the Jacobi substitution instead of
    silently changing the method."""
    mesh = UnitSquareMesh(4, 4)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    a = (inner(grad(u), grad(v)) + u * v) * dx
    L = v * dx
    uh = Function(V)
    problem = fd.LinearVariationalProblem(a, L, uh)
    solver = fd.LinearVariationalSolver(
        problem, solver_parameters={"ksp_type": "cg", "pc_type": "sor"})
    with pytest.warns(UserWarning, match="[Ss]ubstituting"):
        solver.solve()


@big_stack
def test_auxiliary_operator_pc():
    """User AuxiliaryOperatorPC subclass supplies the preconditioning
    form; resolved via its dotted path."""
    mesh = UnitSquareMesh(10, 10)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    # operator: anisotropic diffusion; aux PC: isotropic Laplacian
    a = (2.0 * inner(grad(u), grad(v)) + u * v) * dx
    x, y = SpatialCoordinate(mesh)
    L = sin(pi * x) * v * dx
    uh = Function(V)
    problem = fd.LinearVariationalProblem(a, L, uh)
    solver = fd.LinearVariationalSolver(
        problem, solver_parameters={
            "ksp_type": "cg", "ksp_rtol": 1e-10,
            "pc_type": "python",
            "pc_python_type":
                "tests.regression.test_solver_composition.LaplacePC"})
    solver.solve()
    assert solver.converged
    assert solver.ksp_iterations <= 12   # spectrally equivalent


class LaplacePC(fd.AuxiliaryOperatorPC):
    def form(self, pc, test, trial):
        a = (inner(grad(trial), grad(test)) + trial * test) * dx
        return a, ()


def navier_stokes_cavity(n, Re, sp):
    mesh = UnitSquareMesh(n, n)
    V = VectorFunctionSpace(mesh, "CG", 2)
    Q = FunctionSpace(mesh, "CG", 1)
    W = V * Q
    w = Function(W)
    u, p = fd.split(w)
    v, q = TestFunctions(W)
    nu = 1.0 / Re
    F = (nu * inner(grad(u), grad(v))
         + inner(fd.dot(u, fd.nabla_grad(u)), v)
         - p * div(v) - q * div(u)) * dx
    X = SpatialCoordinate(mesh)
    lid = as_vector([1.0 + 0 * X[0], 0.0 * X[1]])
    bcs = [DirichletBC(W.sub(0), Function(V).interpolate(lid), 4),
           DirichletBC(W.sub(0), Constant([0.0, 0.0]), (1, 2, 3))]
    appctx = {"Re": Re, "state": w, "velocity_space": 0, "mu": nu}
    solve(F == 0, w, bcs=bcs, solver_parameters=sp, appctx=appctx)
    return w


@pytest.mark.parametrize("schur_pc", ["massinv", "pcd"])
@big_stack
def test_navier_stokes_schur(schur_pc):
    """Lid-driven cavity at Re=50 with Schur fieldsplit; pressure block
    by MassInv (mu-weighted) or PCD."""
    pcname = {"massinv": "firedrake.MassInvPC",
              "pcd": "firedrake.PCDPC"}[schur_pc]
    sp = {
        "snes_rtol": 1e-8,
        "snes_max_it": 30,
        "ksp_type": "fgmres",
        "ksp_rtol": 1e-8,
        "ksp_max_it": 400,
        "pc_type": "fieldsplit",
        "pc_fieldsplit_type": "schur",
        "pc_fieldsplit_schur_fact_type": "full",
        "fieldsplit_0_ksp_type": "preonly",
        "fieldsplit_0_pc_type": "lu",
        "fieldsplit_1_ksp_type": "gmres",
        "fieldsplit_1_ksp_rtol": 1e-4,
        "fieldsplit_1_ksp_max_it": 100,
        "fieldsplit_1_pc_type": "python",
        "fieldsplit_1_pc_python_type": pcname,
    }
    w = navier_stokes_cavity(8, 50.0, sp)
    u = w.subfunctions[0]
    ud = np.asarray(u.dat).reshape(-1, 2)
    # sanity: lid-driven recirculating flow, all finite
    assert 0.9 < np.abs(ud[:, 0]).max() < 1.3
    assert ud[:, 1].max() > 0.02
    assert np.isfinite(np.asarray(w.dat)).all()
