"""Column-structured ASM smoothers on extruded meshes (reference:
tests/firedrake/regression/test_linesmoother.py and asm.py smoothers)."""
import numpy as np
import pytest

from firedrake_tpu import (ExtrudedMesh, UnitIntervalMesh, UnitSquareMesh,
                           FunctionSpace, Function, TrialFunction,
                           TestFunction, SpatialCoordinate, DirichletBC,
                           dx, inner, grad, solve, errornorm, sin)


def _aniso_problem(quad=False, nlay=24, degree=1):
    """Poisson on a thin extruded slab: flat cells (aspect 24:2), the
    classic line-smoother target."""
    if quad:
        base = UnitSquareMesh(2, 2, quadrilateral=True)
    else:
        base = UnitIntervalMesh(2)
    mesh = ExtrudedMesh(base, nlay, layer_height=1.0 / nlay)
    V = FunctionSpace(mesh, "CG", degree)
    u, v = TrialFunction(V), TestFunction(V)
    x = SpatialCoordinate(mesh)
    a = inner(grad(u), grad(v)) * dx
    L = sin(3.14159265358979 * x[0]) * v * dx
    bcs = [DirichletBC(V, 0.0, "top"), DirichletBC(V, 0.0, "bottom")]
    return V, a, L, bcs


def test_linesmooth_matches_lu():
    V, a, L, bcs = _aniso_problem()
    u_lu = Function(V)
    solve(a == L, u_lu, bcs=bcs,
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    u_ls = Function(V)
    solve(a == L, u_ls, bcs=bcs,
          solver_parameters={"ksp_type": "cg", "pc_type": "linesmooth",
                             "ksp_rtol": 1e-12})
    assert errornorm(u_lu, u_ls) < 1e-8


def test_linesmooth_beats_jacobi_on_anisotropy():
    """Vertical-line patches solve the stiff (z) direction exactly, so
    iteration counts stay O(1) while Jacobi degrades with the aspect
    ratio."""
    from firedrake_tpu.solvers.krylov import KSP_METHODS
    from firedrake_tpu.assemble import assemble
    from firedrake_tpu.solvers.composition import OpCtx, build_pc
    import jax.numpy as jnp

    V, a, L, bcs = _aniso_problem(nlay=32)
    A = assemble(a, bcs=bcs)
    b = jnp.asarray(assemble(L).dat)
    ctx = OpCtx(mat=A, space=V, form=a, bcs=bcs)

    def its_with(pc_type):
        pc = build_pc(ctx, {"pc_type": pc_type}, "")
        res = KSP_METHODS["cg"](A.matvec, b, pc=pc, rtol=1e-10,
                                max_it=500)
        return int(res.iterations)

    it_line = its_with("linesmooth")
    it_jac = its_with("jacobi")
    assert it_line < 0.5 * it_jac, (it_line, it_jac)
    assert it_line < 60


def test_linesmooth_codims_option_quad():
    V, a, L, bcs = _aniso_problem(quad=True, nlay=12, degree=2)
    u_lu = Function(V)
    solve(a == L, u_lu, bcs=bcs,
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    u_ls = Function(V)
    solve(a == L, u_ls, bcs=bcs,
          solver_parameters={"ksp_type": "cg", "pc_type": "linesmooth",
                             "pc_linesmooth_codims": "0,1,2",
                             "ksp_rtol": 1e-12})
    assert errornorm(u_lu, u_ls) < 1e-8


def test_extruded_star():
    V, a, L, bcs = _aniso_problem(quad=True, nlay=8, degree=1)
    u_lu = Function(V)
    solve(a == L, u_lu, bcs=bcs,
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    u_st = Function(V)
    solve(a == L, u_st, bcs=bcs,
          solver_parameters={"ksp_type": "cg",
                             "pc_type": "extruded_star",
                             "ksp_rtol": 1e-12})
    assert errornorm(u_lu, u_st) < 1e-8


def test_linesmooth_dg_fallback():
    """DG spaces have no column numbering; codim-0 cell-column closure
    patches still give a convergent smoother."""
    base = UnitIntervalMesh(3)
    mesh = ExtrudedMesh(base, 8, layer_height=0.125)
    V = FunctionSpace(mesh, "DG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    x = SpatialCoordinate(mesh)
    a = inner(u, v) * dx
    L = (x[0] + x[1]) * v * dx
    u_lu = Function(V)
    solve(a == L, u_lu,
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    u_ls = Function(V)
    solve(a == L, u_ls,
          solver_parameters={"ksp_type": "cg", "pc_type": "linesmooth",
                             "pc_linesmooth_codims": "0",
                             "ksp_rtol": 1e-12})
    assert errornorm(u_lu, u_ls) < 1e-8
