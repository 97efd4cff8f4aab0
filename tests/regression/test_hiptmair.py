"""HiptmairPC auxiliary-space preconditioning (reference:
tests/firedrake/multigrid/test_hiptmair.py — H(curl)/H(div) Riesz
maps solved in few iterations)."""
import numpy as np
import pytest

from firedrake_tpu import (UnitSquareMesh, UnitCubeMesh, FunctionSpace,
                           Function, TrialFunction, TestFunction,
                           Constant, DirichletBC, dx, inner, curl, div,
                           grad, solve, errornorm, assemble)
from firedrake_tpu.solvers.krylov import KSP_METHODS
from firedrake_tpu.solvers.composition import OpCtx, build_pc


def _riesz(V, d):
    u, v = TrialFunction(V), TestFunction(V)
    a = inner(d(u), d(v)) * dx + inner(u, v) * dx
    f = Constant((1.0, 2.0) if V.mesh_obj.geometric_dimension == 2
                 else (1.0, 2.0, 4.0))
    L = inner(f, v) * dx
    bcs = [DirichletBC(V, f, "on_boundary")]
    return a, L, bcs, f


def _its(V, a, L, bcs, pc_params, rtol=1e-8):
    import jax.numpy as jnp
    from firedrake_tpu.assemble import assemble as _asm
    A = _asm(a, bcs=bcs)
    # homogeneous problem (bcs baked in via a zero rhs): iteration-count
    # comparison only
    b = jnp.asarray(_asm(L).dat)
    maskf = np.ones(V.dim)
    for bc in bcs:
        maskf[bc.dof_indices] = 0.0
    b = b * jnp.asarray(maskf)
    ctx = OpCtx(mat=A, space=V, form=a, bcs=bcs)
    pc = build_pc(ctx, pc_params, "")
    res = KSP_METHODS["cg"](A.matvec, b, pc=pc, rtol=rtol, max_it=300)
    return int(res.iterations)


HIP = {"pc_type": "python",
       "pc_python_type": "firedrake_tpu.HiptmairPC"}


@pytest.mark.parametrize("family,d", [("N1curl", curl)])
def test_hiptmair_hcurl_2d_its(family, d):
    """The potential-space correction removes the gradient kernel that
    cripples point-Jacobi on H(curl) mass-dominated modes.  (Standalone
    two-level Hiptmair is NOT mesh-independent — the reference applies
    it as the mg_levels smoother inside PCMG, multigrid/test_hiptmair.py
    — so the guarantee tested here is a large win over Jacobi.)"""
    mesh = UnitSquareMesh(8, 8)
    V = FunctionSpace(mesh, family, 1)
    a, L, bcs, _ = _riesz(V, d)
    it_hip = _its(V, a, L, bcs, HIP)
    it_jac = _its(V, a, L, bcs, {"pc_type": "jacobi"})
    assert it_hip < 0.6 * it_jac, (it_hip, it_jac)


def test_hiptmair_hcurl_2d_solution():
    mesh = UnitSquareMesh(6, 6)
    V = FunctionSpace(mesh, "N1curl", 1)
    a, L, bcs, f = _riesz(V, curl)
    u_lu = Function(V)
    solve(a == L, u_lu, bcs=bcs,
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    uh = Function(V)
    solve(a == L, uh, bcs=bcs,
          solver_parameters={"ksp_type": "cg", "ksp_rtol": 1e-11, **HIP})
    assert errornorm(u_lu, uh) < 1e-8
    # the Riesz map of a constant is the constant
    assert errornorm(f, uh) < 1e-6


def test_hiptmair_hcurl_2d_no_bcs():
    """Without Dirichlet BCs the potential Laplacian is pure Neumann:
    the pinned-dof coarse solve must still converge to the LU answer."""
    mesh = UnitSquareMesh(6, 6)
    V = FunctionSpace(mesh, "N1curl", 1)
    u, v = TrialFunction(V), TestFunction(V)
    a = (inner(curl(u), curl(v)) + inner(u, v)) * dx
    f = Constant((1.0, 2.0))
    L = inner(f, v) * dx
    u_lu = Function(V)
    solve(a == L, u_lu,
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    uh = Function(V)
    solve(a == L, uh,
          solver_parameters={"ksp_type": "cg", "ksp_rtol": 1e-11, **HIP})
    assert errornorm(u_lu, uh) < 1e-8


def test_hiptmair_hdiv_2d():
    mesh = UnitSquareMesh(6, 6)
    V = FunctionSpace(mesh, "RT", 1)
    a, L, bcs, f = _riesz(V, div)
    u_lu = Function(V)
    solve(a == L, u_lu, bcs=bcs,
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    uh = Function(V)
    solve(a == L, uh, bcs=bcs,
          solver_parameters={"ksp_type": "cg", "ksp_rtol": 1e-11, **HIP})
    assert errornorm(u_lu, uh) < 1e-8
    it_hip = _its(V, a, L, bcs, HIP)
    it_jac = _its(V, a, L, bcs, {"pc_type": "jacobi"})
    assert it_hip < it_jac


def test_hiptmair_hcurl_3d():
    mesh = UnitCubeMesh(3, 3, 3)
    V = FunctionSpace(mesh, "N1curl", 1)
    a, L, bcs, f = _riesz(V, curl)
    u_lu = Function(V)
    solve(a == L, u_lu, bcs=bcs,
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    uh = Function(V)
    solve(a == L, uh, bcs=bcs,
          solver_parameters={"ksp_type": "cg", "ksp_rtol": 1e-11, **HIP})
    assert errornorm(u_lu, uh) < 1e-8


def test_hiptmair_hdiv_3d():
    mesh = UnitCubeMesh(3, 3, 3)
    V = FunctionSpace(mesh, "RT", 1)
    a, L, bcs, f = _riesz(V, div)
    u_lu = Function(V)
    solve(a == L, u_lu, bcs=bcs,
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    uh = Function(V)
    solve(a == L, uh, bcs=bcs,
          solver_parameters={"ksp_type": "cg", "ksp_rtol": 1e-11, **HIP})
    assert errornorm(u_lu, uh) < 1e-8
