"""RestrictedFunctionSpace: boundary dofs removed from the system
(reference: functionspaceimpl.py:932; tests/firedrake/regression/
test_restricted_function_space.py)."""
import math

import numpy as np

from firedrake_tpu import (FunctionSpace, RestrictedFunctionSpace,
                           Function, TestFunction, TrialFunction,
                           SpatialCoordinate, UnitSquareMesh,
                           DirichletBC, inner, grad, dx, solve, sin)


def test_restricted_matches_bc_solve():
    mesh = UnitSquareMesh(10, 10)
    V = FunctionSpace(mesh, "CG", 2)
    Vr = RestrictedFunctionSpace(V, boundary_set=["on_boundary"])
    assert Vr.dim < V.dim
    X = SpatialCoordinate(mesh)
    f = 2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1])
    u1 = Function(V)
    u, v = TrialFunction(V), TestFunction(V)
    solve(inner(grad(u), grad(v)) * dx == f * v * dx, u1,
          bcs=[DirichletBC(V, 0.0, "on_boundary")],
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    ur = Function(Vr)
    u, v = TrialFunction(Vr), TestFunction(Vr)
    solve(inner(grad(u), grad(v)) * dx == f * v * dx, ur,
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    full = np.zeros(V.dim)
    perm = Vr._node_perm
    keep = perm < Vr.num_nodes
    full[np.nonzero(keep)[0]] = np.asarray(ur.dat)[perm[keep]]
    assert np.abs(full - np.asarray(u1.dat)).max() < 1e-11


def test_restricted_iterative():
    """The restricted operator is genuinely SPD (no bc row surgery)."""
    mesh = UnitSquareMesh(8, 8)
    V = FunctionSpace(mesh, "CG", 1)
    Vr = RestrictedFunctionSpace(V, boundary_set=["on_boundary"])
    u, v = TrialFunction(Vr), TestFunction(Vr)
    X = SpatialCoordinate(mesh)
    a = inner(grad(u), grad(v)) * dx
    L = sin(X[0]) * v * dx
    u1, u2 = Function(Vr), Function(Vr)
    solve(a == L, u1, solver_parameters={
        "ksp_type": "preonly", "pc_type": "lu"})
    solve(a == L, u2, solver_parameters={
        "ksp_type": "cg", "pc_type": "jacobi", "ksp_rtol": 1e-12})
    assert np.abs(np.asarray(u1.dat) - np.asarray(u2.dat)).max() < 1e-10
