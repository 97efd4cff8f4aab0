"""SCPC: static condensation of cell-interior dofs (reference:
firedrake/slate/static_condensation/scpc.py, used on CG_k k>=3 /
bubble-enriched spaces)."""
import math

import numpy as np

from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           TrialFunction, SpatialCoordinate,
                           UnitSquareMesh, DirichletBC, inner, grad, dx,
                           solve, sin)


def _setup(deg, n=6):
    mesh = UnitSquareMesh(n, n)
    V = FunctionSpace(mesh, "CG", deg)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = 2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1])
    return mesh, V, inner(grad(u), grad(v)) * dx, f * v * dx, X


def test_scpc_matches_lu():
    for deg in (3, 4):
        mesh, V, a, L, X = _setup(deg)
        bcs = [DirichletBC(V, 0.0, "on_boundary")]
        us, uc = Function(V), Function(V)
        solve(a == L, us, bcs=bcs, solver_parameters={
            "ksp_type": "preonly", "pc_type": "lu"})
        solve(a == L, uc, bcs=bcs, solver_parameters={
            "ksp_type": "preonly", "pc_type": "scpc"})
        assert np.abs(np.asarray(us.dat)
                      - np.asarray(uc.dat)).max() < 1e-11


def test_scpc_inner_cg_nonzero_bc():
    mesh, V, a, L, X = _setup(3, n=5)
    g = Function(V).interpolate(X[0] + X[1])
    bcs = [DirichletBC(V, g, "on_boundary")]
    us, uc = Function(V), Function(V)
    solve(a == L, us, bcs=bcs, solver_parameters={
        "ksp_type": "preonly", "pc_type": "lu"})
    solve(a == L, uc, bcs=bcs, solver_parameters={
        "ksp_type": "preonly", "pc_type": "scpc",
        "condensed_field": {"ksp_type": "cg", "pc_type": "jacobi",
                            "ksp_rtol": 1e-13}})
    assert np.abs(np.asarray(us.dat)
                  - np.asarray(uc.dat)).max() < 1e-10
