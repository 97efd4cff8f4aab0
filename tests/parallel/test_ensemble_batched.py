"""Device-parallel ensemble solves: all members in one vmapped/sharded
XLA program (reference: firedrake ensemble solves across ensemble
ranks, ensemble.py:31-60)."""
import numpy as np

import firedrake_tpu as fd
from firedrake_tpu import (Ensemble, EnsembleFunction,
                           EnsembleFunctionSpace, ensemble_batched_solve,
                           FunctionSpace, Function, TestFunction,
                           TrialFunction, SpatialCoordinate,
                           UnitSquareMesh, DirichletBC, inner, grad, dx,
                           solve, sin)


def test_batched_ensemble_matches_sequential():
    mesh = UnitSquareMesh(8, 8)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    ens = Ensemble(n_members=4)
    EV = EnsembleFunctionSpace([V] * 4, ens)

    fvals = EnsembleFunction(EV, name="f")
    for i, m in enumerate(fvals.members):
        m.interpolate((1.0 + i) * sin(X[0] + 0.3 * i) * X[1])

    u, v = TrialFunction(V), TestFunction(V)
    f = Function(V, name="fslot")
    a = (inner(grad(u), grad(v)) + u * v) * dx
    L = f * v * dx
    bc = DirichletBC(V, 0.0, "on_boundary")

    sols = EnsembleFunction(EV, name="u")
    _, its = ensemble_batched_solve(
        ens, a, L, sols, bcs=[bc], varying=[(f, fvals)],
        solver_parameters={"ksp_type": "cg", "ksp_rtol": 1e-12})
    assert (np.asarray(its) > 0).all()

    for i in range(4):
        f.dat = np.asarray(fvals.members[i].dat).copy()
        ref = Function(V)
        solve(a == L, ref, bcs=[bc], solver_parameters={
            "ksp_type": "cg", "pc_type": "none", "ksp_rtol": 1e-12,
            "mat_type": "matfree"})
        d = np.abs(np.asarray(sols.members[i].dat)
                   - np.asarray(ref.dat)).max()
        assert d < 1e-8, (i, d)


def test_batched_ensemble_varying_operator_coefficient():
    """Coefficient appears in the OPERATOR: every member gets a
    different matvec inside the one vmapped program."""
    mesh = UnitSquareMesh(6, 6)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    ens = Ensemble(n_members=2)
    EV = EnsembleFunctionSpace([V] * 2, ens)
    wvals = EnsembleFunction(EV, name="w")
    wvals.members[0].interpolate(1.0 + 0 * X[0])
    wvals.members[1].interpolate(2.0 + X[0])

    u, v = TrialFunction(V), TestFunction(V)
    w = Function(V, name="wslot")
    a = (w * inner(grad(u), grad(v)) + u * v) * dx
    L = X[0] * v * dx

    sols = EnsembleFunction(EV)
    ensemble_batched_solve(ens, a, L, sols, varying=[(w, wvals)],
                           solver_parameters={"ksp_type": "cg",
                                              "ksp_rtol": 1e-12})
    for i in range(2):
        w.dat = np.asarray(wvals.members[i].dat).copy()
        ref = Function(V)
        solve(a == L, ref, solver_parameters={
            "ksp_type": "cg", "pc_type": "none", "ksp_rtol": 1e-12,
            "mat_type": "matfree"})
        d = np.abs(np.asarray(sols.members[i].dat)
                   - np.asarray(ref.dat)).max()
        assert d < 1e-8, (i, d)
