"""SNES-level spellings tail + adjoint tail (round-4 verdict Missing
#4/#5): PMGSNES (nonlinear p-coarsening FAS, reference
preconditioners/pmg.py:1484), AuxiliaryOperatorSNES (nonlinear
Richardson with an auxiliary operator, preconditioners/
auxiliary_snes.py), and L2RieszMap / L2TransformedFunctional
(adjoint/transformed_functional.py:19,141)."""
import math

import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           SpatialCoordinate, UnitSquareMesh,
                           DirichletBC, inner, grad, dx, solve, sin,
                           AuxiliaryOperatorSNES)
from firedrake_tpu.adjoint import (continue_annotation, pause_annotation,
                                   get_working_tape, Control,
                                   taylor_test, L2RieszMap,
                                   L2TransformedFunctional)


def _nonlinear_problem(degree=2, n=8):
    mesh = UnitSquareMesh(n, n)
    V = FunctionSpace(mesh, "CG", degree)
    u = Function(V)
    v = TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = sin(math.pi * X[0]) * sin(math.pi * X[1])
    F = ((1.0 + u * u) * inner(grad(u), grad(v)) - inner(f, v)) * dx
    bc = DirichletBC(V, 0.0, "on_boundary")
    return F, u, bc, V


def test_pfas_matches_newton():
    """snes_type 'pfas': FAS over degree-coarsened levels on ONE mesh
    (the PMGSNES role) reaches the Newton solution."""
    F, u, bc, V = _nonlinear_problem(degree=2)
    solve(F == 0, u, bcs=[bc], solver_parameters={
        "snes_type": "pfas", "snes_rtol": 1e-10,
        "fas_levels_max_it": 4})
    F2, ref, bc2, _ = _nonlinear_problem(degree=2)
    solve(F2 == 0, ref, bcs=[bc2], solver_parameters={
        "snes_type": "newtonls", "snes_rtol": 1e-12,
        "ksp_rtol": 1e-12})
    err = np.abs(np.asarray(u.dat) - np.asarray(ref.dat)).max()
    assert err < 1e-7, err


def test_pfas_python_spelling():
    """The reference spelling snes_python_type '...PMGSNES' routes to
    the same p-FAS solver."""
    F, u, bc, V = _nonlinear_problem(degree=2, n=4)
    solve(F == 0, u, bcs=[bc], solver_parameters={
        "snes_type": "python",
        "snes_python_type": "firedrake.PMGSNES",
        "snes_rtol": 1e-9})
    r = fd.assemble(F)
    free = np.ones(V.dim)
    free[DirichletBC(V, 0.0, "on_boundary").nodes] = 0.0
    assert np.abs(np.asarray(r.dat) * free).max() < 1e-8


class _LaplaceAux(AuxiliaryOperatorSNES):
    def form(self, snes, test, trial):
        a = (inner(grad(trial), grad(test)) + inner(trial, test)) * dx
        return a, ()


def test_auxiliary_operator_snes():
    """Nonlinear Richardson preconditioned by a fixed Laplacian: for a
    mildly nonlinear residual this is an inexact Newton method."""
    F, u, bc, V = _nonlinear_problem(degree=1)
    solve(F == 0, u, bcs=[bc], solver_parameters={
        "snes_type": "python",
        "snes_python_type": f"{__name__}._LaplaceAux",
        "snes_rtol": 1e-10, "snes_max_it": 100,
        "aux_ksp_type": "preonly", "aux_pc_type": "lu"})
    F2, ref, bc2, _ = _nonlinear_problem(degree=1)
    solve(F2 == 0, ref, bcs=[bc2], solver_parameters={
        "snes_type": "newtonls", "snes_rtol": 1e-12,
        "ksp_rtol": 1e-12})
    err = np.abs(np.asarray(u.dat) - np.asarray(ref.dat)).max()
    assert err < 1e-7, err


@pytest.fixture
def clean_tape():
    get_working_tape().clear_tape()
    pause_annotation()
    yield
    get_working_tape().clear_tape()
    pause_annotation()


def test_l2_riesz_map():
    mesh = UnitSquareMesh(4, 4)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    f = Function(V).interpolate(X[0] + X[1])
    from firedrake_tpu import TrialFunction, assemble
    u, v = TrialFunction(V), TestFunction(V)
    M = assemble(inner(u, v) * dx)
    from firedrake_tpu.function import Cofunction
    c = Cofunction(V)
    c.dat = np.asarray(M.matvec(np.asarray(f.dat)))
    back = L2RieszMap(V)(c)
    assert np.abs(np.asarray(back.dat) - np.asarray(f.dat)).max() < 1e-10


def test_l2_transformed_functional_taylor(clean_tape):
    """Taylor test at rate 2 in the TRANSFORMED (l2-orthonormal)
    variables, and the transformed gradient is the whitened L2
    gradient: g~ = C^{-1} g."""
    mesh = UnitSquareMesh(5, 5)
    Q = FunctionSpace(mesh, "DG", 1)      # DG control space
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    m = Function(Q, name="control").interpolate(X[0] * X[1])
    u = Function(V, name="state")
    v = TestFunction(V)
    bc = DirichletBC(V, 0.0, "on_boundary")
    d = Function(V).interpolate(sin(math.pi * X[0]) * X[1])

    continue_annotation()
    F = (inner(grad(u), grad(v)) - inner(m, v)) * dx
    solve(F == 0, u, bcs=[bc], solver_parameters={"ksp_rtol": 1e-13})
    J = fd.assemble(0.5 * inner(u - d, u - d) * dx)
    pause_annotation()

    rf = L2TransformedFunctional(J, Control(m))
    mt = rf.controls[0]
    rng = np.random.default_rng(3)
    h = Function(Q, val=rng.standard_normal(Q.dim))
    order = taylor_test(rf, mt, h)
    assert order > 1.9, order

    # whitening identity: l2 dot of the transformed gradient with a
    # transformed direction equals the untransformed directional
    # derivative <g, C^{-T} h~>
    from firedrake_tpu.adjoint import ReducedFunctional
    g_t = rf.derivative()
    rf0 = ReducedFunctional(J, Control(m))
    rf0([Function(Q, val=rf._primal(np.asarray(mt.dat))[0])])
    g0 = rf0.derivative()
    hC = rf._chol.C_T_inv(np.asarray(h.dat))
    lhs = float(np.dot(np.asarray(g_t.dat), np.asarray(h.dat)))
    rhs = float(np.dot(np.asarray(g0.dat), hC))
    assert abs(lhs - rhs) < 1e-10 * max(1.0, abs(rhs))
