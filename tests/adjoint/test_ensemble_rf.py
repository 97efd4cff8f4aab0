"""EnsembleReducedFunctional (reference:
adjoint/ensemble_reduced_functional.py:249)."""
import numpy as np

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           SpatialCoordinate, UnitSquareMesh, inner,
                           grad, dx, solve, sin)
from firedrake_tpu.adjoint import (continue_annotation, pause_annotation,
                                   set_working_tape, Tape, Control,
                                   ReducedFunctional,
                                   EnsembleReducedFunctional, taylor_test)


def _member_rf(V, m, shift):
    """J_i = 0.5 || u - d_i ||^2 with -lap u + u = m, taped on a fresh
    tape sharing the SAME control m."""
    X = SpatialCoordinate(V.mesh_obj)
    tape = set_working_tape(Tape())
    u = Function(V)
    v = TestFunction(V)
    d = Function(V).interpolate(sin(X[0] + shift) * X[1])
    continue_annotation()
    F = (inner(grad(u), grad(v)) + inner(u, v) - inner(m, v)) * dx
    solve(F == 0, u, solver_parameters={"ksp_rtol": 1e-13})
    J = fd.assemble(0.5 * inner(u - d, u - d) * dx)
    pause_annotation()
    return ReducedFunctional(J, Control(m), tape=tape)


def test_ensemble_rf_sums_members():
    mesh = UnitSquareMesh(4, 4)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    m = Function(V, name="m").interpolate(1.0 + X[0])
    rfs = [_member_rf(V, m, 0.3 * i) for i in range(3)]
    erf = EnsembleReducedFunctional(rfs)

    Jtot = erf(m)
    assert abs(Jtot - sum(rf(m) for rf in rfs)) < 1e-14

    g = erf.derivative()
    gsum = sum(np.asarray(rf.derivative().dat) for rf in rfs)
    assert np.abs(np.asarray(g.dat) - gsum).max() < 1e-13

    h = Function(V).interpolate(0.1 + 0.05 * X[1])
    rate = taylor_test(erf, m, h)
    assert rate > 1.9

    Hh = erf.hessian(h)
    rate3 = taylor_test(erf, m, h, Hm=Hh, eps0=0.4)
    assert rate3 > 2.7


def test_ensemble_rf_weights():
    mesh = UnitSquareMesh(3, 3)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    m = Function(V, name="m").interpolate(1.0 + X[1])
    rfs = [_member_rf(V, m, 0.5 * i) for i in range(2)]
    erf = EnsembleReducedFunctional(rfs, scale=[0.25, 0.75])
    expect = 0.25 * rfs[0](m) + 0.75 * rfs[1](m)
    assert abs(erf(m) - expect) < 1e-14
    g = erf.derivative()
    gsum = 0.25 * np.asarray(rfs[0].derivative().dat) \
        + 0.75 * np.asarray(rfs[1].derivative().dat)
    assert np.abs(np.asarray(g.dat) - gsum).max() < 1e-13
