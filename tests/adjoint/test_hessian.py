"""Second-order adjoint (Hessian actions) + disk tape checkpointing
(reference: pyadjoint ReducedFunctional.hessian used by
firedrake.adjoint tests/firedrake/adjoint/test_hessian.py;
firedrake/adjoint_utils/checkpointing.py:528)."""
import math
import os

import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           TrialFunction, SpatialCoordinate,
                           UnitSquareMesh, DirichletBC, Constant,
                           inner, grad, dx, solve, sin)
from firedrake_tpu.adjoint import (continue_annotation, pause_annotation,
                                   get_working_tape, set_working_tape,
                                   Tape, Control, ReducedFunctional,
                                   taylor_test, enable_disk_checkpointing)


@pytest.fixture(autouse=True)
def clean_tape():
    set_working_tape(Tape())
    pause_annotation()
    yield
    set_working_tape(Tape())
    pause_annotation()


def _poisson_setup(n=6, nonlinear=False):
    mesh = UnitSquareMesh(n, n)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    m = Function(V, name="control").interpolate(X[0] * X[1] + 1.0)
    u = Function(V, name="state")
    v = TestFunction(V)
    bc = DirichletBC(V, 0.0, "on_boundary")
    d = Function(V).interpolate(sin(math.pi * X[0]) * sin(math.pi * X[1]))
    F = (inner(grad(u), grad(v)) - inner(m, v)) * dx
    if nonlinear:
        F = F + inner(u * u * u, v) * dx
    continue_annotation()
    solve(F == 0, u, bcs=[bc],
          solver_parameters={"ksp_rtol": 1e-13, "snes_rtol": 1e-13,
                             "snes_atol": 1e-14})
    J = fd.assemble(0.5 * inner(u - d, u - d) * dx)
    pause_annotation()
    return V, m, J


def test_hessian_linear_exact():
    """Linear PDE + quadratic J: H = (A^-1 M)^T W (A^-1 M); compare the
    tape Hessian action against the explicit dense composition."""
    V, m, J = _poisson_setup(5)
    rf = ReducedFunctional(J, Control(m))

    X = SpatialCoordinate(V.mesh_obj)
    h = Function(V).interpolate(0.3 + X[0] * (1 - X[0]) * X[1])
    Hh = rf.hessian(h)

    u_, v_ = TrialFunction(V), TestFunction(V)
    bc = DirichletBC(V, 0.0, "on_boundary")
    A = fd.assemble(inner(grad(u_), grad(v_)) * dx, bcs=[bc]).to_dense()
    A = np.asarray(A)
    M = np.asarray(fd.assemble(inner(u_, v_) * dx).to_dense())
    Mbc = M.copy()
    idx = bc.dof_indices
    Mbc[idx, :] = 0.0          # lifted rhs: BC rows of M m are dropped
    T = np.linalg.solve(A, Mbc)       # u = T m  (udot = T h)
    W = M.copy()                      # d2J/du2 = mass
    expect = T.T @ (W @ (T @ np.asarray(h.dat)))
    got = np.asarray(Hh.dat)
    assert np.abs(got - expect).max() < 1e-10 * max(1.0,
                                                    np.abs(expect).max())


def test_hessian_taylor_rate3_nonlinear():
    """Nonlinear PDE: remainder with gradient+Hessian converges at ~3."""
    V, m, J = _poisson_setup(5, nonlinear=True)
    rf = ReducedFunctional(J, Control(m))
    X = SpatialCoordinate(V.mesh_obj)
    h = Function(V).interpolate(0.1 * (1 + X[0] + X[1] ** 2))
    Hh = rf.hessian(h)
    # large eps0: the third-order remainder must sit above the warm-
    # started Newton replay noise (~1e-10 in J)
    rate = taylor_test(rf, m, h, Hm=Hh, eps0=0.4)
    assert rate > 2.7


def test_hessian_fd_cross_check_nonlinear():
    """H h  ~  (g(m + eps h) - g(m - eps h)) / (2 eps)."""
    V, m, J = _poisson_setup(4, nonlinear=True)
    rf = ReducedFunctional(J, Control(m))
    X = SpatialCoordinate(V.mesh_obj)
    h = Function(V).interpolate(0.2 + 0.1 * X[0])
    Hh = np.asarray(rf.hessian(h).dat)

    m0 = np.asarray(m.dat).copy()
    hd = np.asarray(h.dat)
    eps = 1e-5

    def grad_at(vals):
        class _V:
            pass
        w = _V()
        w.dat = vals
        rf(w)
        return np.asarray(rf.derivative().dat).copy()

    gp = grad_at(m0 + eps * hd)
    gm = grad_at(m0 - eps * hd)
    fd_H = (gp - gm) / (2 * eps)
    assert np.abs(Hh - fd_H).max() < 1e-5 * max(1.0, np.abs(fd_H).max())


def test_hessian_time_loop_taylor():
    """Hessian through a 3-step implicit time loop with assign blocks."""
    mesh = UnitSquareMesh(4, 4)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    m = Function(V, name="ic").interpolate(1.0 + X[0] * X[1])
    u0 = Function(V, name="u0")
    u = Function(V, name="u")
    v = TestFunction(V)
    dt = 0.05
    continue_annotation()
    u0.assign(m)
    F = (inner(u - u0, v) + dt * inner(grad(u), grad(v))
         + dt * inner(u * u, v)) * dx
    tight = {"ksp_rtol": 1e-14, "snes_rtol": 1e-14, "snes_atol": 1e-15}
    for _ in range(3):
        solve(F == 0, u, solver_parameters=tight)
        u0.assign(u)
    J = fd.assemble(0.5 * inner(u, u) * dx)
    pause_annotation()
    rf = ReducedFunctional(J, Control(m))
    h = Function(V).interpolate(0.1 + 0.05 * X[1])
    Hh = rf.hessian(h)
    rate = taylor_test(rf, m, h, Hm=Hh)
    assert rate > 2.8


def test_disk_checkpointing_gradient(tmp_path):
    """Disk-backed tape snapshots give the identical gradient, with the
    snapshots actually living on disk."""
    mesh = UnitSquareMesh(4, 4)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)

    def run():
        m = Function(V, name="ic").interpolate(1.0 + X[0])
        u0 = Function(V)
        u = Function(V)
        v = TestFunction(V)
        continue_annotation()
        u0.assign(m)
        F = (inner(u - u0, v) + 0.1 * inner(grad(u), grad(v))) * dx
        for _ in range(4):
            solve(F == 0, u)
            u0.assign(u)
        J = fd.assemble(0.5 * inner(u, u) * dx)
        pause_annotation()
        rf = ReducedFunctional(J, Control(m))
        return np.asarray(rf.derivative().dat).copy()

    set_working_tape(Tape())
    g_ram = run()

    tape = set_working_tape(Tape())
    snapdir = tape.enable_disk_checkpointing(str(tmp_path / "tape"))
    g_disk = run()
    files = os.listdir(snapdir)
    assert len(files) > 0, "no snapshots written to disk"
    assert np.abs(g_ram - g_disk).max() < 1e-14
