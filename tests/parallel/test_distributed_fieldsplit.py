"""Distributed fieldsplit (round-3 verdict Missing #3 tail): a composed
preconditioner — Schur-complement / additive fieldsplit over a mixed
space — runs inside ONE shard_map program over the device mesh, and the
same program at nshards=1 reproduces the identical algorithm, so
partition-independence is checked directly.

Reference: PCFIELDSPLIT under mpiexec (firedrake Stokes demos);
MassInvPC (preconditioners/massinv.py) as the Schur approximation.
"""
import numpy as np
import pytest

from firedrake_tpu import (FunctionSpace, VectorFunctionSpace,
                           MixedFunctionSpace, Function, TestFunctions,
                           TrialFunctions, SpatialCoordinate,
                           UnitSquareMesh, DirichletBC, Constant,
                           inner, grad, div, dx, solve, errornorm,
                           as_vector)


@pytest.fixture(scope="module")
def stokes():
    mesh = UnitSquareMesh(4, 4)
    V = VectorFunctionSpace(mesh, "CG", 2)
    Q = FunctionSpace(mesh, "CG", 1)
    W = MixedFunctionSpace([V, Q])
    u, p = TrialFunctions(W)
    v, q = TestFunctions(W)
    X = SpatialCoordinate(mesh)
    a = (inner(grad(u), grad(v)) - p * div(v) - q * div(u)) * dx
    L = inner(Constant([0.0, 0.0]), v) * dx
    uex = as_vector([X[1] * (1 - X[1]), 0.0])
    bcs = [DirichletBC(W.sub(0), Function(V).interpolate(uex),
                       (1, 2, 3, 4))]
    ref = Function(W)
    solve(a == L, ref, bcs=bcs,
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    return W, a, L, bcs, uex, ref


def _dsolve(stokes, nshards):
    W, a, L, bcs, uex, ref = stokes
    w = Function(W)
    solve(a == L, w, bcs=bcs, solver_parameters={
        "distributed": nshards,
        "pc_type": "fieldsplit",
        "pc_fieldsplit_type": "schur",
        "ksp_type": "fgmres",
        "ksp_rtol": 1e-10})
    return w


def test_distributed_schur_stokes_matches_serial_lu(stokes):
    W, a, L, bcs, uex, ref = stokes
    w = _dsolve(stokes, 8)
    uh, ph = w.subfunctions
    assert errornorm(uex, uh) < 1e-7
    # pressure defined up to a constant (enclosed flow)
    pdiff = (np.asarray(ph.dat)
             - np.asarray(ref.subfunctions[1].dat))
    assert np.std(pdiff) < 1e-6


def test_partition_independent_iterations(stokes):
    w1 = _dsolve(stokes, 1)
    w8 = _dsolve(stokes, 8)
    assert w1._dist_iterations == w8._dist_iterations
    np.testing.assert_allclose(np.asarray(w8.dat), np.asarray(w1.dat),
                               atol=1e-8)


def test_distributed_additive_coupled_poisson():
    mesh = UnitSquareMesh(6, 6)
    V = FunctionSpace(mesh, "CG", 1)
    W = MixedFunctionSpace([V, V])
    u0, u1 = TrialFunctions(W)
    v0, v1 = TestFunctions(W)
    X = SpatialCoordinate(mesh)
    a = (inner(grad(u0), grad(v0)) + u0 * v0
         + inner(grad(u1), grad(v1)) + u1 * v1
         + 0.1 * (u0 * v1 + u1 * v0)) * dx
    L = (X[0] * v0 + X[1] * X[0] * v1) * dx
    bcs = [DirichletBC(W.sub(0), 0.0, "on_boundary"),
           DirichletBC(W.sub(1), 1.0, "on_boundary")]
    ref = Function(W)
    solve(a == L, ref, bcs=bcs,
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    w = Function(W)
    solve(a == L, w, bcs=bcs, solver_parameters={
        "distributed": 8,
        "pc_type": "fieldsplit",
        "pc_fieldsplit_type": "additive",
        "ksp_type": "fgmres",
        "ksp_rtol": 1e-11})
    np.testing.assert_allclose(np.asarray(w.dat), np.asarray(ref.dat),
                               atol=1e-8)
