"""H(div) on tetrahedra at degree >= 2: matrix-valued entity
transformations for multi-moment faces (reference: FIAT/FInAT
entity_transformations consumed by firedrake; exercised like
tests/firedrake/regression mixed-Poisson tests on cubes)."""
import numpy as np
import pytest

from firedrake_tpu import (FunctionSpace, MixedFunctionSpace, Function,
                           TestFunction, TrialFunction, TestFunctions,
                           TrialFunctions, SpatialCoordinate,
                           UnitCubeMesh, as_vector, inner, grad, div, dx,
                           assemble, errornorm, solve, sin, cos)
from math import pi


def _galerkin_project(V, f):
    from scipy.sparse.linalg import spsolve
    u, v = TrialFunction(V), TestFunction(V)
    M = assemble(inner(u, v) * dx)
    b = assemble(inner(f, v) * dx)
    x = spsolve(M.to_scipy().tocsc(), np.asarray(b.dat))
    uh = Function(V)
    uh.dat = x
    return uh


def test_rt2_tet_patch_test():
    """Linear fields are in RT2: global projection must reproduce them
    exactly — fails unless the face-moment transforms keep the space
    H(div)-conforming across every cell pair."""
    mesh = UnitCubeMesh(2, 2, 2)
    V = FunctionSpace(mesh, "RT", 2)
    X = SpatialCoordinate(mesh)
    f = as_vector([1.0 + 2 * X[0] - X[1], 0.5 * X[2] + X[0],
                   X[1] - 3 * X[2]])
    uh = _galerkin_project(V, f)
    assert errornorm(f, uh) < 1e-10


def test_rt3_tet_patch_test():
    """Quadratic fields are in RT3."""
    mesh = UnitCubeMesh(2, 2, 2)
    V = FunctionSpace(mesh, "RT", 3)
    X = SpatialCoordinate(mesh)
    f = as_vector([X[0] * X[1], X[2] ** 2 - X[0], X[1] * X[2] + 1.0])
    uh = _galerkin_project(V, f)
    assert errornorm(f, uh) < 1e-9


def test_rt2_projection_converges():
    """Projection error of a smooth field decays at O(h^2) for RT2."""
    errs = []
    for n in (2, 4):
        mesh = UnitCubeMesh(n, n, n)
        V = FunctionSpace(mesh, "RT", 2)
        X = SpatialCoordinate(mesh)
        f = as_vector([sin(pi * X[0]), cos(pi * X[1]),
                       sin(pi * X[2])])
        uh = _galerkin_project(V, f)
        errs.append(errornorm(f, uh))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 1.7, (errs, rate)


def test_mixed_poisson_rt2_dg1_tet():
    """RT2 x DG1 mixed Poisson on a cube matches the strong solution at
    second order (reference: demos/poisson_mixed + 3D regression)."""
    import math
    errs_u = []
    for n in (2, 4):
        mesh = UnitCubeMesh(n, n, n)
        S = FunctionSpace(mesh, "RT", 2)
        Q = FunctionSpace(mesh, "DG", 1)
        W = MixedFunctionSpace([S, Q])
        sigma, u = TrialFunctions(W)
        tau, v = TestFunctions(W)
        X = SpatialCoordinate(mesh)
        uex = X[0] * (1 - X[0]) * X[1] * (1 - X[1]) * X[2] * (1 - X[2])
        f = -(-2 * X[1] * (1 - X[1]) * X[2] * (1 - X[2])
              - 2 * X[0] * (1 - X[0]) * X[2] * (1 - X[2])
              - 2 * X[0] * (1 - X[0]) * X[1] * (1 - X[1]))
        a = (inner(sigma, tau) + div(tau) * u + div(sigma) * v) * dx
        L = -f * v * dx
        w = Function(W)
        solve(a == L, w, solver_parameters={"ksp_type": "preonly",
                                            "pc_type": "lu"})
        uh = w.subfunctions[1]
        errs_u.append(errornorm(uex, uh))
    rate = np.log2(errs_u[0] / errs_u[1])
    assert rate > 1.5, (errs_u, rate)
