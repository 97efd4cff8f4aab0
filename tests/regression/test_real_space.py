"""RealFunctionSpace ("R"): one global dof, constant over the mesh
(reference: firedrake/functionspaceimpl.py:1175 RealFunctionSpace,
tests/firedrake/regression/test_real_space.py)."""
import math

import numpy as np

from firedrake_tpu import (FunctionSpace, MixedFunctionSpace, Function,
                           TestFunction, TrialFunction, TestFunctions,
                           TrialFunctions, SpatialCoordinate,
                           UnitSquareMesh, inner, grad, dx, solve, cos,
                           assemble, errornorm)


def test_real_space_basics():
    mesh = UnitSquareMesh(4, 4)
    R = FunctionSpace(mesh, "R", 0)
    assert R.dim == 1
    c = Function(R)
    c.dat = np.array([3.0])
    # integral of the global constant over the unit square
    assert abs(assemble(c * dx) - 3.0) < 1e-12
    # mass "matrix" is the domain volume
    u, v = TrialFunction(R), TestFunction(R)
    M = assemble(inner(u, v) * dx)
    assert abs(M.to_scipy().toarray()[0, 0] - 1.0) < 1e-12


def test_pure_neumann_poisson_with_multiplier():
    """-lap(u) = f, du/dn = 0, mean pinned by a Real multiplier."""
    mesh = UnitSquareMesh(16, 16)
    V = FunctionSpace(mesh, "CG", 1)
    R = FunctionSpace(mesh, "R", 0)
    W = MixedFunctionSpace([V, R])
    u, r = TrialFunctions(W)
    v, s = TestFunctions(W)
    X = SpatialCoordinate(mesh)
    f = 2 * math.pi ** 2 * cos(math.pi * X[0]) * cos(math.pi * X[1])
    a = (inner(grad(u), grad(v)) + r * v + u * s) * dx
    L = inner(f, v) * dx
    w = Function(W)
    solve(a == L, w,
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    uh = w.subfunctions[0]
    uex = cos(math.pi * X[0]) * cos(math.pi * X[1])
    assert errornorm(uex, uh) < 0.01
    assert abs(float(w.subfunctions[1].dat[0])) < 1e-10
    assert abs(assemble(uh * dx)) < 1e-12
