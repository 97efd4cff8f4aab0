"""Hybridized mixed Poisson: static condensation onto facet trace
multipliers (reference: firedrake 'Hybridizing mixed methods' demo /
HybridizationPC).  The per-cell condensation and back-substitution run
as batched dense algebra on device; only the small trace system is
solved globally."""
import math

import numpy as np

from firedrake_tpu import *

mesh = UnitSquareMesh(16, 16)
S = FunctionSpace(mesh, "RT", 2)
V = FunctionSpace(mesh, "DG", 1)
W = MixedFunctionSpace([S, V])
sigma, u = TrialFunctions(W)
tau, v = TestFunctions(W)
X = SpatialCoordinate(mesh)
f = Function(V).interpolate(
    2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1]))
a = (dot(sigma, tau) - u * div(tau) - div(sigma) * v) * dx
L = -inner(f, v) * dx
w = Function(W)
solve(a == L, w, solver_parameters={
    "ksp_type": "preonly",
    "pc_type": "hybridization",
    "hybridization": {"ksp_type": "preonly"}})
sigma_h, u_h = w.subfunctions
err = errornorm(sin(math.pi * X[0]) * sin(math.pi * X[1]), u_h)
print(f"L2 error (hybridized RT2xDG1): {err:.3e}")
assert err < 5e-3
