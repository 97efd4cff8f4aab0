"""Mixed Poisson with RT1 x DG0 (reference: demos/poisson_mixed)."""
import math

from firedrake_tpu import *

mesh = UnitSquareMesh(16, 16)
S = FunctionSpace(mesh, "RT", 1)
V = FunctionSpace(mesh, "DG", 0)
W = MixedFunctionSpace([S, V])
sigma, u = TrialFunctions(W)
tau, v = TestFunctions(W)
X = SpatialCoordinate(mesh)
f = Function(V).interpolate(
    2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1]))
a = (dot(sigma, tau) + div(tau) * u + div(sigma) * v) * dx
L = -inner(f, v) * dx
w = Function(W)
solve(a == L, w, solver_parameters={"ksp_type": "preonly",
                                    "pc_type": "lu"})
sigma_h, u_h = w.subfunctions
err = errornorm(sin(math.pi * X[0]) * sin(math.pi * X[1]), u_h)
print(f"L2 error: {err:.3e}")
assert err < 0.05
