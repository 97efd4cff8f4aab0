"""Poisson with strong bcs (reference: demos/poisson demos +
test_poisson_strong_bcs)."""
import math

from firedrake_tpu import *

mesh = UnitSquareMesh(32, 32)
V = FunctionSpace(mesh, "CG", 2)
u, v = TrialFunction(V), TestFunction(V)
X = SpatialCoordinate(mesh)
f = Function(V).interpolate(
    2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1]))
bc = DirichletBC(V, 0.0, "on_boundary")
uh = Function(V, name="u")
solve(inner(grad(u), grad(v)) * dx == inner(f, v) * dx, uh, bcs=[bc],
      solver_parameters={"ksp_type": "cg", "pc_type": "jacobi",
                         "ksp_rtol": 1e-11})
err = errornorm(sin(math.pi * X[0]) * sin(math.pi * X[1]), uh)
print(f"L2 error: {err:.3e}")
assert err < 1e-3
