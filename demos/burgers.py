"""2D viscous Burgers with implicit Euler + Newton (reference:
demos/burgers/burgers.py.rst)."""
import math

from firedrake_tpu import *

n = 16
mesh = UnitSquareMesh(n, n)
V = VectorFunctionSpace(mesh, "CG", 2)
X = SpatialCoordinate(mesh)

u_ = Function(V, name="u_prev")
u = Function(V, name="u")
v = TestFunction(V)

u_.interpolate(as_vector([sin(math.pi * X[0]), 0.0]))
u.assign(u_)

nu = Constant(0.0001)
timestep = 1.0 / n
F = (inner((u - u_) / timestep, v)
     + inner(dot(u, nabla_grad(u)), v)
     + nu * inner(grad(u), grad(v))) * dx

t, t_end = 0.0, 0.25
energy0 = assemble(inner(u, u) * dx)
while t < t_end - 1e-12:
    solve(F == 0, u, solver_parameters={"snes_rtol": 1e-8,
                                        "ksp_rtol": 1e-10})
    u_.assign(u)
    t += timestep
energy = assemble(inner(u, u) * dx)
print(f"energy {energy0:.6f} -> {energy:.6f}")
assert energy < energy0
