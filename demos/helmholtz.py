"""Helmholtz demo (reference: demos/helmholtz/helmholtz.py.rst).

Solves  -Δu + u = f  on the unit square with homogeneous Neumann bcs,
f chosen so u = cos(2πx)cos(2πy) exactly.
"""
import math

from firedrake_tpu import *

mesh = UnitSquareMesh(64, 64)
V = FunctionSpace(mesh, "CG", 1)

u = TrialFunction(V)
v = TestFunction(V)
x, y = SpatialCoordinate(mesh)[0], SpatialCoordinate(mesh)[1]
f = Function(V)
f.interpolate((1 + 8 * math.pi ** 2) * cos(2 * math.pi * x)
              * cos(2 * math.pi * y))

a = (inner(grad(u), grad(v)) + inner(u, v)) * dx
L = inner(f, v) * dx

uh = Function(V, name="u")
solve(a == L, uh, solver_parameters={"ksp_type": "cg",
                                     "pc_type": "jacobi",
                                     "ksp_rtol": 1e-10})

err = errornorm(cos(2 * math.pi * x) * cos(2 * math.pi * y), uh)
print(f"L2 error: {err:.3e}")
assert err < 0.003

if __name__ == "__main__":
    VTKFile("/tmp/helmholtz_out/helmholtz.pvd").write(uh)
