"""Upwind DG advection with SSPRK3 (reference: demos/DG_advection)."""
import math

import numpy as np

from firedrake_tpu import *

nx = 16
mesh = UnitSquareMesh(nx, nx)
V = FunctionSpace(mesh, "DG", 1)
X = SpatialCoordinate(mesh)
vel = as_vector([1.0 + 0 * X[0], 0.0 * X[1]])

q = Function(V, name="q").interpolate(
    conditional(ge(X[0], 0.2), 1.0, 0.0)
    * conditional(ge(0.4, X[0]), 1.0, 0.0))
n = FacetNormal(mesh)
un = 0.5 * (dot(vel, n) + abs(dot(vel, n)))
p = TestFunction(V)
qt = TrialFunction(V)
a = inner(qt, p) * dx
dtc = 0.2 / nx
L = dtc * (inner(q * vel, grad(p)) * dx
           - inner(jump(p), jump(un * q)) * dS
           - inner(p, un * q) * ds)
dq = Function(V)
sp = {"ksp_type": "cg", "pc_type": "jacobi", "ksp_rtol": 1e-11}
qs = Function(V)
limiter = VertexBasedLimiter(V)
mass0 = assemble(q * dx)
for step in range(2):
    qs.dat = np.asarray(q.dat).copy()
    solve(a == L, dq, solver_parameters=sp)
    q.dat = np.asarray(q.dat) + np.asarray(dq.dat)
    limiter.apply(q)
    solve(a == L, dq, solver_parameters=sp)
    q.dat = 0.75 * np.asarray(qs.dat) + 0.25 * (np.asarray(q.dat)
                                                + np.asarray(dq.dat))
    limiter.apply(q)
    solve(a == L, dq, solver_parameters=sp)
    q.dat = (np.asarray(qs.dat)
             + 2.0 * (np.asarray(q.dat) + np.asarray(dq.dat))) / 3.0
    limiter.apply(q)
mass = assemble(q * dx)
print(f"mass {mass0:.6f} -> {mass:.6f}")
assert abs(mass - mass0) < 1e-10
assert np.asarray(q.dat).max() < 1.0 + 1e-8
