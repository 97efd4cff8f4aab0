"""Linear shallow water on an extruded mesh, Strang splitting
(reference: demos/extruded_shallow_water/extruded_shallow_water.py.rst).

Velocity in the H(div) tensor-product space HDiv(BDM1(tri) x
DG0(interval)) over a prism mesh; pressure in DG0 x DG0.  Strang
half-step velocity / full-step pressure / half-step velocity updates;
the energy E = 0.5 int (|u|^2 + p^2) dx is conserved to the splitting
order.
"""
import numpy as np

from firedrake_tpu import *

power = 3          # 2^5 in the reference; scaled for a test run
m = UnitSquareMesh(2 ** power, 2 ** power)
layers = 3
mesh = ExtrudedMesh(m, layers, layer_height=1.0 / layers)

horiz = FiniteElement("BDM", "triangle", 1)
vert = FiniteElement("DG", "interval", 0)
prod = HDiv(TensorProductElement(horiz, vert))
W = FunctionSpace(mesh, prod)
X = FunctionSpace(mesh, "DG", 0, vfamily="DG", vdegree=0)
Xplot = FunctionSpace(mesh, "CG", 1, vfamily="Lagrange", vdegree=1)

u_0 = Function(W)
u_h = Function(W)
u_1 = Function(W)
p_0 = Function(X)
p_1 = Function(X)
p_plot = Function(Xplot)
x, y, z = SpatialCoordinate(mesh)
p_0.interpolate(sin(4 * np.pi * x) * sin(2 * np.pi * y))

T = 0.25
dt = 0.0125
t = 0.0
sp = {"ksp_type": "cg", "ksp_rtol": 1e-11}

E0 = assemble(0.5 * (dot(u_0, u_0) + p_0 * p_0) * dx)

while t < T - 1e-12:
    u = TrialFunction(W)
    w = TestFunction(W)
    a_1 = dot(w, u) * dx
    L_1 = dot(w, u_0) * dx + 0.5 * dt * div(w) * p_0 * dx
    solve(a_1 == L_1, u_h, solver_parameters=sp)

    p = TrialFunction(X)
    phi = TestFunction(X)
    a_2 = phi * p * dx
    L_2 = phi * p_0 * dx - dt * phi * div(u_h) * dx
    solve(a_2 == L_2, p_1, solver_parameters=sp)

    u = TrialFunction(W)
    w = TestFunction(W)
    a_3 = dot(w, u) * dx
    L_3 = dot(w, u_h) * dx + 0.5 * dt * div(w) * p_1 * dx
    solve(a_3 == L_3, u_1, solver_parameters=sp)

    u_0.assign(u_1)
    p_0.assign(p_1)
    t += dt

# project into P1 x P1 for plotting
p_trial = TrialFunction(Xplot)
p_test = TestFunction(Xplot)
solve(p_trial * p_test * dx == p_0 * p_test * dx, p_plot,
      solver_parameters=sp)

E1 = assemble(0.5 * (dot(u_0, u_0) + p_0 * p_0) * dx)
drift = abs(E1 - E0) / E0
print(f"energy: {E0:.6f} -> {E1:.6f} (drift {drift:.2e})")
# Strang splitting of the linear system is nearly energy-conserving
assert drift < 0.02, drift
assert np.isfinite(np.asarray(p_plot.dat)).all()
