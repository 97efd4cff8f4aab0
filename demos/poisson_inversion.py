"""PDE-constrained source inversion (reference: firedrake adjoint demos):
recover the Poisson source from a noisy field observation by gradient
descent on a ReducedFunctional — every gradient is one symbolic
adjoint-PDE solve running on device like the primal."""
import math

import numpy as np

from firedrake_tpu import *
from firedrake_tpu.adjoint import (continue_annotation, pause_annotation,
                                   get_working_tape, ReducedFunctional,
                                   Control)

mesh = UnitSquareMesh(12, 12)
V = FunctionSpace(mesh, "CG", 1)
X = SpatialCoordinate(mesh)
bcs = [DirichletBC(V, 0.0, "on_boundary")]

# synthetic truth + observation
f_true = Function(V).interpolate(
    sin(math.pi * X[0]) * sin(2 * math.pi * X[1]))
u, v = TrialFunction(V), TestFunction(V)


def forward(f):
    w = Function(V)
    solve(inner(grad(u), grad(v)) * dx == f * v * dx, w, bcs=bcs)
    return w


u_obs = forward(f_true)

# inversion: minimize 1/2 ||u(f) - u_obs||^2 + alpha/2 ||f||^2
alpha = 1e-6
f = Function(V)          # initial guess: zero
step = 300.0
errs = []
for it in range(10):
    tape = get_working_tape()
    tape.clear_tape()
    continue_annotation()
    w = forward(f)
    J = assemble(0.5 * (w - u_obs) ** 2 * dx + 0.5 * alpha * f ** 2 * dx)
    rf = ReducedFunctional(J, Control(f))
    pause_annotation()
    g = rf.derivative().riesz_representation("L2")   # L2 gradient
    f.dat = np.asarray(f.dat) - step * np.asarray(g.dat)
    errs.append(errornorm(f_true, f))
    print(f"it {it}: J {float(J):.3e}  ||f - f_true|| {errs[-1]:.3e}")

assert errs[-1] < 0.5 * errs[0], errs
print("source inversion converging")
