"""Adaptive Poisson: residual-driven NVB refinement loop (reference:
netgen adaptivity demo in the firedrake docs)."""
import math

import numpy as np

from firedrake_tpu import *

mesh = UnitSquareMesh(8, 8)
errs = []
for cycle in range(3):
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    uex = sin(math.pi * X[0]) * sin(math.pi * X[1])
    f = 2 * math.pi ** 2 * uex
    uh = Function(V)
    solve(inner(grad(u), grad(v)) * dx == f * v * dx, uh,
          bcs=[DirichletBC(V, 0.0, "on_boundary")])
    errs.append(errornorm(uex, uh))
    print(f"cycle {cycle}: dofs {V.dim:5d}  L2 error {errs[-1]:.3e}")
    # simple indicator: h^2 * ||f||_cell
    cents = mesh._vertex_coords[mesh.topology.cell_vertices].mean(axis=1)
    fc = 2 * math.pi ** 2 * np.sin(math.pi * cents[:, 0]) \
        * np.sin(math.pi * cents[:, 1])
    eta = mesh.cell_volumes ** 1.5 * np.abs(fc)
    mesh = adapt(mesh, eta, refine_fraction=0.5)
assert errs[-1] < errs[0]
