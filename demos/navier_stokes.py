"""Steady Navier-Stokes, lid-driven cavity, Taylor-Hood + Newton
(reference: demos/navier_stokes + reynolds-robust H(div) demo family)."""
import numpy as np

from firedrake_tpu import *

N = 12
mesh = UnitSquareMesh(N, N)
V = VectorFunctionSpace(mesh, "CG", 2)
Q = FunctionSpace(mesh, "CG", 1)
W = MixedFunctionSpace([V, Q])

w = Function(W, name="w")
u, p = split(w)
v, q = TestFunctions(W)

Re = Constant(50.0)
nu = 1.0 / Re

F = (inner(dot(u, nabla_grad(u)), v)
     + nu * inner(grad(u), grad(v))
     - p * div(v)
     - q * div(u)) * dx

X = SpatialCoordinate(mesh)
lid = as_vector([1.0 + 0 * X[0], 0.0 * X[1]])
bcs = [DirichletBC(W.sub(0), Function(V).interpolate(lid), 4),
       DirichletBC(W.sub(0), Constant([0.0, 0.0]), (1, 2, 3))]

solve(F == 0, w, bcs=bcs,
      solver_parameters={"snes_rtol": 1e-9, "snes_max_it": 30,
                         "ksp_type": "preonly", "pc_type": "lu",
                         "snes_linesearch_type": "bt"})
uh, ph = w.subfunctions
ud = np.asarray(uh.dat).reshape(-1, 2)
print(f"max |u| = {np.linalg.norm(ud, axis=1).max():.4f}")
# sanity: lid speed dominates; interior recirculation present
assert 0.9 < np.abs(ud[:, 0]).max() < 1.3
assert ud[:, 1].max() > 0.05          # vertical recirculation velocity
assert np.isfinite(np.asarray(w.dat)).all()
# NB ||div u|| is dominated by the lid-corner singularity of the
# discontinuous bc (O(1/h) locally) — check it is bounded, not tiny
div_norm = assemble(div(uh) * div(uh) * dx)
print(f"||div u||^2 = {div_norm:.2e}")
assert div_norm < 10.0
