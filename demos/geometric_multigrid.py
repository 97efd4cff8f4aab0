"""GMG-preconditioned CG (reference: demos/multigrid/geometric_multigrid)."""
import math

from firedrake_tpu import *

hierarchy = MeshHierarchy(UnitSquareMesh(8, 8), 3)
mesh = hierarchy[-1]
V = FunctionSpace(mesh, "CG", 1)
u, v = TrialFunction(V), TestFunction(V)
X = SpatialCoordinate(mesh)
f = Function(V).interpolate(
    2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1]))
bc = DirichletBC(V, 0.0, "on_boundary")
uh = Function(V, name="u")
problem = LinearVariationalProblem(inner(grad(u), grad(v)) * dx,
                                   inner(f, v) * dx, uh, bcs=[bc])
solver = LinearVariationalSolver(
    problem, solver_parameters={"ksp_type": "cg", "pc_type": "mg",
                                "ksp_rtol": 1e-10})
solver.solve()
print(f"iterations: {solver.ksp_iterations}")
assert solver.ksp_iterations < 20
err = errornorm(sin(math.pi * X[0]) * sin(math.pi * X[1]), uh)
print(f"L2 error: {err:.3e}")
