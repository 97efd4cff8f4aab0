"""3D structured-grid line smoothing (ASMGridLinePC) inside GMG — the
stronger 3D smoother story from the round-3 known-gaps list (reference
role: PCPATCH/ASM line smoothers, firedrake/preconditioners/asm.py).
"""
import numpy as np

from firedrake_tpu import (Function, FunctionSpace, MeshHierarchy,
                           SpatialCoordinate, TestFunction,
                           TrialFunction, UnitCubeMesh, DirichletBC,
                           dx, grad, inner, sin, solve)


def test_gridline_smoother_converges_and_beats_jacobi():
    from firedrake_tpu.solving import (LinearVariationalProblem,
                                       LinearVariationalSolver)
    import math
    its = {}
    for pc in ("jacobi", "gridline"):
        counts = []
        for levels in (1, 2):
            hier = MeshHierarchy(UnitCubeMesh(4, 4, 4), levels)
            mesh = hier.meshes[-1]
            V = FunctionSpace(mesh, "CG", 1)
            u, v = TrialFunction(V), TestFunction(V)
            X = SpatialCoordinate(mesh)
            f = (3 * math.pi ** 2 * sin(math.pi * X[0])
                 * sin(math.pi * X[1]) * sin(math.pi * X[2]))
            bc = DirichletBC(V, 0.0, "on_boundary")
            uh = Function(V)
            prob = LinearVariationalProblem(
                inner(grad(u), grad(v)) * dx, f * v * dx, uh, bcs=[bc])
            s = LinearVariationalSolver(prob, solver_parameters={
                "ksp_type": "cg", "ksp_rtol": 1e-8, "pc_type": "mg",
                "mg_levels_ksp_type": "chebyshev",
                "mg_levels_ksp_max_it": 2,
                "mg_levels_pc_type": pc})
            s.solve()
            counts.append(s.ksp_iterations)
            r = np.asarray(uh.dat)
            assert np.isfinite(r).all()
        its[pc] = counts
    # line smoothing should not iterate more than point Jacobi, and
    # should stay (near-)level-independent
    assert its["gridline"][-1] <= its["jacobi"][-1], its
    assert its["gridline"][1] <= its["gridline"][0] + 2, its


def test_gridline_axis_subset():
    """Single-axis lines (classic z-line relaxation) also compose."""
    import math
    mesh = MeshHierarchy(UnitCubeMesh(4, 4, 4), 1).meshes[-1]
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = (3 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1])
         * sin(math.pi * X[2]))
    bc = DirichletBC(V, 0.0, "on_boundary")
    uh = Function(V)
    solve(inner(grad(u), grad(v)) * dx == f * v * dx, uh, bcs=bc,
          solver_parameters={
              "ksp_type": "cg", "ksp_rtol": 1e-8, "pc_type": "mg",
              "mg_levels_pc_type": "gridline",
              "mg_levels_pc_gridline_axes": "2"})
    from firedrake_tpu import errornorm
    err = errornorm(sin(math.pi * X[0]) * sin(math.pi * X[1])
                    * sin(math.pi * X[2]), uh)
    assert err < 0.05
