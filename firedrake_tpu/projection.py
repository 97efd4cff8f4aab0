"""L2 projection via mass solve (reference: firedrake/projection.py:55)."""
from __future__ import annotations

from .language import TestFunction, TrialFunction, inner, dx
from .function import Function
from .solving import LinearVariationalProblem, LinearVariationalSolver


def project(expr, V, bcs=None, solver_parameters=None, name=None):
    if isinstance(V, Function):
        f = V
        V = f.function_space()
    else:
        f = Function(V, name=name)
    u = TrialFunction(V)
    v = TestFunction(V)
    a = inner(u, v) * dx
    L = inner(expr, v) * dx
    sp = solver_parameters or {"ksp_type": "cg", "pc_type": "jacobi",
                               "ksp_rtol": 1e-12}
    problem = LinearVariationalProblem(a, L, f, bcs=bcs)
    LinearVariationalSolver(problem, solver_parameters=sp).solve()
    return f


class Projector:
    """Reusable projector (reference: projection.py ProjectorBase)."""

    def __init__(self, expr, V, bcs=None, solver_parameters=None):
        self.expr = expr
        if isinstance(V, Function):
            self.f = V
        else:
            self.f = Function(V)
        V = self.f.function_space()
        u, v = TrialFunction(V), TestFunction(V)
        self.problem = LinearVariationalProblem(
            inner(u, v) * dx, inner(expr, v) * dx, self.f, bcs=bcs)
        self.solver = LinearVariationalSolver(
            self.problem,
            solver_parameters=solver_parameters or
            {"ksp_type": "cg", "pc_type": "jacobi", "ksp_rtol": 1e-12})

    def project(self):
        self.solver.solve()
        return self.f
