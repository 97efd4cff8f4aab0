"""Pointwise external operators: JAX functions inside forms (reference:
firedrake/external_operators point_expr / ML operators).  Evaluation is
a traceable call inside the quadrature kernel; linearization via
jax.jvp, so Newton and adjoint work unchanged."""
import math

import numpy as np
import jax.numpy as jnp

from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           SpatialCoordinate, UnitSquareMesh,
                           DirichletBC, inner, grad, dx, solve, sin,
                           tanh, assemble, point_expr)


def test_newton_with_external_reaction():
    """-lap u + N(u) = f with N = jax tanh matches the builtin tanh."""
    mesh = UnitSquareMesh(8, 8)
    V = FunctionSpace(mesh, "CG", 2)
    v = TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = 2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1])
    N = point_expr(jnp.tanh, name="tanhN")
    sols = []
    for react in (N, tanh):
        u = Function(V)
        F = (inner(grad(u), grad(v)) + react(u) * v - f * v) * dx
        solve(F == 0, u, bcs=[DirichletBC(V, 0.0, "on_boundary")])
        sols.append(np.asarray(u.dat))
    assert np.abs(sols[0] - sols[1]).max() < 1e-12


def test_multi_operand_external():
    mesh = UnitSquareMesh(6, 6)
    V = FunctionSpace(mesh, "CG", 2)
    X = SpatialCoordinate(mesh)
    w = Function(V).interpolate(X[0] ** 2 + X[1])
    M = point_expr(lambda a, b: a * b + jnp.sin(b))
    assert abs(assemble(M(w, w) * dx)
               - assemble((w * w + sin(w)) * dx)) < 1e-14


def test_external_operator_adjoint():
    from firedrake_tpu.adjoint import (continue_annotation,
                                       pause_annotation,
                                       ReducedFunctional, Control,
                                       taylor_test)
    mesh = UnitSquareMesh(6, 6)
    V = FunctionSpace(mesh, "CG", 1)
    v = TestFunction(V)
    X = SpatialCoordinate(mesh)
    N = point_expr(jnp.tanh)
    continue_annotation()
    c = Function(V).interpolate(1.0 + 0 * X[0])
    u = Function(V)
    F = (inner(grad(u), grad(v)) + N(u) * v - c * v) * dx
    solve(F == 0, u, bcs=[DirichletBC(V, 0.0, "on_boundary")])
    J = assemble(u * u * dx)
    rf = ReducedFunctional(J, Control(c))
    pause_annotation()
    rate = taylor_test(rf, c, Function(V).interpolate(0.1 + 0 * X[0]))
    assert rate > 1.9
