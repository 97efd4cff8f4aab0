"""Acceptance port of reference
tests/firedrake/regression/test_vertex_based_limiter.py (round-5
directive 8): the Kuzmin vertex-based slope limiter preserves constant
fields, bounds step functions, and keeps an advected step in [0, 1]
through an SSPRK3 loop.  Quad meshes use DG1-on-quad; the parallel
variant is covered by tests/parallel."""
import pytest
import numpy as np

from firedrake_tpu import *


@pytest.fixture(params=["periodic-interval", "periodic-square-tri"])
def mesh(request):
    if request.param == "periodic-interval":
        return PeriodicUnitIntervalMesh(30)
    elif request.param == "periodic-square-tri":
        return PeriodicUnitSquareMesh(30, 30)


def space(m):
    element = BrokenElement(
        m.coordinates.function_space().ufl_element().sub_elements[0])
    return FunctionSpace(m, element)


def test_constant_field(mesh):
    v = space(mesh)

    limiter = VertexBasedLimiter(v)

    u0 = Constant(1)
    u = Function(v).interpolate(u0)
    u_old = Function(v).interpolate(u0)

    limiter.apply(u)
    diff = assemble(inner(u - u_old, u - u_old) * dx) ** 0.5
    assert diff < 1.0e-10, "Failed on Constant function"


def test_step_function_bounds(mesh):
    x = SpatialCoordinate(mesh)

    v = space(mesh)

    limiter = VertexBasedLimiter(v)

    u0 = conditional(real(x[0]) < 0.5, 1., 0.)
    u = Function(v).interpolate(u0)
    limiter.apply(u)

    assert np.max(np.asarray(u.dat)) <= 1.0 + 1e-12, "exceeded max"
    assert np.min(np.asarray(u.dat)) >= 0.0 - 1e-12, "exceeded min"


def test_step_function_loop(mesh, iterations=100):
    v = space(mesh)
    m = VectorFunctionSpace(mesh, "CG", 1)

    # advecting velocity
    if m.shape == (1, ):
        u0 = as_vector([1])
    else:
        u0 = as_vector([1, 0])
    u = Function(m).interpolate(u0)

    dt = 1. / iterations
    phi = TestFunction(v)
    D = TrialFunction(v)
    n = FacetNormal(mesh)
    un = 0.5 * (dot(u, n) + abs(dot(u, n)))  # upwind value

    a_mass = inner(D, phi) * dx
    a_int = inner(-u * D, grad(phi)) * dx
    a_flux = inner(un('+') * D('+') - un('-') * D('-'), jump(phi)) * dS
    arhs = a_mass - dt * (a_int + a_flux)

    dD1 = Function(v)
    D1 = Function(v)
    x = SpatialCoordinate(mesh)

    D0 = conditional(real(x[0]) < 0.5, 1., 0.)

    D = Function(v).interpolate(D0)
    D1.assign(D)

    t = 0.0
    # full period (reference: T = iterations*dt): the bound is asserted
    # once the profile has advected all the way around — mid-evolution
    # the unlimited final-stage dD1 transiently exceeds it by ~2% (the
    # scheme the reference runs does too; it just never asserts there)
    T = iterations * dt
    problem = LinearVariationalProblem(a_mass, action(arhs, D1), dD1)
    solver = LinearVariationalSolver(problem,
                                     solver_parameters={'ksp_type': 'cg'})

    limiter = VertexBasedLimiter(v)
    limiter.apply(D)

    while t < (T - dt / 2):
        D1.assign(D)
        limiter.apply(D1)
        solver.solve()
        D1.assign(dD1)
        limiter.apply(D1)

        solver.solve()
        D1.assign(0.75 * D + 0.25 * dD1)
        limiter.apply(D1)
        solver.solve()
        D.assign((1.0 / 3.0) * D + (2.0 / 3.0) * dD1)
        limiter.apply(D1)

        t += dt

    assert np.max(np.asarray(D.dat)) <= 1.0 + 1e-10, "exceeded max"
    assert np.min(np.asarray(D.dat)) >= 0.0 - 1e-10, "exceeded min"
