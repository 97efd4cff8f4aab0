"""Acceptance port of reference
tests/firedrake/regression/test_upwind_flux.py (round-5 directive 8):
on the sphere, find a BDM/RTCF flux F whose normal moments match the
upwind flux, and check div F reproduces the upwind DG0 divergence."""
import pytest

from firedrake_tpu import *


def run_test(quadrilateral):
    if quadrilateral:
        mesh = UnitCubedSphereMesh(refinement_level=2)
        RT_elt = FiniteElement("RTCF", "quadrilateral", 1)
    else:
        mesh = UnitIcosahedralSphereMesh(refinement_level=2)
        RT_elt = FiniteElement("RT", "triangle", 1)

    x = SpatialCoordinate(mesh)

    r = sqrt(x[0]*x[0] + x[1]*x[1] + x[2]*x[2])
    global_normal = as_vector((x[0]/r, x[1]/r, x[2]/r))
    mesh.init_cell_orientations(global_normal)

    V_dg = FunctionSpace(mesh, "DG", 0)
    M = FunctionSpace(mesh, RT_elt)

    u0 = as_vector((-x[1], x[0], 0))
    u = Function(M).project(u0)

    n = FacetNormal(mesh)

    un = 0.5*(dot(u, n) + abs(dot(u, n)))

    phi = TestFunction(V_dg)
    D = TrialFunction(V_dg)
    a_mass = inner(D, phi) * dx
    a_int = inner(-u*D, grad(phi)) * dx
    a_flux = inner(un('+')*D('+') - un('-')*D('-'), jump(phi)) * dS

    arhs = (a_int + a_flux)

    D1 = Function(V_dg)

    D0 = exp(-pow(x[2], 2) - pow(x[1], 2))
    D = Function(V_dg).interpolate(D0)

    D1problem = LinearVariationalProblem(a_mass, action(arhs, D), D1)
    D1solver = LinearVariationalSolver(D1problem)
    D1solver.solve()

    # Surface flux equation
    V1 = FunctionSpace(mesh, RT_elt)
    w = TestFunction(V1)
    Ft = TrialFunction(V1)
    Fs = Function(V1)

    aFs = (inner(n('+'), w('+')) * inner(Ft('+'), n('+'))
           + inner(n('-'), w('-')) * inner(Ft('-'), n('-'))) * dS
    LFs = 2.0*(inner(n('+'), w('+')) * un('+') * D('+')
               + inner(n('-'), w('-')) * un('-') * D('-')) * dS

    Fsproblem = LinearVariationalProblem(aFs, LFs, Fs)
    Fssolver = LinearVariationalSolver(
        Fsproblem, solver_parameters={'ksp_type': 'gmres'})
    Fssolver.solve()

    divFs = Function(V_dg)

    solve(a_mass == inner(div(Fs), phi) * dx, divFs)

    assert errornorm(divFs, D1, degree_rise=0) < 1e-12


def test_upwind_flux_icosahedral_sphere():
    run_test(quadrilateral=False)


def test_upwind_flux_cubed_sphere():
    run_test(quadrilateral=True)
