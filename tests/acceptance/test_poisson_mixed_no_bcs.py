"""Acceptance port of reference
tests/firedrake/regression/test_poisson_mixed_no_bcs.py (round-5
directive 8): mixed Poisson (BDM1/DG0 on triangles, RTCF1/DG0 on
quadrilaterals) with no strong BCs, second-order convergence."""
import pytest
import numpy as np

from firedrake_tpu import *


def poisson_mixed(size, parameters={}, quadrilateral=False):
    mesh = UnitSquareMesh(2 ** size, 2 ** size, quadrilateral=quadrilateral)
    x = SpatialCoordinate(mesh)

    if quadrilateral:
        BDM = FunctionSpace(mesh, "RTCF", 1)
    else:
        BDM = FunctionSpace(mesh, "BDM", 1)
    DG = FunctionSpace(mesh, "DG", 0)
    W = BDM * DG

    sigma, u = TrialFunctions(W)
    tau, v = TestFunctions(W)

    f = Function(DG).interpolate(-2*(x[0]-1)*x[0] - 2*(x[1]-1)*x[1])

    a = (inner(sigma, tau) + inner(u, div(tau)) + inner(div(sigma), v))*dx
    L = - inner(f, v)*dx

    w = Function(W)
    solve(a == L, w, solver_parameters=parameters)
    sigma, u = w.subfunctions

    f.interpolate(x[0]*(1-x[0])*x[1]*(1-x[1]))
    return sqrt(assemble(dot(u - f, u - f) * dx)), u, f


@pytest.mark.parametrize('parameters',
                         [{}, {'pc_type': 'fieldsplit',
                               'pc_fieldsplit_type': 'schur',
                               'ksp_type': 'gmres',
                               'ksp_rtol': 1e-10,
                               'fieldsplit_0_ksp_type': 'preonly',
                               'fieldsplit_0_pc_type': 'lu',
                               'fieldsplit_1_ksp_type': 'preonly',
                               'fieldsplit_1_pc_type': 'lu'}])
def test_poisson_mixed(parameters):
    """Second-order convergence of the mixed poisson formulation."""
    diff = np.array([poisson_mixed(i, parameters)[0] for i in range(3, 6)])
    conv = np.log2(diff[:-1] / diff[1:])
    assert (np.array(conv) > 1.9).all()


@pytest.mark.parametrize(('testcase', 'convrate'),
                         [((3, 6), 1.9)])
def test_hdiv_convergence(testcase, convrate):
    """Second-order convergence on quadrilaterals with RTCF."""
    start, end = testcase
    l2err = np.zeros(end - start)
    for ii in [i + start for i in range(len(l2err))]:
        l2err[ii - start] = poisson_mixed(ii, quadrilateral=True)[0]
    assert (np.log2(l2err[:-1] / l2err[1:]) > convrate).all()
