"""Acceptance port of reference
tests/firedrake/regression/test_helmholtz_mixed.py (round-5 directive
8): mixed Helmholtz with RT1/DG0, BDM1/DG0 and BDFM2/DG1, solved
through a Schur fieldsplit, checking convergence of the scalar part."""
import numpy as np
import pytest

from firedrake_tpu import *


def helmholtz_mixed(r, V1, V2, action_form=False):
    mesh = UnitSquareMesh(2**r, 2**r)
    V1 = FunctionSpace(mesh, *V1, name="V")
    V2 = FunctionSpace(mesh, *V2, name="P")
    W = V1 * V2

    lmbda = 1
    u, p = TrialFunctions(W)
    v, q = TestFunctions(W)
    f = Function(V2)

    x = SpatialCoordinate(mesh)
    f.interpolate((1+8*pi*pi)*sin(x[0]*pi*2)*sin(x[1]*pi*2))
    a = (inner(p, q) - inner(div(u), q) + lmbda*inner(u, v)
         + inner(p, div(v))) * dx
    L = inner(f, q) * dx

    sol = Function(W)

    if action_form:
        system = action(a, sol) - L == 0
    else:
        system = a == L

    solve(system, sol,
          solver_parameters={'pc_type': 'fieldsplit',
                             'pc_fieldsplit_type': 'schur',
                             'ksp_type': 'gmres',
                             'ksp_rtol': 1e-10,
                             'fieldsplit_0_ksp_type': 'preonly',
                             'fieldsplit_0_pc_type': 'lu',
                             'fieldsplit_1_ksp_type': 'preonly',
                             'fieldsplit_1_pc_type': 'lu'})

    f.interpolate(sin(x[0]*pi*2)*sin(x[1]*pi*2))
    return sqrt(assemble(inner(sol[2] - f, sol[2] - f) * dx))


@pytest.mark.parametrize(('V1', 'V2', 'threshold', 'action_form'),
                         [(('RT', 1), ('DG', 0), 1.9, False),
                          (('BDM', 1), ('DG', 0), 1.89, False),
                          (('BDM', 1), ('DG', 0), 1.89, True),
                          (('BDFM', 2), ('DG', 1), 1.9, False)])
def test_firedrake_helmholtz(V1, V2, threshold, action_form):
    diff = np.array([helmholtz_mixed(i, V1, V2, action_form)
                     for i in range(3, 6)])
    conv = np.log2(diff[:-1] / diff[1:])
    assert (np.array(conv) > threshold).all()
