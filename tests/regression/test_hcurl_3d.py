"""N1curl on tetrahedra (Whitney edge element) + dual-evaluation
interpolation into moment spaces (reference: FIAT Nedelec +
tests/firedrake/regression curl tests; TSFC dual evaluation for
interpolation into Piola-mapped spaces)."""
import numpy as np
import pytest

from firedrake_tpu import (FunctionSpace, Function, SpatialCoordinate,
                           UnitCubeMesh, UnitSquareMesh, as_vector, dot,
                           curl, dx, errornorm, solve, project,
                           TrialFunction, TestFunction, sin, cos)
from math import pi


def _whitney_field(mesh):
    """a + c x X lies exactly in lowest-order Nedelec space."""
    x, y, z = SpatialCoordinate(mesh)
    return as_vector([1.0 + z - 2 * y, 2.0 + 2 * x - 3 * z,
                      3.0 + 3 * y - x])


def test_whitney_exact_projection():
    mesh = UnitCubeMesh(3, 3, 3)
    V = FunctionSpace(mesh, "N1curl", 1)
    f = _whitney_field(mesh)
    u = project(f, V)
    assert errornorm(f, u, "L2") < 1e-10


def test_whitney_exact_interpolation():
    mesh = UnitCubeMesh(3, 3, 3)
    V = FunctionSpace(mesh, "N1curl", 1)
    f = _whitney_field(mesh)
    u = Function(V).interpolate(f)
    assert errornorm(f, u, "L2") < 1e-10


def test_whitney_pointeval():
    mesh = UnitCubeMesh(3, 3, 3)
    V = FunctionSpace(mesh, "N1curl", 1)
    u = Function(V).interpolate(_whitney_field(mesh))
    pts = np.random.default_rng(0).random((5, 3))
    vals = np.array([u.at(p) for p in pts])
    ex = np.array([[1 + p[2] - 2 * p[1], 2 + 2 * p[0] - 3 * p[2],
                    3 + 3 * p[1] - p[0]] for p in pts])
    assert np.abs(vals - ex).max() < 1e-10


def test_curl_curl_convergence():
    """(curl u, curl v) + (u, v) = (f, v) with a GRADIENT exact solution
    ue = grad(phi) (curl ue = 0, so ue solves the strong problem with
    the natural BC n x curl u = 0 automatically): N1curl_1 converges at
    O(h) in L2."""
    errs = []
    for n in (4, 8, 16):
        mesh = UnitCubeMesh(n, n, n)
        V = FunctionSpace(mesh, "N1curl", 1)
        x, y, z = SpatialCoordinate(mesh)
        # phi = sin(pi x) sin(pi y) sin(pi z); ue = grad phi
        ue = as_vector([pi * cos(pi * x) * sin(pi * y) * sin(pi * z),
                        pi * sin(pi * x) * cos(pi * y) * sin(pi * z),
                        pi * sin(pi * x) * sin(pi * y) * cos(pi * z)])
        u, v = TrialFunction(V), TestFunction(V)
        a = (dot(curl(u), curl(v)) + dot(u, v)) * dx
        L = dot(ue, v) * dx
        w = Function(V)
        solve(a == L, w, solver_parameters={"ksp_type": "cg",
                                            "pc_type": "jacobi",
                                            "ksp_rtol": 1e-12,
                                            "ksp_max_it": 5000})
        errs.append(errornorm(ue, w, "L2"))
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    assert rates[-1] > 0.85, (errs, rates)


@pytest.mark.parametrize("fam,deg,dim", [
    ("RT", 1, 2), ("RT", 2, 2), ("BDM", 1, 2), ("N1curl", 1, 2),
    ("RT", 1, 3), ("RT", 2, 3), ("BDM", 1, 3), ("BDM", 2, 3)])
def test_moment_interpolation_exact(fam, deg, dim):
    """Dual-evaluation interpolation reproduces in-span fields exactly."""
    if dim == 2:
        mesh = UnitSquareMesh(3, 3)
        x, y = SpatialCoordinate(mesh)
        if (fam, deg) == ("RT", 1):
            f = as_vector([1.0 + 0.5 * x, 2.0 + 0.5 * y])
        elif (fam, deg) == ("N1curl", 1):
            # lowest-order Nedelec span: a + c * rot(x)
            f = as_vector([1.0 - 2 * y, 2.0 + 2 * x])
        else:
            f = as_vector([1.0 + y - 0.3 * x, 2.0 - x + 0.1 * y])
    else:
        mesh = UnitCubeMesh(2, 2, 2)
        x, y, z = SpatialCoordinate(mesh)
        if (fam, deg) == ("RT", 1):
            f = as_vector([1 + 2 * x, 3 + 2 * y, -1 + 2 * z])
        else:
            f = as_vector([1.0 + z - 2 * y, 2.0 + 2 * x - 3 * z,
                           3.0 + 3 * y - x])
    V = FunctionSpace(mesh, fam, deg)
    u = Function(V).interpolate(f)
    assert errornorm(f, u, "L2") < 1e-10
