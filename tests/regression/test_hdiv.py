"""H(div) elements and mixed Poisson (reference: demos/poisson_mixed +
tests/firedrake/regression/test_mixed_poisson*.py)."""
import math

import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, MixedFunctionSpace, Function,
                           TestFunctions, TrialFunctions, SpatialCoordinate,
                           UnitSquareMesh, UnitTriangleMesh, inner, dot,
                           div, dx, solve, errornorm, as_vector, project,
                           sin, cos)


@pytest.mark.parametrize("family", ["RT", "BDM"])
def test_project_representable_fields(family):
    mesh = UnitSquareMesh(3, 3)
    S = FunctionSpace(mesh, family, 1)
    X = SpatialCoordinate(mesh)
    const = as_vector([1.0 + 0 * X[0], 2.0 + 0 * X[1]])
    g = project(const, S, solver_parameters={"ksp_type": "preonly",
                                             "pc_type": "lu"})
    assert errornorm(const, g) < 1e-12
    # RT1 contains x*P0; BDM1 contains all of (P1)^2
    lin = as_vector([X[0], X[1]])
    g2 = project(lin, S, solver_parameters={"ksp_type": "preonly",
                                            "pc_type": "lu"})
    assert errornorm(lin, g2) < 1e-12


def test_hdiv_normal_continuity():
    """div of a projected smooth field must not blow up — normal
    components match across facets (sign bugs break this badly)."""
    mesh = UnitSquareMesh(4, 4)
    S = FunctionSpace(mesh, "RT", 1)
    X = SpatialCoordinate(mesh)
    field = as_vector([sin(X[1]), cos(X[0])])
    g = project(field, S, solver_parameters={"ksp_type": "preonly",
                                             "pc_type": "lu"})
    divnorm = fd.assemble(div(g) * div(g) * dx)
    assert divnorm < 10.0


@pytest.mark.parametrize("family,order", [("RT", 0.9), ("BDM", 0.9)])
def test_mixed_poisson_convergence(family, order):
    errs_u, errs_s = [], []
    for n in [4, 8, 16]:
        mesh = UnitSquareMesh(n, n)
        S = FunctionSpace(mesh, family, 1)
        V = FunctionSpace(mesh, "DG", 0)
        W = MixedFunctionSpace([S, V])
        sigma, u = TrialFunctions(W)
        tau, v = TestFunctions(W)
        X = SpatialCoordinate(mesh)
        f = Function(V).interpolate(
            2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1]))
        a = (dot(sigma, tau) + div(tau) * u + div(sigma) * v) * dx
        L = -inner(f, v) * dx
        w = Function(W)
        solve(a == L, w, solver_parameters={"ksp_type": "preonly",
                                            "pc_type": "lu"})
        sh, uh = w.subfunctions
        ex = sin(math.pi * X[0]) * sin(math.pi * X[1])
        errs_u.append(errornorm(ex, uh))
        errs_s.append(errornorm(as_vector(
            [math.pi * cos(math.pi * X[0]) * sin(math.pi * X[1]),
             math.pi * sin(math.pi * X[0]) * cos(math.pi * X[1])]), sh))
    ou = np.log2(np.array(errs_u[:-1]) / np.array(errs_u[1:]))
    os_ = np.log2(np.array(errs_s[:-1]) / np.array(errs_s[1:]))
    assert (ou > order).all(), (errs_u, ou)
    assert (os_ > order).all(), (errs_s, os_)


def test_rt_tetrahedra():
    """RT1 on tets: the facet-sign machinery generalizes to 3D."""
    from firedrake_tpu import UnitCubeMesh, solve
    mesh = UnitCubeMesh(2, 2, 2)
    S = FunctionSpace(mesh, "RT", 1)
    X = SpatialCoordinate(mesh)
    cfield = as_vector([1.0 + 0 * X[0], 2.0 + 0 * X[1], -1.0 + 0 * X[2]])
    g = project(cfield, S, solver_parameters={"ksp_type": "preonly",
                                              "pc_type": "lu"})
    assert errornorm(cfield, g) < 1e-10
    V = FunctionSpace(mesh, "DG", 0)
    W = MixedFunctionSpace([S, V])
    sigma, u = TrialFunctions(W)
    tau, v = TestFunctions(W)
    ex = sin(math.pi * X[0]) * sin(math.pi * X[1]) * sin(math.pi * X[2])
    f = Function(V).interpolate(3 * math.pi ** 2 * ex)
    a = (dot(sigma, tau) + div(tau) * u + div(sigma) * v) * dx
    w = Function(W)
    solve(a == -inner(f, v) * dx, w,
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    assert errornorm(ex, w.subfunctions[1]) < 0.35


def test_higher_order_hdiv_projection_rates():
    """RT_k (any k) and BDM_k on triangles: optimal projection rates and
    exact inter-cell normal continuity (reference: FIAT raviart_thomas.py
    / brezzi_douglas_marini.py moment dual bases)."""
    import numpy as np
    from firedrake_tpu import (project, jump, FacetNormal, dS, assemble,
                               as_vector, sin, cos)
    for fam, deg, rate_exp in [("RT", 2, 2), ("RT", 3, 3), ("BDM", 2, 3)]:
        errs = []
        for n in (4, 8):
            mesh = fd.UnitSquareMesh(n, n)
            V = fd.FunctionSpace(mesh, fam, deg)
            X = fd.SpatialCoordinate(mesh)
            expr = as_vector([sin(X[0]) * X[1] ** 2,
                              X[0] ** 3 + cos(X[1])])
            f = project(expr, V)
            errs.append(fd.errornorm(expr, f))
            nrm = FacetNormal(mesh)
            assert assemble(jump(f, nrm) ** 2 * dS) < 1e-20
        rate = np.log2(errs[0] / errs[1])
        assert rate > rate_exp - 0.2, (fam, deg, rate)


def test_mixed_poisson_rt2_dg1():
    """RT2 x DG1 mixed Poisson converges at second order."""
    import math
    import numpy as np
    errs = []
    for n in (4, 8):
        mesh = fd.UnitSquareMesh(n, n)
        S = fd.FunctionSpace(mesh, "RT", 2)
        V = fd.FunctionSpace(mesh, "DG", 1)
        W = fd.MixedFunctionSpace([S, V])
        sigma, u = fd.TrialFunctions(W)
        tau, v = fd.TestFunctions(W)
        X = fd.SpatialCoordinate(mesh)
        f = 2 * math.pi ** 2 * fd.sin(math.pi * X[0]) \
            * fd.sin(math.pi * X[1])
        a = (fd.dot(sigma, tau) - u * fd.div(tau)
             - fd.div(sigma) * v) * fd.dx
        w = fd.Function(W)
        fd.solve(a == -f * v * fd.dx, w, solver_parameters={
            "ksp_type": "preonly", "pc_type": "lu"})
        uex = fd.sin(math.pi * X[0]) * fd.sin(math.pi * X[1])
        errs.append(fd.errornorm(uex, w.subfunctions[1]))
    assert np.log2(errs[0] / errs[1]) > 1.8, errs


def test_nedelec_any_degree():
    """N1curl_k (rotated RT_k): optimal projection rates and tangential
    continuity (global Stokes: sum of cell curls == boundary
    circulation)."""
    import numpy as np
    from firedrake_tpu import (project, FacetNormal, assemble, as_vector,
                               sin, cos, curl, ds)
    for deg in (2, 3):
        errs = []
        for n in (4, 8):
            mesh = fd.UnitSquareMesh(n, n)
            V = fd.FunctionSpace(mesh, "N1curl", deg)
            X = fd.SpatialCoordinate(mesh)
            expr = as_vector([sin(X[0]) * X[1] ** 2,
                              X[0] ** 3 + cos(X[1])])
            f = project(expr, V)
            errs.append(fd.errornorm(expr, f))
            nrm = FacetNormal(mesh)
            t = as_vector([-nrm[1], nrm[0]])
            gap = abs(assemble(curl(f) * fd.dx)
                      - assemble(fd.dot(f, t) * ds))
            assert gap < 1e-9, (deg, n, gap)
        rate = np.log2(errs[0] / errs[1])
        assert rate > deg - 0.2, (deg, rate)
