"""3D hybridization: BDM/N1curl on tets, P_k traces on tet faces,
Slate facet localization with matrix entity transforms (reference:
tests/firedrake/regression/test_hybridize_mixed_poisson 3D cases;
FIAT HDivTrace on tetrahedra)."""
import numpy as np
import pytest

from firedrake_tpu import (FunctionSpace, Function, TestFunctions,
                           TrialFunctions, SpatialCoordinate,
                           UnitCubeMesh, as_vector, dot, div, dx,
                           errornorm, solve, sin, TrialFunction,
                           TestFunction, assemble, inner, ds, dS)


def _mixed_poisson(fam, deg, n=2):
    """Hybridized vs monolithic-LU solutions of 3D mixed Poisson."""
    mesh = UnitCubeMesh(n, n, n)
    S = FunctionSpace(mesh, fam, deg)
    U = FunctionSpace(mesh, "DG", deg - 1)
    W = S * U
    sigma, u = TrialFunctions(W)
    tau, v = TestFunctions(W)
    x, y, z = SpatialCoordinate(mesh)
    f = Function(U).interpolate(sin(x + y) + z * z)
    a = (dot(sigma, tau) + div(tau) * u + div(sigma) * v) * dx
    L = -f * v * dx
    w1 = Function(W)
    solve(a == L, w1, solver_parameters={"ksp_type": "preonly",
                                         "pc_type": "lu"})
    w2 = Function(W)
    solve(a == L, w2,
          solver_parameters={"ksp_type": "preonly",
                             "pc_type": "python",
                             "pc_python_type": "firedrake.HybridizationPC",
                             "hybridization": {"ksp_type": "preonly"}})
    es = errornorm(w1.subfunctions[0], w2.subfunctions[0], "L2")
    eu = errornorm(w1.subfunctions[1], w2.subfunctions[1], "L2")
    return es, eu


@pytest.mark.parametrize("fam,deg", [("RT", 1), ("RT", 2),
                                     ("BDM", 1), ("BDM", 2)])
def test_hybridized_matches_lu_3d(fam, deg):
    es, eu = _mixed_poisson(fam, deg)
    assert es < 1e-12
    assert eu < 1e-12


@pytest.mark.parametrize("deg", [1, 2])
def test_trace_facet_mass_tet(deg):
    """P_k trace mass on all tet faces == sum of one-sided facet areas
    weighted by a quadratic: checks chart gluing across orientations."""
    mesh = UnitCubeMesh(2, 2, 2)
    T = FunctionSpace(mesh, "HDiv Trace", deg)
    lam, mu = TrialFunction(T), TestFunction(T)
    x, y, z = SpatialCoordinate(mesh)
    g = x + 2 * y - z
    M = assemble(inner(lam("+"), mu("+")) * dS
                 + inner(lam, mu) * ds)
    b = assemble(inner(g, mu("+")) * dS + inner(g, mu) * ds)
    from scipy.sparse.linalg import spsolve
    lam_h = Function(T)
    lam_h.dat = spsolve(M.to_scipy().tocsc(), np.asarray(b.dat))
    # residual of the projection: g is linear, in P_k for k >= 1
    r = M.to_scipy() @ lam_h.dat - np.asarray(b.dat)
    assert np.abs(r).max() < 1e-12
    # value check: evaluate int lam*mu == int g*mu for one more rhs
    b2 = assemble(inner(2.0 * g, mu("+")) * dS + inner(2.0 * g, mu) * ds)
    lam2 = spsolve(M.to_scipy().tocsc(), np.asarray(b2.dat))
    assert np.abs(lam2 - 2 * lam_h.dat).max() < 1e-10


def test_bdm2_tet_patch_test():
    """Quadratic fields are in BDM2: global projection reproduces them."""
    from scipy.sparse.linalg import spsolve
    mesh = UnitCubeMesh(2, 2, 2)
    V = FunctionSpace(mesh, "BDM", 2)
    X = SpatialCoordinate(mesh)
    f = as_vector([X[0] * X[1], X[2] ** 2 - X[0], X[1] * X[2] + 1.0])
    u, v = TrialFunction(V), TestFunction(V)
    M = assemble(inner(u, v) * dx)
    b = assemble(inner(f, v) * dx)
    uh = Function(V)
    uh.dat = spsolve(M.to_scipy().tocsc(), np.asarray(b.dat))
    assert errornorm(f, uh) < 1e-9
