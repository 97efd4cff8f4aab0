"""NonNestedHierarchy: multigrid over unrelated meshes of one domain.

Reference: firedrake/mg/mesh.py:442 NonNestedHierarchy (supermesh-backed
transfers); here transfers are cross-mesh nodal interpolation
(interpolation.cross_mesh_scalar_matrix).
"""
import numpy as np

from firedrake_tpu import *


def _poisson(mesh, sp):
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    x, y = SpatialCoordinate(mesh)
    fsrc = 2 * (x * (1 - x) + y * (1 - y))
    sol = Function(V)
    solve(inner(grad(u), grad(v)) * dx == fsrc * v * dx, sol,
          bcs=[DirichletBC(V, 0.0, "on_boundary")],
          solver_parameters=sp)
    return sol


def test_nonnested_gmg_matches_single_level():
    mh = NonNestedHierarchy(UnitSquareMesh(3, 3), UnitSquareMesh(5, 5),
                            UnitSquareMesh(8, 8))
    smg = _poisson(mh.finest, {"ksp_type": "cg", "pc_type": "mg",
                               "ksp_rtol": 1e-12})
    sref = _poisson(mh.finest, {"ksp_type": "cg", "pc_type": "jacobi",
                                "ksp_rtol": 1e-13})
    d = np.abs(np.asarray(smg.dat) - np.asarray(sref.dat)).max()
    assert d < 1e-8


def test_cross_mesh_interpolation_matrix():
    m1, m2 = UnitSquareMesh(5, 5), UnitSquareMesh(7, 7)
    V1, V2 = FunctionSpace(m1, "CG", 1), FunctionSpace(m2, "CG", 2)
    x, y = SpatialCoordinate(m1)
    f = interpolate(1 + 2 * x - 3 * y, V1)
    M = Interpolator(TestFunction(V1), V2).assemble()
    g = np.asarray(M.to_scipy() @ np.asarray(f.dat))
    x2, y2 = SpatialCoordinate(m2)
    gex = interpolate(1 + 2 * x2 - 3 * y2, V2)
    assert np.abs(g - np.asarray(gex.dat)).max() < 1e-12


def test_nonnested_transfer_linear_exact():
    from firedrake_tpu.mg.transfer import get_transfer
    import jax.numpy as jnp
    mh = NonNestedHierarchy(UnitSquareMesh(4, 4), UnitSquareMesh(6, 6))
    Vc = FunctionSpace(mh[0], "CG", 1)
    Vf = FunctionSpace(mh[1], "CG", 1)
    t = get_transfer(Vc, Vf)
    xc, yc = SpatialCoordinate(mh[0])
    fc = interpolate(2 * xc - yc + 1, Vc)
    xf, yf = SpatialCoordinate(mh[1])
    ff_exact = interpolate(2 * xf - yf + 1, Vf)
    out = np.asarray(t.prolong_fn(jnp.asarray(fc.dat)))
    assert np.abs(out - np.asarray(ff_exact.dat)).max() < 1e-12
    # injection back
    back = np.asarray(t.inject_fn(jnp.asarray(ff_exact.dat)))
    assert np.abs(back - np.asarray(fc.dat)).max() < 1e-12
