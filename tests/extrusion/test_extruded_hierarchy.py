"""ExtrudedMeshHierarchy / SemiCoarsenedExtrudedHierarchy + GMG
(reference: firedrake/mg/mesh.py:320 ExtrudedMeshHierarchy, :404
SemiCoarsenedExtrudedHierarchy; tests/firedrake/multigrid/)."""
import numpy as np
import jax.numpy as jnp

from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           TrialFunction, SpatialCoordinate, Constant,
                           UnitSquareMesh, MeshHierarchy, DirichletBC,
                           ExtrudedMeshHierarchy,
                           SemiCoarsenedExtrudedHierarchy,
                           inner, grad, dx, solve, errornorm, prolong,
                           restrict, inject)
from firedrake_tpu.mg.transfer import get_transfer


def test_extruded_hierarchy_transfers_exact_linears():
    bh = MeshHierarchy(UnitSquareMesh(2, 2), 1)
    h = ExtrudedMeshHierarchy(bh, height=1.0, base_layer=2)
    Vc, Vf = FunctionSpace(h[0], "CG", 1), FunctionSpace(h[1], "CG", 1)
    Xc, Xf = SpatialCoordinate(h[0]), SpatialCoordinate(h[1])
    lin = lambda X: 1 + 2 * X[0] - X[1] + 3 * X[2]
    fc = Function(Vc).interpolate(lin(Xc))
    ff = Function(Vf)
    prolong(fc, ff)
    assert errornorm(lin(Xf), ff) < 1e-12
    fc2 = Function(Vc)
    inject(ff, fc2)
    assert np.abs(np.asarray(fc2.dat) - np.asarray(fc.dat)).max() < 1e-13
    # restrict is the exact transpose of prolong
    rng = np.random.default_rng(0)
    t = get_transfer(Vc, Vf)
    xc = rng.standard_normal(Vc.dim)
    yf = rng.standard_normal(Vf.dim)
    lhs = float(np.dot(np.asarray(t.prolong_fn(jnp.asarray(xc))), yf))
    rhs = float(np.dot(xc, np.asarray(t.restrict_fn(jnp.asarray(yf)))))
    assert abs(lhs - rhs) < 1e-10


def test_semicoarsened_hierarchy():
    hs = SemiCoarsenedExtrudedHierarchy(UnitSquareMesh(2, 2), nref=2,
                                        base_layer=1)
    assert [m._layers for m in hs] == [1, 2, 4]
    Vc, Vf = FunctionSpace(hs[1], "CG", 1), FunctionSpace(hs[2], "CG", 1)
    Xc, Xf = SpatialCoordinate(hs[1]), SpatialCoordinate(hs[2])
    fc = Function(Vc).interpolate(Xc[0] + 5 * Xc[2])
    ff = Function(Vf)
    prolong(fc, ff)
    assert errornorm(Xf[0] + 5 * Xf[2], ff) < 1e-12


def test_gmg_on_extruded_hex_hierarchy():
    bh = MeshHierarchy(UnitSquareMesh(2, 2, quadrilateral=True), 2)
    h = ExtrudedMeshHierarchy(bh, height=1.0, base_layer=2)
    m = h[-1]
    V = FunctionSpace(m, "CG", 1)
    X = SpatialCoordinate(m)
    u, v = TrialFunction(V), TestFunction(V)
    ex = X[0] * (1 - X[0]) * X[1] * (1 - X[1]) * X[2] * (1 - X[2])
    lap = -2 * (X[1] * (1 - X[1]) * X[2] * (1 - X[2])
                + X[0] * (1 - X[0]) * X[2] * (1 - X[2])
                + X[0] * (1 - X[0]) * X[1] * (1 - X[1]))
    f = Function(V).interpolate(-lap)
    uh = Function(V)
    solve(inner(grad(u), grad(v)) * dx == inner(f, v) * dx, uh,
          bcs=[DirichletBC(V, 0.0, "on_boundary")],
          solver_parameters={"ksp_type": "cg", "pc_type": "mg",
                             "ksp_rtol": 1e-10})
    assert errornorm(ex, uh) < 4e-4
