"""Grid transfer + GMG solves (reference: tests/firedrake/multigrid/
test_grid_transfer.py, test_poisson_gmg.py)."""
import math

import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, VectorFunctionSpace, Function, interpolate,
                           TestFunction, TrialFunction, SpatialCoordinate,
                           UnitSquareMesh, UnitCubeMesh, MeshHierarchy,
                           DirichletBC, inner, grad, dx, solve, errornorm,
                           prolong, restrict, inject, sin,
                           LinearVariationalProblem,
                           LinearVariationalSolver)
import jax.numpy as jnp


@pytest.mark.parametrize("degree", [1, 2])
def test_prolong_exact_polynomial(degree):
    mh = MeshHierarchy(UnitSquareMesh(2, 2), 2)
    Vc = FunctionSpace(mh[0], "CG", degree)
    Vf = FunctionSpace(mh[1], "CG", degree)
    Xc, Xf = SpatialCoordinate(mh[0]), SpatialCoordinate(mh[1])
    expr_c = Xc[0] ** degree + Xc[1]
    expr_f = Xf[0] ** degree + Xf[1]
    fc = Function(Vc).interpolate(expr_c)
    ff = Function(Vf)
    prolong(fc, ff)
    fex = Function(Vf).interpolate(expr_f)
    assert np.abs(np.asarray(ff.dat) - np.asarray(fex.dat)).max() < 1e-12
    # inject is a left inverse of prolong
    fb = Function(Vc)
    inject(ff, fb)
    assert np.abs(np.asarray(fb.dat) - np.asarray(fc.dat)).max() < 1e-12


def test_restrict_is_transpose():
    mh = MeshHierarchy(UnitSquareMesh(3, 3), 1)
    Vc = FunctionSpace(mh[0], "CG", 2)
    Vf = FunctionSpace(mh[1], "CG", 2)
    from firedrake_tpu.mg.transfer import get_transfer
    t = get_transfer(Vc, Vf)
    rng = np.random.default_rng(7)
    r = rng.standard_normal(Vf.dim)
    c = rng.standard_normal(Vc.dim)
    lhs = np.dot(np.asarray(t.restrict_fn(jnp.asarray(r))), c)
    rhs = np.dot(r, np.asarray(t.prolong_fn(jnp.asarray(c))))
    assert abs(lhs - rhs) < 1e-12 * max(1, abs(lhs))


def test_tet_refinement_volume():
    mh = MeshHierarchy(UnitCubeMesh(1, 1, 1), 2)
    for m in mh:
        assert abs(m.cell_volumes.sum() - 1.0) < 1e-12
    assert mh[2].num_cells == 6 * 64


@pytest.mark.parametrize("degree", [1, 2])
def test_poisson_gmg_iteration_count(degree):
    """GMG-preconditioned CG converges in O(1) iterations, independent of
    the mesh (reference: multigrid/test_poisson_gmg.py)."""
    its = []
    for levels in [2, 3]:
        mh = MeshHierarchy(UnitSquareMesh(4, 4), levels)
        mesh = mh[-1]
        V = FunctionSpace(mesh, "CG", degree)
        u, v = TrialFunction(V), TestFunction(V)
        X = SpatialCoordinate(mesh)
        f = Function(V).interpolate(
            2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1]))
        bc = DirichletBC(V, 0.0, "on_boundary")
        uh = Function(V)
        prob = LinearVariationalProblem(inner(grad(u), grad(v)) * dx,
                                        inner(f, v) * dx, uh, bcs=[bc])
        s = LinearVariationalSolver(
            prob, solver_parameters={"ksp_type": "cg", "pc_type": "mg",
                                     "ksp_rtol": 1e-10})
        s.solve()
        its.append(s.ksp_iterations)
        err = errornorm(sin(math.pi * X[0]) * sin(math.pi * X[1]), uh)
        assert err < 10.0 / (4 * 2 ** levels) ** (degree + 1), err
    assert max(its) <= 20
    assert abs(its[0] - its[1]) <= 3   # mesh-independent


def test_poisson_gmg_3d():
    mh = MeshHierarchy(UnitCubeMesh(2, 2, 2), 2)
    mesh = mh[-1]
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    ex = sin(math.pi * X[0]) * sin(math.pi * X[1]) * sin(math.pi * X[2])
    f = Function(V).interpolate(3 * math.pi ** 2 * ex)
    bc = DirichletBC(V, 0.0, "on_boundary")
    uh = Function(V)
    prob = LinearVariationalProblem(inner(grad(u), grad(v)) * dx,
                                    inner(f, v) * dx, uh, bcs=[bc])
    s = LinearVariationalSolver(
        prob, solver_parameters={"ksp_type": "cg", "pc_type": "mg",
                                 "ksp_rtol": 1e-9})
    s.solve()
    assert s.ksp_iterations <= 25
    assert errornorm(ex, uh) < 0.1


def test_transfer_dg_and_vector():
    """Tabulated transfers work for DG and vector spaces directly."""
    import numpy as np
    from firedrake_tpu import (MeshHierarchy, UnitSquareMesh,
                               FunctionSpace, VectorFunctionSpace,
                               Function, SpatialCoordinate, prolong,
                               inject, as_vector, errornorm)
    mh = MeshHierarchy(UnitSquareMesh(2, 2), 1)
    for mk in (lambda m: FunctionSpace(m, "DG", 1),
               lambda m: VectorFunctionSpace(m, "CG", 2, dim=2)):
        Vc, Vf = mk(mh[0]), mk(mh[1])
        Xc = SpatialCoordinate(mh[0])
        Xf = SpatialCoordinate(mh[1])
        if Vc.value_shape:
            ec, ef = (as_vector([X[0] + 2 * X[1], X[0] * X[1]])
                      for X in (Xc, Xf))
        else:
            ec, ef = ((X[0] + 2 * X[1]) for X in (Xc, Xf))
        uc = Function(Vc).interpolate(ec)
        uf = Function(Vf)
        prolong(uc, uf)
        if Vc.scalar_element.degree >= 2 or not Vc.value_shape:
            # linear in the span: prolongation is exact
            assert errornorm(ef, uf) < 1e-11
        uc2 = Function(Vc)
        inject(uf, uc2)
        assert np.abs(np.asarray(uc2.dat) - np.asarray(uc.dat)).max() \
            < 1e-11


def test_transfer_manager_hdiv_embedding():
    """TransferManager embeds RT1 through vector DG for prolongation
    (reference: mg/embedded.py)."""
    from firedrake_tpu import (MeshHierarchy, UnitSquareMesh,
                               FunctionSpace, Function,
                               SpatialCoordinate, as_vector, project,
                               TransferManager, errornorm)
    mh = MeshHierarchy(UnitSquareMesh(2, 2), 1)
    Vc = FunctionSpace(mh[0], "RT", 1)
    Vf = FunctionSpace(mh[1], "RT", 1)
    Xc = SpatialCoordinate(mh[0])
    Xf = SpatialCoordinate(mh[1])
    # constant vector fields are in RT1 and survive the embedding chain
    uc = project(as_vector([1.0 + 0 * Xc[0], 2.0 + 0 * Xc[1]]), Vc)
    uf = Function(Vf)
    TransferManager().prolong(uc, uf)
    assert errornorm(as_vector([1.0 + 0 * Xf[0], 2.0 + 0 * Xf[1]]),
                     uf) < 1e-9


# -------------------------------------------- 3D structured stencil MG
# BoxMesh hierarchies preserve grid numbering per level (Kuhn cubes
# refine to Kuhn cubes — Bey red refinement), so transfers stay
# pad/slice programs at any Lagrange degree (mg/transfer.py
# StructuredTransfer; reference: mg/kernels.py generated transfers).

@pytest.mark.parametrize("hexa,deg", [(False, 1), (False, 2), (True, 2)])
def test_structured_transfer_3d_exact(hexa, deg):
    from firedrake_tpu.mg.transfer import get_transfer, StructuredTransfer
    mh = MeshHierarchy(UnitCubeMesh(2, 2, 2, hexahedral=hexa), 1)
    Vc = FunctionSpace(mh[0], "CG", deg)
    Vf = FunctionSpace(mh[1], "CG", deg)
    tr = get_transfer(Vc, Vf)
    assert isinstance(tr, StructuredTransfer)
    x, y, z = SpatialCoordinate(mh[0])
    expr = x + 2 * y - z if deg == 1 else x * y + z * z - 0.3 * x
    uc = interpolate(expr, Vc)
    X, Y, Z = SpatialCoordinate(mh[1])
    expr_f = X + 2 * Y - Z if deg == 1 else X * Y + Z * Z - 0.3 * X
    uf = interpolate(expr_f, Vf)
    assert np.abs(np.asarray(tr.prolong_fn(uc.dat))
                  - np.asarray(uf.dat)).max() < 1e-13
    assert np.abs(np.asarray(tr.inject_fn(uf.dat))
                  - np.asarray(uc.dat)).max() < 1e-13
    rng = np.random.default_rng(0)
    f = rng.standard_normal(Vf.dim)
    c = rng.standard_normal(Vc.dim)
    lhs = float(np.dot(np.asarray(tr.restrict_fn(f)), c))
    rhs = float(np.dot(f, np.asarray(tr.prolong_fn(c))))
    assert abs(lhs - rhs) < 1e-10 * max(1.0, abs(lhs))


def test_poisson_gmg_3d_structured_p2():
    # the north-star configuration at test scale: P2 Poisson on a cube,
    # stencil assembly + structured zero-gather transfers end to end
    import math
    mh = MeshHierarchy(UnitCubeMesh(2, 2, 2), 2)
    m = mh[-1]
    V = FunctionSpace(m, "CG", 2)
    assert V.sdata.grid_numbered
    u, v = TrialFunction(V), TestFunction(V)
    x, y, z = SpatialCoordinate(m)
    uex = sin(math.pi * x) * sin(math.pi * y) * sin(math.pi * z)
    sol = Function(V)
    solve(inner(grad(u), grad(v)) * dx == 3 * math.pi ** 2 * uex * v * dx,
          sol, bcs=DirichletBC(V, 0.0, "on_boundary"),
          solver_parameters={"ksp_type": "cg", "pc_type": "mg",
                             "ksp_rtol": 1e-10})
    assert errornorm(uex, sol) < 1e-3
