"""Interior/exterior facet integrals and DG advection (reference:
demos/DG_advection + tests/firedrake/regression/test_dg_advection.py)."""
import math

import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, VectorFunctionSpace, Function,
                           TestFunction, TrialFunction, SpatialCoordinate,
                           UnitSquareMesh, Constant, FacetNormal, inner,
                           dot, grad, dx, ds, dS, avg, jump, solve,
                           errornorm, as_vector, conditional, ge, sin, cos,
                           assemble)


def test_avg_of_continuous_is_identity():
    mesh = UnitSquareMesh(4, 4)
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    f = Function(V).interpolate(X[0] + 2 * X[1])
    # jump of a continuous field vanishes
    j = assemble(jump(f) * dS)
    assert abs(j) < 1e-12
    # total interior facet length of unit square 4x4 (left diagonal):
    # horizontal interior: 3 rows * 4 = 3, vertical: 3, diagonals: 16*sqrt2/4
    total = assemble(avg(Constant(1.0) + 0 * f) * dS(domain=mesh))
    expected = 3 * 1.0 * 2 + 16 * math.sqrt(2) / 4
    assert abs(total - expected) < 1e-12


def test_jump_of_dg_indicator():
    """DG0 indicator of left half: jump integral over the x=0.5 line = ±1
    per unit length -> |∫ jump| = 1 with consistent signs cancelling to
    measure orientation-independence via jump(f)**2."""
    mesh = UnitSquareMesh(4, 4)
    V = FunctionSpace(mesh, "DG", 0)
    X = SpatialCoordinate(mesh)
    f = Function(V).interpolate(conditional(ge(X[0], 0.5), 1.0, 0.0))
    j2 = assemble(jump(f) * jump(f) * dS)
    assert abs(j2 - 1.0) < 1e-12   # discontinuity line has length 1


def test_facet_normal_consistency():
    """∫_dS jump(x·n) ds: for continuous x, jump(dot(x,n)) = x·(n+ + n-) =0."""
    mesh = UnitSquareMesh(3, 3)
    n = FacetNormal(mesh)
    X = SpatialCoordinate(mesh)
    val = assemble((dot(X, n)("+") + dot(X, n)("-")) * dS)
    assert abs(val) < 1e-12
    # divergence theorem: ∫_ds x·n = ∫ div(x) = 2*area
    val2 = assemble(dot(X, n) * ds)
    assert abs(val2 - 2.0) < 1e-12


def test_dg_poisson_sipg():
    """Symmetric interior penalty DG for Poisson; converges at order ~2
    for DG1."""
    from firedrake_tpu import CellDiameter, DirichletBC
    errs = []
    for nref in [4, 8, 16]:
        mesh = UnitSquareMesh(nref, nref)
        V = FunctionSpace(mesh, "DG", 1)
        u, v = TrialFunction(V), TestFunction(V)
        X = SpatialCoordinate(mesh)
        n = FacetNormal(mesh)
        h = CellDiameter(mesh)
        alpha = Constant(10.0)
        f = Function(V).interpolate(
            2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1]))
        a = inner(grad(u), grad(v)) * dx \
            - inner(avg(grad(u)), jump(v, n)) * dS \
            - inner(jump(u, n), avg(grad(v))) * dS \
            + alpha / avg(h) * inner(jump(u, n), jump(v, n)) * dS \
            - inner(grad(u), v * n) * ds \
            - inner(u * n, grad(v)) * ds \
            + alpha / h * inner(u, v) * ds
        L = inner(f, v) * dx
        uh = Function(V)
        solve(a == L, uh, solver_parameters={
            "ksp_type": "gmres", "pc_type": "jacobi", "ksp_rtol": 1e-12,
            "ksp_max_it": 20000})
        errs.append(errornorm(sin(math.pi * X[0]) * sin(math.pi * X[1]),
                              uh))
    orders = np.log2(np.array(errs[:-1]) / np.array(errs[1:]))
    assert (orders > 1.7).all(), (errs, orders)


def test_dg_advection_conservation():
    """Upwind DG0 advection, solid-body-ish constant velocity with periodic
    effect ignored: explicit Euler steps conserve mass up to boundary flux
    (zero inflow), and max principle holds."""
    nx = 8
    mesh = UnitSquareMesh(nx, nx)
    V = FunctionSpace(mesh, "DG", 1)
    X = SpatialCoordinate(mesh)
    vel = as_vector([1.0 + 0 * X[0], 0.0])
    q = Function(V).interpolate(
        conditional(ge(X[0], 0.25), 1.0, 0.0)
        * conditional(ge(0.5, X[0]), 1.0, 0.0))
    n = FacetNormal(mesh)
    un = 0.5 * (dot(vel, n) + abs(dot(vel, n)))
    p = TestFunction(V)
    qt = TrialFunction(V)
    # mass matrix
    a = inner(qt, p) * dx
    dtc = 0.25 / nx
    L = dtc * (inner(q * vel, grad(p)) * dx
               - inner(jump(p), jump(un * q)) * dS
               - inner(p, un * q) * ds)
    dq = Function(V)
    sp = {"ksp_type": "cg", "pc_type": "jacobi", "ksp_rtol": 1e-12}
    q1 = Function(V)
    q2 = Function(V)
    mass0 = assemble(q * dx)
    qsave = Function(V)
    # keep the numerical domain of dependence (1 cell/stage) away from the
    # outflow boundary so mass is conserved exactly
    for _ in range(1):
        # SSPRK3 (the reference demo's integrator, demos/DG_advection)
        qsave.dat = np.asarray(q.dat).copy()
        solve(a == L, dq, solver_parameters=sp)
        q.dat = np.asarray(q.dat) + np.asarray(dq.dat)
        solve(a == L, dq, solver_parameters=sp)
        q.dat = 0.75 * np.asarray(qsave.dat) \
            + 0.25 * (np.asarray(q.dat) + np.asarray(dq.dat))
        solve(a == L, dq, solver_parameters=sp)
        q.dat = (np.asarray(qsave.dat)
                 + 2.0 * (np.asarray(q.dat) + np.asarray(dq.dat))) / 3.0
    mass1 = assemble(q * dx)
    # nothing has reached the outflow boundary yet; mass conserved
    assert abs(mass1 - mass0) < 1e-10, (mass0, mass1)
    assert np.asarray(q.dat).max() < 1.3
    assert np.asarray(q.dat).min() > -0.3


def test_interior_facets_3d():
    """dS orientation machinery in 3D: tet (triangle facets, 6
    orientations) and hex (quad facets, dihedral orientations)."""
    import firedrake_tpu as fd
    from firedrake_tpu import UnitCubeMesh, dot
    for mesh in [UnitCubeMesh(2, 2, 2),
                 fd.BoxMesh(3, 3, 3, hexahedral=True)]:
        V = FunctionSpace(mesh, "CG", 1)
        X = SpatialCoordinate(mesh)
        f = Function(V).interpolate(X[0] * X[1] + X[2])
        assert abs(assemble(jump(f) * jump(f) * dS)) < 1e-12
        n = FacetNormal(mesh)
        assert abs(assemble(dot(X, n) * ds) - 3.0) < 1e-12


def test_sipg_poisson_3d_tets():
    """SIPG DG1 Poisson on tets solves a linear exact solution."""
    import firedrake_tpu as fd
    from firedrake_tpu import UnitCubeMesh, CellDiameter
    mesh = UnitCubeMesh(3, 3, 3)
    V = FunctionSpace(mesh, "DG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    n = FacetNormal(mesh)
    h = CellDiameter(mesh)
    alpha = Constant(20.0)
    gex = 1 + X[0] + 2 * X[1] - X[2]
    a = inner(grad(u), grad(v)) * dx \
        - inner(avg(grad(u)), jump(v, n)) * dS \
        - inner(jump(u, n), avg(grad(v))) * dS \
        + alpha / avg(h) * inner(jump(u, n), jump(v, n)) * dS \
        - inner(grad(u), v * n) * ds \
        - inner(u * n, grad(v)) * ds \
        + alpha / h * inner(u, v) * ds
    L = (- inner(gex * n, grad(v)) * ds
         + alpha / h * inner(gex, v) * ds)
    uh = Function(V)
    solve(a == L, uh, solver_parameters={
        "ksp_type": "gmres", "pc_type": "jacobi", "ksp_rtol": 1e-12,
        "ksp_max_it": 20000, "ksp_gmres_restart": 100})
    err = errornorm(gex, uh)
    assert err < 1e-7, err


def test_dS_subdomain_ids():
    """dS(id) integrates over MARKED interior facets only (reference:
    measures with subdomain data from gmsh physical lines)."""
    import numpy as np
    from firedrake_tpu import (UnitSquareMesh, FunctionSpace, Function,
                               SpatialCoordinate, assemble, avg, dS)
    mesh = UnitSquareMesh(4, 4)
    # mark the internal line x == 0.5 as 7
    mesh.mark_facets(lambda m: 7 if abs(m[0] - 0.5) < 1e-12 else 0)
    X = SpatialCoordinate(mesh)
    f = Function(FunctionSpace(mesh, "DG", 0)).interpolate(
        0 * X[0] + 1.0)
    # length of the marked line = 1
    assert abs(assemble(avg(f) * dS(7)) - 1.0) < 1e-12
    total = assemble(avg(f) * dS)
    assert total > 1.0
