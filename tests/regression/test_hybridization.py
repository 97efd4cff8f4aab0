"""Hybridized mixed methods: broken H(div) + facet trace multipliers
(reference: firedrake/slate/static_condensation/hybridization.py — here
the hybrid system solves directly; trace-only condensation via Slate
facet terms is the follow-up)."""
import math

import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, MixedFunctionSpace, Function,
                           TestFunctions, TrialFunctions, TestFunction,
                           TrialFunction, SpatialCoordinate, UnitSquareMesh,
                           DirichletBC, FacetNormal, inner, dot, div, dx,
                           ds, dS, jump, solve, sin, assemble, errornorm)
from firedrake_tpu.elements import BrokenElement, HDivTrace, \
    make_scalar_element


def test_trace_space_facet_mass():
    mesh = UnitSquareMesh(3, 3)
    T = FunctionSpace(mesh, "HDiv Trace", 0)
    assert T.dim == len(mesh.topology.facet_cells)
    lam, mu = TrialFunction(T), TestFunction(T)
    M = assemble(inner(lam("+"), mu("+")) * dS + inner(lam, mu) * ds)
    d = np.sort(np.asarray(M.to_scipy().diagonal()))
    fv = mesh.topology.facet_vertices
    L = np.sort(np.linalg.norm(
        mesh._vertex_coords[fv[:, 1]] - mesh._vertex_coords[fv[:, 0]],
        axis=1))
    assert np.abs(d - L).max() < 1e-12


def test_trace_cell_integral_raises():
    mesh = UnitSquareMesh(2, 2)
    T = FunctionSpace(mesh, "HDiv Trace", 0)
    lam, mu = TrialFunction(T), TestFunction(T)
    with pytest.raises(ValueError):
        assemble(inner(lam, mu) * dx)


def test_hybridized_equals_classical_mixed():
    """Broken-RT1 x DG0 x Trace0 hybrid system reproduces the conforming
    mixed solution exactly."""
    mesh = UnitSquareMesh(8, 8)
    Sb = FunctionSpace(mesh, BrokenElement(
        make_scalar_element("triangle", "RT", 1)))
    V = FunctionSpace(mesh, "DG", 0)
    T = FunctionSpace(mesh, "HDiv Trace", 0)
    W = MixedFunctionSpace([Sb, V, T])
    sigma, u, lam = TrialFunctions(W)
    tau, v, mu = TestFunctions(W)
    X = SpatialCoordinate(mesh)
    n = FacetNormal(mesh)
    f = Function(V).interpolate(
        2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1]))
    a = ((dot(sigma, tau) - u * div(tau) - div(sigma) * v) * dx
         + inner(lam("+"), jump(tau, n)) * dS
         + inner(lam, dot(tau, n)) * ds
         + inner(mu("+"), jump(sigma, n)) * dS
         + inner(mu, dot(sigma, n)) * ds)
    L = -inner(f, v) * dx
    w = Function(W)
    solve(a == L, w, bcs=[DirichletBC(W.sub(2), 0.0, "on_boundary")],
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    uh = w.subfunctions[1]

    S = FunctionSpace(mesh, "RT", 1)
    W2 = MixedFunctionSpace([S, V])
    s2, u2 = TrialFunctions(W2)
    t2, v2 = TestFunctions(W2)
    a2 = (dot(s2, t2) + div(t2) * u2 + div(s2) * v2) * dx
    w2 = Function(W2)
    solve(a2 == -inner(f, v2) * dx, w2,
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    diff = np.abs(np.asarray(uh.dat)
                  - np.asarray(w2.subfunctions[1].dat)).max()
    assert diff < 1e-10, diff


def _mixed_poisson_setup(nx=8):
    mesh = UnitSquareMesh(nx, nx)
    Sb = FunctionSpace(mesh, BrokenElement(
        make_scalar_element("triangle", "RT", 1)))
    V = FunctionSpace(mesh, "DG", 0)
    T = FunctionSpace(mesh, "HDiv Trace", 0)
    W = MixedFunctionSpace([Sb, V, T])
    sigma, u, lam = TrialFunctions(W)
    tau, v, mu = TestFunctions(W)
    X = SpatialCoordinate(mesh)
    n = FacetNormal(mesh)
    f = Function(V).interpolate(
        2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1]))
    a = ((dot(sigma, tau) - u * div(tau) - div(sigma) * v) * dx
         + inner(lam("+"), jump(tau, n)) * dS
         + inner(lam, dot(tau, n)) * ds
         + inner(mu("+"), jump(sigma, n)) * dS
         + inner(mu, dot(sigma, n)) * ds)
    L = -inner(f, v) * dx
    return mesh, W, T, a, L, f


def test_slate_static_condensation_matches_monolithic():
    """Condensing the hybrid system onto the trace via Slate (facet-
    localized per-cell tensors + batched Schur complement) reproduces the
    monolithic hybrid solve (reference: the SCPC/HybridizationPC Schur
    path, slate/static_condensation/hybridization.py:150)."""
    from firedrake_tpu.slate import Tensor, assemble_slate
    mesh, W, T, a, L, f = _mixed_poisson_setup(8)
    A = Tensor(a)
    F = Tensor(L)
    S = A.blocks[2, 2] - A.blocks[2, :2] * A.blocks[:2, :2].inv \
        * A.blocks[:2, 2]
    E = -(A.blocks[2, :2] * A.blocks[:2, :2].inv * F.blocks[:2])
    bc = DirichletBC(T, 0.0, "on_boundary")
    Smat = assemble_slate(S, bcs=[bc])
    rhs = np.asarray(assemble_slate(E).dat).copy()
    rhs[bc.nodes] = 0.0
    lam_sol = np.linalg.solve(Smat.to_scipy().toarray(), rhs)

    w = Function(W)
    solve(a == L, w, bcs=[DirichletBC(W.sub(2), 0.0, "on_boundary")],
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    lam_ref = np.asarray(w.subfunctions[2].dat)
    assert np.abs(lam_sol - lam_ref).max() < 1e-12


def test_hybridization_pc():
    """pc_type='hybridization' on the CONFORMING RT x DG mixed problem:
    broken/trace construction, condensation, back-substitution and
    conforming flux recovery are all automatic (reference:
    HybridizationPC, slate/static_condensation/hybridization.py:62)."""
    mesh = UnitSquareMesh(8, 8)
    S = FunctionSpace(mesh, "RT", 1)
    V = FunctionSpace(mesh, "DG", 0)
    W = MixedFunctionSpace([S, V])
    sigma, u = TrialFunctions(W)
    tau, v = TestFunctions(W)
    X = SpatialCoordinate(mesh)
    f = Function(V).interpolate(
        2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1]))
    a = (dot(sigma, tau) - u * div(tau) - div(sigma) * v) * dx
    L = -inner(f, v) * dx

    w_h = Function(W)
    solve(a == L, w_h, solver_parameters={
        "ksp_type": "preonly", "pc_type": "hybridization",
        "hybridization": {"ksp_type": "preonly"}})

    w_ref = Function(W)
    solve(a == L, w_ref, solver_parameters={
        "ksp_type": "preonly", "pc_type": "lu"})

    for i in (0, 1):
        d = np.abs(np.asarray(w_h.subfunctions[i].dat)
                   - np.asarray(w_ref.subfunctions[i].dat)).max()
        r = np.abs(np.asarray(w_ref.subfunctions[i].dat)).max()
        assert d < 1e-9 * max(r, 1.0), (i, d, r)


def test_hybridization_pc_iterative_trace():
    """Inner CG on the trace system converges and matches."""
    mesh = UnitSquareMesh(6, 6)
    S = FunctionSpace(mesh, "RT", 1)
    V = FunctionSpace(mesh, "DG", 0)
    W = MixedFunctionSpace([S, V])
    sigma, u = TrialFunctions(W)
    tau, v = TestFunctions(W)
    X = SpatialCoordinate(mesh)
    f = Function(V).interpolate(sin(math.pi * X[0]))
    a = (dot(sigma, tau) - u * div(tau) - div(sigma) * v) * dx
    L = -inner(f, v) * dx
    w_h = Function(W)
    solve(a == L, w_h, solver_parameters={
        "ksp_type": "preonly", "pc_type": "hybridization",
        "hybridization": {"ksp_type": "cg", "pc_type": "jacobi",
                          "ksp_rtol": 1e-12}})
    w_ref = Function(W)
    solve(a == L, w_ref, solver_parameters={
        "ksp_type": "preonly", "pc_type": "lu"})
    d = np.abs(np.asarray(w_h.subfunctions[1].dat)
               - np.asarray(w_ref.subfunctions[1].dat)).max()
    assert d < 1e-8, d


def test_hybridization_pc_higher_order():
    """RT2 x DG1, BDM1 x DG0, BDM2 x DG1 hybridizations (P_k trace
    multipliers with Legendre facet bases) match the conforming LU
    solve (reference: HybridizationPC supports any H(div) degree)."""
    for fam, deg, vdeg in [("RT", 2, 1), ("BDM", 1, 0), ("BDM", 2, 1)]:
        mesh = UnitSquareMesh(6, 6)
        S = FunctionSpace(mesh, fam, deg)
        V = FunctionSpace(mesh, "DG", vdeg)
        W = MixedFunctionSpace([S, V])
        sigma, u = TrialFunctions(W)
        tau, v = TestFunctions(W)
        X = SpatialCoordinate(mesh)
        f = Function(V).interpolate(
            2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1]))
        a = (dot(sigma, tau) - u * div(tau) - div(sigma) * v) * dx
        L = -inner(f, v) * dx
        wh, wr = Function(W), Function(W)
        solve(a == L, wh, solver_parameters={
            "ksp_type": "preonly", "pc_type": "hybridization"})
        solve(a == L, wr, solver_parameters={
            "ksp_type": "preonly", "pc_type": "lu"})
        for i in (0, 1):
            d = np.abs(np.asarray(wh.subfunctions[i].dat)
                       - np.asarray(wr.subfunctions[i].dat)).max()
            assert d < 1e-10, (fam, deg, i, d)


def test_trace_p1_facet_mass():
    """Degree-1 trace: the facet mass matrix has the Legendre block
    diag(|e|, |e|/3) per edge."""
    mesh = UnitSquareMesh(2, 2)
    T = FunctionSpace(mesh, "HDiv Trace", 1)
    lam, mu = TrialFunction(T), TestFunction(T)
    M = assemble(inner(lam("+"), mu("+")) * dS
                 + inner(lam, mu) * ds).to_scipy().toarray()
    fv = mesh.topology.facet_vertices
    L = np.linalg.norm(mesh._vertex_coords[fv[:, 1]]
                       - mesh._vertex_coords[fv[:, 0]], axis=1)
    exact = np.zeros_like(M)
    for f, l in enumerate(L):
        exact[2 * f, 2 * f] = l
        exact[2 * f + 1, 2 * f + 1] = l / 3
    assert np.abs(M - exact).max() < 1e-12
