"""Adaptive NVB refinement (reference: netgen refine_marked_elements via
firedrake; tests/firedrake/regression/test_adapt... analogue)."""
import math

import numpy as np

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           TrialFunction, SpatialCoordinate,
                           UnitSquareMesh, DirichletBC, inner, grad, dx,
                           solve, assemble, Constant, refine_marked,
                           adapt, errornorm)


def test_refine_marked_conforming():
    mesh = UnitSquareMesh(4, 4)
    markers = np.zeros(mesh.num_cells, dtype=bool)
    cents = mesh._vertex_coords[mesh.topology.cell_vertices].mean(axis=1)
    markers[(cents[:, 0] < 0.5) & (cents[:, 1] < 0.5)] = True
    m2 = refine_marked(mesh, markers)
    assert m2.num_cells > mesh.num_cells
    # area preserved; every interior edge shared by exactly 2 cells
    assert abs(assemble(Constant(1.0) * fd.dx(domain=m2)) - 1.0) < 1e-12
    fc = m2.topology.facet_cells
    assert ((fc[:, 1] >= 0) | (fc[:, 0] >= 0)).all()
    on_b = np.isclose(np.abs(
        m2._vertex_coords[m2.topology.facet_vertices] - 0.5).max(axis=(1, 2)), 0.5)
    interior = fc[:, 1] >= 0
    # conformity: boundary facets are exactly the one-sided ones
    assert (interior == ~(fc[:, 1] < 0)).all()


def test_adaptive_poisson_converges():
    """Adapt toward the peak of the forcing; solution error decreases and
    dofs concentrate near the marked region."""
    mesh = UnitSquareMesh(8, 8)
    X0 = (0.5, 0.5)
    errs = []
    for it in range(3):
        V = FunctionSpace(mesh, "CG", 1)
        u, v = TrialFunction(V), TestFunction(V)
        X = SpatialCoordinate(mesh)
        uex = fd.sin(math.pi * X[0]) * fd.sin(math.pi * X[1])
        f = 2 * math.pi ** 2 * uex
        uh = Function(V)
        solve(inner(grad(u), grad(v)) * dx == f * v * dx, uh,
              bcs=[DirichletBC(V, 0.0, "on_boundary")])
        errs.append(errornorm(uex, uh))
        # residual-ish indicator: cell size * ||f||
        cents = mesh._vertex_coords[
            mesh.topology.cell_vertices].mean(axis=1)
        eta = mesh.cell_volumes * (1 + 10 * np.exp(
            -10 * ((cents[:, 0] - X0[0]) ** 2
                   + (cents[:, 1] - X0[1]) ** 2)))
        mesh = adapt(mesh, eta, refine_fraction=0.4)
    assert errs[-1] < errs[0]


def test_refine_all_equals_uniform_count():
    mesh = UnitSquareMesh(2, 2)
    m2 = refine_marked(mesh, np.ones(mesh.num_cells, dtype=bool))
    # every cell bisected at least once
    assert m2.num_cells >= 2 * mesh.num_cells
    assert abs(assemble(Constant(1.0) * fd.dx(domain=m2)) - 1.0) < 1e-12


def _tet_faces(m):
    cv = np.asarray(m.topology.cell_vertices)
    faces = {}
    for c in cv:
        for f4 in ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)):
            k = tuple(sorted(int(c[i]) for i in f4))
            faces[k] = faces.get(k, 0) + 1
    return faces


def _tet_quality(m):
    X = np.asarray(m._vertex_coords)
    cv = np.asarray(m.topology.cell_vertices)
    qs = []
    for c in cv:
        p = X[c]
        v6 = abs(np.linalg.det(np.stack([p[1] - p[0], p[2] - p[0],
                                         p[3] - p[0]])))
        lmax = max(np.linalg.norm(p[i] - p[j])
                   for i in range(4) for j in range(i))
        qs.append(v6 / lmax ** 3)
    return min(qs)


def test_tet_refine_conforming():
    from firedrake_tpu import UnitCubeMesh
    mesh = UnitCubeMesh(2, 2, 2)
    mk = np.zeros(mesh.num_cells, bool)
    mk[::5] = True
    m2 = refine_marked(mesh, mk)
    assert m2.num_cells > mesh.num_cells
    faces = _tet_faces(m2)
    assert max(faces.values()) <= 2
    X = np.asarray(m2._vertex_coords)
    for k, mult in faces.items():
        if mult == 1:           # multiplicity-1 == true boundary face
            cen = X[list(k)].mean(axis=0)
            assert any(abs(cen[d]) < 1e-12 or abs(cen[d] - 1) < 1e-12
                       for d in range(3)), (k, cen)
    # volume conserved
    one = Function(FunctionSpace(m2, "DG", 0)).assign(1.0)
    assert abs(float(assemble(one * dx)) - 1.0) < 1e-12


def test_tet_refine_quality_stable():
    """Shape regularity under repeated bisection (the Rivara property:
    quality bounded away from zero over generations)."""
    from firedrake_tpu import UnitCubeMesh
    rng = np.random.default_rng(5)
    mesh = UnitCubeMesh(2, 2, 2)
    q0 = _tet_quality(mesh)
    for _ in range(4):
        mk = rng.random(mesh.num_cells) < 0.3
        mk[0] = True
        mesh = refine_marked(mesh, mk)
    assert _tet_quality(mesh) > 0.12 * q0, (_tet_quality(mesh), q0)
    faces = _tet_faces(mesh)
    assert max(faces.values()) <= 2


def test_tet_refine_solution_exact():
    """A linear exact solution survives on the bisected mesh (the mesh
    is a valid conforming FEM mesh end-to-end)."""
    from firedrake_tpu import UnitCubeMesh, DirichletBC
    mesh = UnitCubeMesh(2, 2, 2)
    mk = np.zeros(mesh.num_cells, bool)
    mk[:6] = True
    m2 = refine_marked(mesh, mk)
    V = FunctionSpace(m2, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    x, y, z = SpatialCoordinate(m2)
    g = Function(V).interpolate(x + 2 * y - z)
    a = (inner(grad(u), grad(v)) + inner(u, v)) * dx
    L = inner(g, v) * dx
    uh = Function(V)
    solve(a == L, uh, bcs=[DirichletBC(V, g, "on_boundary")],
          solver_parameters={"ksp_type": "cg", "ksp_rtol": 1e-12,
                             "pc_type": "jacobi"})
    assert errornorm(x + 2 * y - z, uh) < 1e-9
