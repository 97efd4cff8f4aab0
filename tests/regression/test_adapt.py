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
