"""Variable-layer extruded meshes (reference: firedrake mesh.py:3466
layers=(ncells, 2) arrays; pyop2/types/set.py:307 layer extents;
extrusion_numbering.pyx:222).  Columns may start and stop at different
layers; bottom/top measures follow each column's own extent."""
import numpy as np
import pytest

from firedrake_tpu import (ExtrudedMesh, FunctionSpace, Function,
                           TestFunction, TrialFunction,
                           SpatialCoordinate, UnitIntervalMesh,
                           UnitSquareMesh, DirichletBC, inner, grad, dx,
                           ds_b, ds_t, ds_v, solve, assemble, errornorm)


def _terrain_mesh():
    """4-cell interval base, columns [start, count]:
      col0: layers 0..2, col1: 0..3, col2: 1..3, col3: 1..2."""
    base = UnitIntervalMesh(4)
    layers = np.array([[0, 2], [0, 3], [1, 2], [1, 1]])
    return base, layers, ExtrudedMesh(base, layers, layer_height=0.25)


def test_geometry_volume_and_column_measures():
    base, layers, mesh = _terrain_mesh()
    h = 0.25
    ncells = layers[:, 1].sum()
    assert mesh.num_cells == ncells
    vol = assemble(1 * dx(mesh))
    assert abs(vol - ncells * 0.25 * h) < 1e-12
    # every column exposes exactly one bottom and one top facet
    # (including the steps where a neighbour column is shorter/taller)
    area_b = assemble(1 * ds_b(mesh))
    area_t = assemble(1 * ds_t(mesh))
    assert abs(area_b - 1.0) < 1e-12
    assert abs(area_t - 1.0) < 1e-12
    nb = len(mesh.boundary_facets("bottom"))
    nt = len(mesh.boundary_facets("top"))
    assert nb == 4 and nt == 4
    # sides: outer walls (left 2 cells, right 1 cell) + exposed steps
    sides = mesh.boundary_facets("sides")
    assert len(sides) == len(mesh.topology.exterior_facets) - nb - nt


def test_uniform_as_variable_matches_uniform():
    """The (0, n)-everywhere variable mesh IS the uniform mesh: same
    solve answer (compared through a mesh-independent functional)."""
    base = UnitIntervalMesh(5)
    mu = ExtrudedMesh(base, 3, layer_height=1.0 / 3)
    mv = ExtrudedMesh(base, np.tile([0, 3], (5, 1)),
                      layer_height=1.0 / 3)
    vals = []
    for m in (mu, mv):
        V = FunctionSpace(m, "CG", 1)
        u, v = TrialFunction(V), TestFunction(V)
        x, z = SpatialCoordinate(m)
        f = Function(V).interpolate(x * (1 - x) + z)
        a = inner(grad(u), grad(v)) * dx + u * v * dx
        L = f * v * dx
        w = Function(V)
        solve(a == L, w,
              solver_parameters={"ksp_type": "cg", "ksp_rtol": 1e-12})
        vals.append((assemble(w * dx), assemble(w * w * dx),
                     assemble(w * ds_t)))
    for a_, b_ in zip(*vals):
        assert abs(a_ - b_) < 1e-11


def test_variable_layer_poisson_matches_analytic():
    """Strong Dirichlet Poisson on a ragged quad mesh: u = x + 2z is in
    CG1, so the discrete solution is exact regardless of raggedness."""
    base, layers, mesh = _terrain_mesh()
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    x, z = SpatialCoordinate(mesh)
    a = inner(grad(u), grad(v)) * dx
    L = 0 * v * dx
    exact = x + 2 * z
    bc = DirichletBC(V, exact, "on_boundary")
    w = Function(V)
    solve(a == L, w, bcs=bc,
          solver_parameters={"ksp_type": "cg", "ksp_rtol": 1e-13})
    ref = Function(V).interpolate(exact)
    assert errornorm(ref, w) < 1e-10


def test_variable_layers_prism():
    """Triangle base -> ragged prism columns assemble and solve."""
    base = UnitSquareMesh(2, 2)
    ncb = base.num_cells
    rng = np.random.RandomState(7)
    start = rng.randint(0, 2, ncb)
    count = rng.randint(1, 3, ncb)
    mesh = ExtrudedMesh(base, np.stack([start, count], axis=1),
                        layer_height=0.5)
    vol = assemble(1 * dx(mesh))
    cell_areas = 0.5 * (1.0 / 2) ** 2
    assert abs(vol - (count * cell_areas * 0.5).sum()) < 1e-12
    assert abs(assemble(1 * ds_t(mesh)) - 1.0) < 1e-12
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    x, y, z = SpatialCoordinate(mesh)
    exact = 1 + x - y + 3 * z
    bc = DirichletBC(V, exact, "on_boundary")
    w = Function(V)
    solve(inner(grad(u), grad(v)) * dx == 0 * v * dx, w, bcs=bc,
          solver_parameters={"ksp_type": "cg", "ksp_rtol": 1e-13})
    ref = Function(V).interpolate(exact)
    assert errornorm(ref, w) < 1e-10
