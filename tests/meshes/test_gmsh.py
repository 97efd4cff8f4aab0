"""Gmsh file reading (reference: firedrake/mesh.py:363 gmsh reader +
tests/firedrake/regression/meshes fixtures)."""
import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (Mesh, FunctionSpace, Function, TestFunction,
                           TrialFunction, SpatialCoordinate, Constant,
                           DirichletBC, inner, grad, dx, ds, solve,
                           errornorm, assemble)

V2_SQUARE = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
5
1 0 0 0
2 1 0 0
3 1 1 0
4 0 1 0
5 0.5 0.5 0
$EndNodes
$Elements
8
1 1 2 10 1 1 2
2 1 2 20 2 2 3
3 1 2 30 3 3 4
4 1 2 40 4 4 1
5 2 2 7 5 1 2 5
6 2 2 7 5 2 3 5
7 2 2 8 5 3 4 5
8 2 2 8 5 4 1 5
$EndElements
"""


@pytest.fixture
def square_msh(tmp_path):
    p = tmp_path / "square.msh"
    p.write_text(V2_SQUARE)
    return str(p)


def test_read_and_measure(square_msh):
    mesh = Mesh(square_msh)
    assert mesh.num_cells == 4
    assert abs(assemble(Constant(1.0) * dx(domain=mesh)) - 1.0) < 1e-12
    for tag in (10, 20, 30, 40):
        assert abs(assemble(Constant(1.0) * ds(tag, domain=mesh))
                   - 1.0) < 1e-12
    # physical cell tags -> dx(id)
    assert abs(assemble(Constant(1.0) * dx(7, domain=mesh)) - 0.5) < 1e-12
    assert abs(assemble(Constant(1.0) * dx(8, domain=mesh)) - 0.5) < 1e-12


def test_solve_on_gmsh_mesh(square_msh):
    mesh = Mesh(square_msh)
    V = FunctionSpace(mesh, "CG", 2)
    X = SpatialCoordinate(mesh)
    u, v = TrialFunction(V), TestFunction(V)
    uh = Function(V)
    solve(inner(grad(u), grad(v)) * dx == inner(Constant(0.0), v) * dx,
          uh, bcs=[DirichletBC(V, 0.0, 10), DirichletBC(V, 1.0, 30),
                   DirichletBC(V, Function(V).interpolate(X[1]),
                               (20, 40))],
          solver_parameters={"ksp_type": "cg", "pc_type": "jacobi",
                             "ksp_rtol": 1e-12})
    assert errornorm(X[1], uh) < 1e-9
