"""IO round trips (reference: tests/firedrake/output/ — test_io_function.py
N-to-M round trips, test_pvd_output.py)."""
import os

import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, VectorFunctionSpace,
                           MixedFunctionSpace, Function, SpatialCoordinate,
                           UnitSquareMesh, UnitCubeMesh, CheckpointFile,
                           DumbCheckpoint, VTKFile, sin)


def test_checkpoint_roundtrip(tmp_path):
    mesh = UnitSquareMesh(4, 4)
    V = FunctionSpace(mesh, "CG", 2)
    X = SpatialCoordinate(mesh)
    f = Function(V, name="temperature").interpolate(X[0] * X[1])
    path = str(tmp_path / "chk.h5")
    with CheckpointFile(path, "w") as chk:
        chk.save_mesh(mesh)
        chk.save_function(f)
    with CheckpointFile(path, "r") as chk:
        m2 = chk.load_mesh("mesh")
        f2 = chk.load_function(m2, "temperature")
    assert m2.num_cells == mesh.num_cells
    assert np.allclose(np.asarray(f2.dat), np.asarray(f.dat))
    assert np.allclose(m2.facet_markers, mesh.facet_markers)


def test_checkpoint_vector_and_series(tmp_path):
    mesh = UnitSquareMesh(3, 3)
    V = VectorFunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    from firedrake_tpu import as_vector
    f = Function(V, name="vel")
    path = str(tmp_path / "chk.h5")
    with CheckpointFile(path, "w") as chk:
        for i in range(3):
            f.interpolate(as_vector([X[0] * i, X[1]]))
            chk.save_function(f, idx=i)
    with CheckpointFile(path, "r") as chk:
        m2 = chk.load_mesh("mesh")
        f1 = chk.load_function(m2, "vel", idx=1)
        hist = chk.get_timestepping_history(m2, "vel")
    assert hist["index"] == [0, 1, 2]
    X2 = SpatialCoordinate(m2)
    ex = Function(f1.function_space()).interpolate(
        as_vector([X2[0], X2[1]]))
    assert np.allclose(np.asarray(f1.dat), np.asarray(ex.dat))


def test_checkpoint_mixed(tmp_path):
    mesh = UnitSquareMesh(3, 3)
    W = MixedFunctionSpace([VectorFunctionSpace(mesh, "CG", 2),
                            FunctionSpace(mesh, "CG", 1)])
    w = Function(W, name="state")
    w.subfunctions[1].assign(7.0)
    path = str(tmp_path / "chk.h5")
    with CheckpointFile(path, "w") as chk:
        chk.save_function(w)
    with CheckpointFile(path, "r") as chk:
        m2 = chk.load_mesh("mesh")
        w2 = chk.load_function(m2, "state")
    assert np.allclose(np.asarray(w2.dat), np.asarray(w.dat))


def test_dumb_checkpoint(tmp_path):
    mesh = UnitSquareMesh(3, 3)
    V = FunctionSpace(mesh, "CG", 1)
    f = Function(V, name="u").assign(3.5)
    with DumbCheckpoint(str(tmp_path / "dump"), "w") as chk:
        chk.store(f)
    g = Function(V, name="u")
    with DumbCheckpoint(str(tmp_path / "dump"), "r") as chk:
        chk.load(g)
    assert np.allclose(np.asarray(g.dat), 3.5)


@pytest.mark.parametrize("make_mesh", [
    lambda: UnitSquareMesh(3, 3),
    lambda: UnitSquareMesh(3, 3, quadrilateral=True),
    lambda: UnitCubeMesh(2, 2, 2),
])
def test_vtk_output(tmp_path, make_mesh):
    mesh = make_mesh()
    V = FunctionSpace(mesh, "CG", 1)
    W = VectorFunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    u = Function(V, name="scalar").interpolate(X[0])
    from firedrake_tpu import as_vector
    w = Function(W, name="vec").interpolate(
        as_vector([X[i] for i in range(mesh.geometric_dimension)]))
    out = VTKFile(str(tmp_path / "out.pvd"))
    out.write(u, w, time=0.0)
    out.write(u, w, time=0.5)
    assert os.path.exists(tmp_path / "out.pvd")
    assert os.path.exists(tmp_path / "out_0.vtu")
    assert os.path.exists(tmp_path / "out_1.vtu")
    txt = open(tmp_path / "out.pvd").read()
    assert 'timestep="0.5"' in txt
    vtu = open(tmp_path / "out_0.vtu").read()
    assert "scalar" in vtu and "vec" in vtu
