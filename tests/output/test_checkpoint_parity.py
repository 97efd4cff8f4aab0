"""Checkpointing parity upgrades (reference: checkpointing.py:735-1939
— cell markers, timestepping history, non-Lagrange families, extruded
metadata, VertexOnlyMesh save/load)."""
import numpy as np

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, Function, SpatialCoordinate,
                           UnitSquareMesh, ExtrudedMesh, UnitIntervalMesh,
                           CheckpointFile, VertexOnlyMesh, sin)


def test_cell_markers_roundtrip(tmp_path):
    path = str(tmp_path / "chk.h5")
    mesh = UnitSquareMesh(4, 4, name="m")
    mesh.mark_cells(lambda c: 7 if c[0] > 0.5 else 0)
    with CheckpointFile(path, "w") as chk:
        chk.save_mesh(mesh)
    with CheckpointFile(path, "r") as chk:
        m2 = chk.load_mesh("m")
    assert (m2.cell_markers == mesh.cell_markers).all()


def test_timestepping_history(tmp_path):
    path = str(tmp_path / "chk.h5")
    mesh = UnitSquareMesh(3, 3, name="m")
    V = FunctionSpace(mesh, "CG", 1)
    X = SpatialCoordinate(mesh)
    u = Function(V, name="u")
    with CheckpointFile(path, "w") as chk:
        for i in range(3):
            u.interpolate((i + 1.0) * X[0])
            chk.save_function(u, idx=i,
                              timestepping_info={"time": 0.5 * i,
                                                 "timestep": 0.5})
    with CheckpointFile(path, "r") as chk:
        m2 = chk.load_mesh("m")
        hist = chk.get_timestepping_history(m2, "u")
        assert hist["index"] == [0, 1, 2]
        assert np.allclose(hist["time"], [0.0, 0.5, 1.0])
        u1 = chk.load_function(m2, "u", idx=1)
    X2 = SpatialCoordinate(m2)
    ref = Function(u1.function_space()).interpolate(2.0 * X2[0])
    assert np.abs(np.asarray(u1.dat) - np.asarray(ref.dat)).max() < 1e-14


def test_rt_function_roundtrip(tmp_path):
    """Non-Lagrange family: the stored family string round-trips."""
    path = str(tmp_path / "chk.h5")
    mesh = UnitSquareMesh(3, 3, name="m")
    V = FunctionSpace(mesh, "RT", 1)
    sigma = Function(V, name="sigma")
    sigma.dat = np.arange(V.dim, dtype=float)
    with CheckpointFile(path, "w") as chk:
        chk.save_function(sigma)
    with CheckpointFile(path, "r") as chk:
        m2 = chk.load_mesh("m")
        s2 = chk.load_function(m2, "sigma")
    assert s2.function_space().scalar_element.family == "Raviart-Thomas"
    assert np.abs(np.asarray(s2.dat) - np.asarray(sigma.dat)).max() == 0


def test_extruded_metadata_roundtrip(tmp_path):
    path = str(tmp_path / "chk.h5")
    base = UnitIntervalMesh(4, name="base")
    mesh = ExtrudedMesh(base, 3, name="ext")
    with CheckpointFile(path, "w") as chk:
        chk.save_mesh(mesh)
    with CheckpointFile(path, "r") as chk:
        m2 = chk.load_mesh("ext")
    assert m2._extruded and m2._layers == 3
    assert m2._base_mesh.name == "base"
    assert m2.num_cells == mesh.num_cells


def test_vom_roundtrip(tmp_path):
    path = str(tmp_path / "chk.h5")
    mesh = UnitSquareMesh(4, 4, name="m")
    pts = np.array([[0.21, 0.31], [0.62, 0.44], [0.9, 0.1]])
    vom = VertexOnlyMesh(mesh, pts, name="vom")
    with CheckpointFile(path, "w") as chk:
        chk.save_mesh(vom)
    with CheckpointFile(path, "r") as chk:
        v2 = chk.load_mesh("vom")
    assert v2.num_cells == vom.num_cells
    assert np.allclose(v2.input_coords, pts)
    assert (v2.cells == vom.cells).all()
