"""Exodus II and CGNS mesh readers (reference: firedrake/mesh.py:376-461
reads both through DMPlex; fixtures written in-test with scipy/h5py)."""
import numpy as np
import pytest

from firedrake_tpu import (Mesh, FunctionSpace, Function, TestFunction,
                           TrialFunction, SpatialCoordinate, Constant,
                           DirichletBC, inner, grad, dx, ds, solve,
                           errornorm, assemble)


# ---------------------------------------------------------------- exodus

def _write_exodus_square(path):
    """Unit square, 5 nodes, 4 TRI3 cells in two blocks (ids 7, 8),
    4 side sets (ids 10, 20, 30, 40) on the boundary edges."""
    from scipy.io import netcdf_file
    nc = netcdf_file(str(path), "w")
    nc.createDimension("num_dim", 2)
    nc.createDimension("num_nodes", 5)
    nc.createDimension("num_elem", 4)
    nc.createDimension("num_el_blk", 2)
    nc.createDimension("num_side_sets", 4)
    nc.createDimension("num_el_in_blk1", 2)
    nc.createDimension("num_nod_per_el1", 3)
    nc.createDimension("num_el_in_blk2", 2)
    nc.createDimension("num_nod_per_el2", 3)
    for s in range(1, 5):
        nc.createDimension(f"num_side_ss{s}", 1)
    x = nc.createVariable("coordx", "d", ("num_nodes",))
    y = nc.createVariable("coordy", "d", ("num_nodes",))
    x[:] = [0.0, 1.0, 1.0, 0.0, 0.5]
    y[:] = [0.0, 0.0, 1.0, 1.0, 0.5]
    eb = nc.createVariable("eb_prop1", "i", ("num_el_blk",))
    eb[:] = [7, 8]
    c1 = nc.createVariable("connect1", "i",
                           ("num_el_in_blk1", "num_nod_per_el1"))
    c1.elem_type = "TRI3"
    c1[:] = [[1, 2, 5], [2, 3, 5]]
    c2 = nc.createVariable("connect2", "i",
                           ("num_el_in_blk2", "num_nod_per_el2"))
    c2.elem_type = "TRI3"
    c2[:] = [[3, 4, 5], [4, 1, 5]]
    sp = nc.createVariable("ss_prop1", "i", ("num_side_sets",))
    sp[:] = [10, 20, 30, 40]
    # global element ids are 1-based across blocks; each boundary edge
    # is local side 1 (nodes 1-2) of its triangle
    for s, elem in zip(range(1, 5), [1, 2, 3, 4]):
        ev = nc.createVariable(f"elem_ss{s}", "i", (f"num_side_ss{s}",))
        sv = nc.createVariable(f"side_ss{s}", "i", (f"num_side_ss{s}",))
        ev[:] = [elem]
        sv[:] = [1]
    nc.close()


def _write_exodus_hex(path):
    """One HEX8 unit cube with a side set (id 5) on the bottom face."""
    from scipy.io import netcdf_file
    nc = netcdf_file(str(path), "w")
    nc.createDimension("num_dim", 3)
    nc.createDimension("num_nodes", 8)
    nc.createDimension("num_elem", 1)
    nc.createDimension("num_el_blk", 1)
    nc.createDimension("num_side_sets", 1)
    nc.createDimension("num_el_in_blk1", 1)
    nc.createDimension("num_nod_per_el1", 8)
    nc.createDimension("num_side_ss1", 1)
    # exodus hex: bottom CCW then top CCW
    xyz = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]],
                   dtype=float)
    for k, nm in enumerate(("coordx", "coordy", "coordz")):
        v = nc.createVariable(nm, "d", ("num_nodes",))
        v[:] = xyz[:, k]
    c1 = nc.createVariable("connect1", "i",
                           ("num_el_in_blk1", "num_nod_per_el1"))
    c1.elem_type = "HEX8"
    c1[:] = [[1, 2, 3, 4, 5, 6, 7, 8]]
    sp = nc.createVariable("ss_prop1", "i", ("num_side_sets",))
    sp[:] = [5]
    ev = nc.createVariable("elem_ss1", "i", ("num_side_ss1",))
    sv = nc.createVariable("side_ss1", "i", ("num_side_ss1",))
    ev[:] = [1]
    sv[:] = [5]          # exodus hex side 5 = bottom
    nc.close()


@pytest.fixture
def square_exo(tmp_path):
    p = tmp_path / "square.exo"
    _write_exodus_square(p)
    return str(p)


def test_exodus_measure_and_tags(square_exo):
    mesh = Mesh(square_exo)
    assert mesh.num_cells == 4
    assert abs(assemble(Constant(1.0) * dx(domain=mesh)) - 1.0) < 1e-12
    for tag in (10, 20, 30, 40):
        assert abs(assemble(Constant(1.0) * ds(tag, domain=mesh))
                   - 1.0) < 1e-12
    assert abs(assemble(Constant(1.0) * dx(7, domain=mesh)) - 0.5) < 1e-12
    assert abs(assemble(Constant(1.0) * dx(8, domain=mesh)) - 0.5) < 1e-12


def test_exodus_solve(square_exo):
    mesh = Mesh(square_exo)
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


def test_exodus_hex(tmp_path):
    p = tmp_path / "cube.e"
    _write_exodus_hex(p)
    mesh = Mesh(str(p))
    assert mesh.num_cells == 1
    assert abs(assemble(Constant(1.0) * dx(domain=mesh)) - 1.0) < 1e-12
    assert abs(assemble(Constant(1.0) * ds(5, domain=mesh)) - 1.0) < 1e-12


# ------------------------------------------------------------------ cgns

def _cgns_node(parent, name, label, data=None):
    g = parent.create_group(name)
    g.attrs["name"] = np.bytes_(name)
    g.attrs["label"] = np.bytes_(label)
    if data is not None:
        g.create_dataset(" data", data=data)
    return g


def _write_cgns_square(path):
    """Unit square, 5 nodes / 4 TRI_3 cells + 4 BAR_2 boundary edges,
    four BC_t nodes (facet tags 1..4 by BC order)."""
    import h5py
    with h5py.File(str(path), "w") as f:
        base = _cgns_node(f, "Base", "CGNSBase_t",
                          np.array([2, 2], dtype=np.int32))
        zone = _cgns_node(base, "Zone", "Zone_t",
                          np.array([[5, 4, 0]], dtype=np.int32))
        _cgns_node(zone, "ZoneType", "ZoneType_t",
                   np.frombuffer(b"Unstructured", dtype=np.int8))
        gc = _cgns_node(zone, "GridCoordinates", "GridCoordinates_t")
        _cgns_node(gc, "CoordinateX", "DataArray_t",
                   np.array([0.0, 1.0, 1.0, 0.0, 0.5]))
        _cgns_node(gc, "CoordinateY", "DataArray_t",
                   np.array([0.0, 0.0, 1.0, 1.0, 0.5]))
        tri = _cgns_node(zone, "TriElements", "Elements_t",
                         np.array([5, 0], dtype=np.int32))
        _cgns_node(tri, "ElementRange", "IndexRange_t",
                   np.array([1, 4], dtype=np.int32))
        _cgns_node(tri, "ElementConnectivity", "DataArray_t",
                   np.array([1, 2, 5, 2, 3, 5, 3, 4, 5, 4, 1, 5],
                            dtype=np.int32))
        bar = _cgns_node(zone, "EdgeElements", "Elements_t",
                         np.array([3, 0], dtype=np.int32))
        _cgns_node(bar, "ElementRange", "IndexRange_t",
                   np.array([5, 8], dtype=np.int32))
        _cgns_node(bar, "ElementConnectivity", "DataArray_t",
                   np.array([1, 2, 2, 3, 3, 4, 4, 1], dtype=np.int32))
        zbc = _cgns_node(zone, "ZoneBC", "ZoneBC_t")
        for i, nm in enumerate(("bottom", "right", "top", "left")):
            bc = _cgns_node(zbc, nm, "BC_t",
                            np.frombuffer(b"BCDirichlet", dtype=np.int8))
            _cgns_node(bc, "PointRange", "IndexRange_t",
                       np.array([5 + i, 5 + i], dtype=np.int32))


@pytest.fixture
def square_cgns(tmp_path):
    pytest.importorskip("h5py")
    p = tmp_path / "square.cgns"
    _write_cgns_square(p)
    return str(p)


def test_cgns_measure_and_tags(square_cgns):
    mesh = Mesh(square_cgns)
    assert mesh.num_cells == 4
    assert abs(assemble(Constant(1.0) * dx(domain=mesh)) - 1.0) < 1e-12
    for tag in (1, 2, 3, 4):
        assert abs(assemble(Constant(1.0) * ds(tag, domain=mesh))
                   - 1.0) < 1e-12


def test_cgns_solve(square_cgns):
    mesh = Mesh(square_cgns)
    V = FunctionSpace(mesh, "CG", 2)
    X = SpatialCoordinate(mesh)
    u, v = TrialFunction(V), TestFunction(V)
    uh = Function(V)
    solve(inner(grad(u), grad(v)) * dx == inner(Constant(0.0), v) * dx,
          uh, bcs=[DirichletBC(V, 0.0, 1), DirichletBC(V, 1.0, 3),
                   DirichletBC(V, Function(V).interpolate(X[1]),
                               (2, 4))],
          solver_parameters={"ksp_type": "cg", "pc_type": "jacobi",
                             "ksp_rtol": 1e-12})
    assert errornorm(X[1], uh) < 1e-9
