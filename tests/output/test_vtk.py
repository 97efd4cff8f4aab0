

def test_quadratic_vtk_cells(tmp_path):
    """Degree-2 fields write VTK_QUADRATIC_TRIANGLE cells with exact
    nodal values (reference: firedrake high-order Lagrange VTK cells)."""
    import base64
    import re
    import struct
    import numpy as np
    from firedrake_tpu import (UnitSquareMesh, FunctionSpace, Function,
                               SpatialCoordinate, VTKFile)
    mesh = UnitSquareMesh(3, 3)
    V2 = FunctionSpace(mesh, "CG", 2)
    X = SpatialCoordinate(mesh)
    f = Function(V2, name="u").interpolate(X[0] ** 2 + X[1])
    out = VTKFile(str(tmp_path / "q.pvd"))
    out.write(f)
    vtu = (tmp_path / "q_0.vtu").read_text()

    def arr(name, dtype):
        m = re.search(rf'Name="{name}"[^>]*format="binary">\s*'
                      r'([A-Za-z0-9+/=]+)', vtu)
        raw = base64.b64decode(m.group(1))
        n = struct.unpack("<I", raw[:4])[0]
        return np.frombuffer(raw[4:4 + n], dtype=dtype)

    assert set(arr("types", np.uint8).tolist()) == {22}
    m = re.search(r'<Points><DataArray[^>]*>\s*([A-Za-z0-9+/=]+)', vtu)
    raw = base64.b64decode(m.group(1))
    n = struct.unpack("<I", raw[:4])[0]
    pts = np.frombuffer(raw[4:4 + n], dtype=np.float64).reshape(-1, 3)
    vals = arr("u", np.float64)
    assert np.abs(vals - (pts[:, 0] ** 2 + pts[:, 1])).max() < 1e-12


def test_vtk_lagrange_lattice_structure():
    """VTK Lagrange lattices: right count, unique full coverage,
    vertices first (io/vtk_lagrange.py; reference
    output/paraview_reordering.py via the vtk package)."""
    import numpy as np
    from math import comb
    from firedrake_tpu.io.vtk_lagrange import vtk_lattice
    cases = [("triangle", 3, comb(5, 2)), ("triangle", 6, comb(8, 2)),
             ("tetrahedron", 3, comb(6, 3)),
             ("tetrahedron", 5, comb(8, 3)),
             ("quadrilateral", 4, 25), ("hexahedron", 3, 64),
             ("interval", 5, 6)]
    verts = {"triangle": [(0, 0), (1, 0), (0, 1)],
             "tetrahedron": [(0, 0, 0), (1, 0, 0), (0, 1, 0),
                             (0, 0, 1)],
             "quadrilateral": [(0, 0), (1, 0), (1, 1), (0, 1)],
             "hexahedron": [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
                            (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)],
             "interval": [(0,), (1,)]}
    for cell, d, n in cases:
        pts = vtk_lattice(cell, d)
        assert len(pts) == n, (cell, d)
        keys = {tuple(np.round(p * d).astype(int)) for p in pts}
        assert len(keys) == n, (cell, d)
        for i, v in enumerate(verts[cell]):
            assert np.allclose(pts[i], v), (cell, d, i)


def _read_types(vtu):
    import base64
    import numpy as np
    import xml.etree.ElementTree as ET
    tree = ET.parse(vtu)
    el = [d for d in tree.iter("DataArray") if d.get("Name") == "types"]
    raw = base64.b64decode(el[0].text.strip())
    return np.frombuffer(raw[4:], dtype=np.uint8)


def test_vtk_highorder_lagrange_cells(tmp_path):
    """Degree >= 3 fields emit VTK Lagrange cells with exact nodal
    values at the lattice points."""
    import base64
    import numpy as np
    import xml.etree.ElementTree as ET
    from firedrake_tpu import (UnitSquareMesh, FunctionSpace, Function,
                               SpatialCoordinate, VTKFile)
    mesh = UnitSquareMesh(3, 3)
    V = FunctionSpace(mesh, "CG", 4)
    x, y = SpatialCoordinate(mesh)
    f = Function(V, name="f").interpolate(x ** 3 * y)
    out = VTKFile(str(tmp_path / "p4.pvd"))
    out.write(f)
    vtu = str(tmp_path / "p4_0.vtu")
    assert set(_read_types(vtu).tolist()) == {69}
    # value check: decode points + field, compare f == x^3 y there
    tree = ET.parse(vtu)
    arrs = {d.get("Name"): d for d in tree.iter("DataArray")}
    pts = np.frombuffer(base64.b64decode(
        [d for d in tree.iter("DataArray")
         if d.get("NumberOfComponents") == "3"
         and d.get("Name") is None][0].text.strip())[4:],
        dtype=np.float64).reshape(-1, 3)
    vals = np.frombuffer(base64.b64decode(
        arrs["f"].text.strip())[4:], dtype=np.float64)
    assert np.allclose(vals, pts[:, 0] ** 3 * pts[:, 1], atol=1e-12)


def test_vtk_highorder_tet_cells(tmp_path):
    from firedrake_tpu import (UnitCubeMesh, FunctionSpace, Function,
                               SpatialCoordinate, VTKFile)
    mesh = UnitCubeMesh(2, 2, 2)
    V = FunctionSpace(mesh, "DG", 3)
    x, y, z = SpatialCoordinate(mesh)
    g = Function(V, name="g").interpolate(x * y * z)
    out = VTKFile(str(tmp_path / "t3.pvd"))
    out.write(g)
    assert set(_read_types(str(tmp_path / "t3_0.vtu")).tolist()) == {71}
