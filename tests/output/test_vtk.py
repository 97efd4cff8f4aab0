

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
