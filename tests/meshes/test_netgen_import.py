"""Netgen mesh import (reference: firedrake/netgen.py FiredrakeMesh).
The netgen package is not in the image, so the converter is exercised
through netgen's documented duck-typed surface — Coordinates(),
Elements2D()/Elements3D() with 1-based vertex PointIds and region
indices — which is exactly what a real netgen.meshing.Mesh exposes."""
import numpy as np
import pytest

from firedrake_tpu import (Mesh, FunctionSpace, Function, TrialFunction,
                           TestFunction, SpatialCoordinate, DirichletBC,
                           dx, ds, inner, grad, solve, assemble,
                           errornorm)


class _El:
    def __init__(self, verts, index=1):
        self.vertices = [v + 1 for v in verts]    # netgen is 1-based
        self.index = index


class _FakeNetgenMesh2D:
    """Unit square, two regions, marked boundary segments."""

    dim = 2

    def __init__(self, n=4):
        xs = np.linspace(0, 1, n + 1)
        X, Y = np.meshgrid(xs, xs, indexing="ij")
        self._pts = np.stack([X.ravel(), Y.ravel()], axis=1)
        vid = lambda i, j: i * (n + 1) + j
        self._els = []
        for i in range(n):
            for j in range(n):
                a, b = vid(i, j), vid(i + 1, j)
                c, d = vid(i + 1, j + 1), vid(i, j + 1)
                region = 1 if (i + 0.5) / n < 0.5 else 2
                self._els.append(_El([a, b, c], region))
                self._els.append(_El([a, c, d], region))
        self._bels = []
        for j in range(n):                       # x == 0 edge: index 4
            self._bels.append(_El([vid(0, j), vid(0, j + 1)], 4))
        for j in range(n):                       # x == 1 edge: index 2
            self._bels.append(_El([vid(n, j), vid(n, j + 1)], 2))

    def Coordinates(self):
        return self._pts

    def Elements2D(self):
        return self._els

    def Elements1D(self):
        return self._bels


def test_netgen_2d_import_and_solve():
    ng = _FakeNetgenMesh2D(4)
    mesh = Mesh(ng)
    assert mesh.cell.name == "triangle"
    assert mesh.num_cells == 32
    # region markers usable as dx(i)
    one = Function(FunctionSpace(mesh, "DG", 0)).assign(1.0)
    a1 = float(assemble(one * dx(1)))
    a2 = float(assemble(one * dx(2)))
    assert abs(a1 - 0.5) < 1e-12 and abs(a2 - 0.5) < 1e-12
    # boundary markers usable as ds(i)
    s4 = float(assemble(one * ds(4)))
    s2 = float(assemble(one * ds(2)))
    assert abs(s4 - 1.0) < 1e-12 and abs(s2 - 1.0) < 1e-12
    # end-to-end solve with a marked-boundary BC
    V = FunctionSpace(mesh, "CG", 1)
    x, y = SpatialCoordinate(mesh)
    g = Function(V).interpolate(x)
    u, v = TrialFunction(V), TestFunction(V)
    uh = Function(V)
    solve(inner(grad(u), grad(v)) * dx == inner(0.0 * x, v) * dx, uh,
          bcs=[DirichletBC(V, 0.0, (4,)), DirichletBC(V, 1.0, (2,))],
          solver_parameters={"ksp_type": "cg", "ksp_rtol": 1e-12,
                             "pc_type": "jacobi"})
    assert errornorm(x, uh) < 1e-10     # harmonic in x with those BCs


class _FakeNetgenMesh3D:
    dim = 3

    def __init__(self):
        # one unit tet + one mirrored tet sharing a face
        self._pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                              [0, 0, 1], [1, 1, 1.0]])
        self._els = [_El([0, 1, 2, 3]), _El([1, 2, 3, 4], 2)]

    def Coordinates(self):
        return self._pts

    def Elements3D(self):
        return self._els

    def Elements2D(self):
        return []


def test_netgen_3d_import():
    mesh = Mesh(_FakeNetgenMesh3D())
    assert mesh.cell.name == "tetrahedron"
    assert mesh.num_cells == 2
    one = Function(FunctionSpace(mesh, "DG", 0)).assign(1.0)
    vol = float(assemble(one * dx))
    assert vol > 0
    assert hasattr(mesh, "cell_markers")
