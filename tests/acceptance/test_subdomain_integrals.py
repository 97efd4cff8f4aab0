"""Acceptance port of reference
tests/firedrake/regression/test_subdomain_integrals.py (round-5
directive 8): overlapping subdomain measures, cell-set solves, and
additivity of matrices assembled per-subdomain.  Adaptation: the
cell-sets.msh / square.msh fixtures are generated in-test as gmsh v2.2
content with the same region structure (two tagged cell regions;
tagged boundary edges)."""
import numpy as np
import pytest
from functools import reduce

from firedrake_tpu import *


def test_overlap_subdomain_facets():
    m = UnitSquareMesh(10, 10)

    c = Constant(1)

    f = assemble(c * (ds(1, domain=m) + ds(domain=m)))

    assert np.allclose(f, 5.0)


def _write_two_region_msh(path):
    """Unit square split at x=0.5 into cell regions 1 (left) and 2
    (right); boundary edges tagged 1..4 (left/right/bottom/top)."""
    nodes = []
    nid = {}
    k = 1
    for j, y in enumerate([0.0, 0.5, 1.0]):
        for i, x in enumerate([0.0, 0.25, 0.5, 0.75, 1.0]):
            nid[(i, j)] = k
            nodes.append((k, x, y))
            k += 1
    elems = []
    eid = 1
    # boundary lines: left(1) x=0, right(2) x=1, bottom(3) y=0, top(4)
    for j in range(2):
        elems.append((eid, 1, 1, nid[(0, j)], nid[(0, j+1)])); eid += 1
        elems.append((eid, 1, 2, nid[(4, j)], nid[(4, j+1)])); eid += 1
    for i in range(4):
        elems.append((eid, 1, 3, nid[(i, 0)], nid[(i+1, 0)])); eid += 1
        elems.append((eid, 1, 4, nid[(i, 2)], nid[(i+1, 2)])); eid += 1
    # triangles: region 1 for x<0.5 (i<2), region 2 otherwise
    tris = []
    for j in range(2):
        for i in range(4):
            tag = 1 if i < 2 else 2
            a, b = nid[(i, j)], nid[(i+1, j)]
            c, d = nid[(i, j+1)], nid[(i+1, j+1)]
            tris.append((eid, tag, a, b, d)); eid += 1
            tris.append((eid, tag, a, d, c)); eid += 1
    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n$Nodes\n")
        f.write(f"{len(nodes)}\n")
        for k, x, y in nodes:
            f.write(f"{k} {x} {y} 0\n")
        f.write("$EndNodes\n$Elements\n")
        f.write(f"{len(elems) + len(tris)}\n")
        for e, ph, tag, a, b in [(e, 1, t, a, b)
                                 for (e, _, t, a, b) in elems]:
            f.write(f"{e} 1 2 {tag} {tag} {a} {b}\n")
        for e, tag, a, b, c in tris:
            f.write(f"{e} 2 2 {tag} {tag} {a} {b} {c}\n")
        f.write("$EndElements\n")


@pytest.fixture
def mesh(tmp_path):
    p = tmp_path / "cell-sets.msh"
    _write_two_region_msh(str(p))
    return Mesh(str(p))


@pytest.fixture
def V(mesh):
    return FunctionSpace(mesh, "DG", 1)


@pytest.fixture
def u(V):
    return Function(V)


@pytest.fixture(params=[
    "inner(u, v) * dx + inner(u, v) * dx(2) - conj(v) * dx",
    "inner(u, v) * dx(1) + inner(u, v) * dx(2) + inner(u, v) * dx(2) - conj(v) * dx",
    "inner(u, v) * dx + inner(u, v) * dx(2) - conj(v) * dx(1) - conj(v) * dx(2)",
    "inner(u, v) * dx(1) + inner(u, v) * dx(2) + inner(u, v) * dx(2) - conj(v) * dx(1) - conj(v) * dx(2)"])
def form(request, u):
    v = TestFunction(u.function_space())  # noqa: F841
    return eval(request.param)


def test_solve_cell_subdomains(form, u):
    solve(form == 0, u)

    mesh = u.function_space().mesh()
    markers = np.asarray(mesh.cell_markers)
    vals = np.asarray(u.dat).reshape(len(markers), -1)
    assert np.allclose(vals[markers == 1], 1.0)
    assert np.allclose(vals[markers == 2], 0.5)


@pytest.fixture
def square(mesh):
    # same generated mesh: all tests only need dx(1)/ds(1)/ds(2)
    return mesh


@pytest.fixture(params=[("inner(u, v) * dx", "inner(u, v) * ds(2)"),
                        ("inner(u, v) * dx(1)", "inner(u, v) * ds(2)",
                         "inner(u, v) * dx(1)"),
                        ("inner(u, v) * dx", "inner(u, v) * ds(1)")],
                ids=lambda x: " + ".join(x))
def forms(request):
    return request.param


def test_cell_facet_subdomains(square, forms):
    from operator import add
    V = FunctionSpace(square, "CG", 1)
    v = TestFunction(V)         # noqa: F841
    u = TrialFunction(V)        # noqa: F841
    forms = list(map(eval, forms))
    full = reduce(add, forms)
    full_mat = assemble(full).M.values
    part_mat = reduce(add, map(lambda x: assemble(x).M.values, forms))
    assert np.allclose(part_mat, full_mat)
