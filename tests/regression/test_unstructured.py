"""H(div)/H(curl) orientation machinery on a genuinely UNSTRUCTURED
(Delaunay) mesh — structured grids can mask sign/orientation bugs."""
import math

import numpy as np
from scipy.spatial import Delaunay

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, MixedFunctionSpace, Function,
                           TrialFunctions, TestFunctions,
                           SpatialCoordinate, FacetNormal, inner, dot,
                           div, curl, jump, dx, ds, dS, solve, sin, cos,
                           as_vector, assemble, errornorm, project)
from firedrake_tpu.mesh.topology import MeshTopology
from firedrake_tpu.mesh.geometry import Mesh as MeshClass


def _delaunay_unit_square(seed=3, n=12, ninner=140):
    rng = np.random.RandomState(seed)
    bx = np.linspace(0, 1, n)
    bdry = np.vstack([np.c_[bx, np.zeros(n)], np.c_[bx, np.ones(n)],
                      np.c_[np.zeros(n - 2), bx[1:-1]],
                      np.c_[np.ones(n - 2), bx[1:-1]]])
    pts = np.vstack([bdry, rng.rand(ninner, 2) * 0.9 + 0.05])
    tri = Delaunay(pts)
    topo = MeshTopology(tri.simplices.astype(np.int32), len(pts),
                        "triangle", "unstruct")
    return MeshClass(topo, pts, name="unstruct")


def test_hdiv_continuity_unstructured():
    mesh = _delaunay_unit_square()
    X = SpatialCoordinate(mesh)
    expr = as_vector([sin(X[0]) * X[1] ** 2, X[0] ** 3 + cos(X[1])])
    f = project(expr, FunctionSpace(mesh, "RT", 2))
    nrm = FacetNormal(mesh)
    assert assemble(jump(f, nrm) ** 2 * dS) < 1e-20
    fc = project(expr, FunctionSpace(mesh, "N1curl", 2))
    t = as_vector([-nrm[1], nrm[0]])
    assert abs(assemble(curl(fc) * dx)
               - assemble(dot(fc, t) * ds)) < 1e-8


def test_hybridization_unstructured():
    mesh = _delaunay_unit_square()
    X = SpatialCoordinate(mesh)
    S = FunctionSpace(mesh, "RT", 1)
    Q = FunctionSpace(mesh, "DG", 0)
    W = MixedFunctionSpace([S, Q])
    sigma, u = TrialFunctions(W)
    tau, v = TestFunctions(W)
    f = Function(Q).interpolate(
        2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1]))
    a = (dot(sigma, tau) - u * div(tau) - div(sigma) * v) * dx
    L = -inner(f, v) * dx
    wh, wr = Function(W), Function(W)
    solve(a == L, wh, solver_parameters={
        "ksp_type": "preonly", "pc_type": "hybridization"})
    solve(a == L, wr, solver_parameters={
        "ksp_type": "preonly", "pc_type": "lu"})
    assert np.abs(np.asarray(wh.subfunctions[1].dat)
                  - np.asarray(wr.subfunctions[1].dat)).max() < 1e-10
