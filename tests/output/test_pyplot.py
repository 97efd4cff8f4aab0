"""Plotting helpers (reference: firedrake/pyplot/mpl.py; smoke-rendered
to an Agg canvas)."""
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from firedrake_tpu import (FunctionSpace, VectorFunctionSpace, Function,
                           SpatialCoordinate, UnitSquareMesh,
                           UnitIntervalMesh, as_vector, sin)
from firedrake_tpu.pyplot import (triplot, tripcolor, tricontourf,
                                  trisurf, quiver, plot)


def test_plot_2d_scalar_and_mesh(tmp_path):
    mesh = UnitSquareMesh(4, 4)
    X = SpatialCoordinate(mesh)
    f = Function(FunctionSpace(mesh, "CG", 2)).interpolate(
        sin(X[0]) * X[1])
    fig, ax = plt.subplots()
    triplot(mesh, axes=ax)
    c = tripcolor(f, axes=ax)
    fig.colorbar(c)
    fig.savefig(tmp_path / "p.png")
    plt.close(fig)
    fig, ax = plt.subplots()
    tricontourf(f, axes=ax)
    fig.savefig(tmp_path / "c.png")
    plt.close(fig)


def test_plot_quad_mesh(tmp_path):
    mesh = UnitSquareMesh(3, 3, quadrilateral=True)
    X = SpatialCoordinate(mesh)
    f = Function(FunctionSpace(mesh, "Q", 1)).interpolate(X[0] + X[1])
    fig, ax = plt.subplots()
    tripcolor(f, axes=ax)
    fig.savefig(tmp_path / "q.png")
    plt.close(fig)


def test_quiver_and_trisurf(tmp_path):
    mesh = UnitSquareMesh(4, 4)
    X = SpatialCoordinate(mesh)
    v = Function(VectorFunctionSpace(mesh, "CG", 1, dim=2)).interpolate(
        as_vector([-X[1], X[0]]))
    fig, ax = plt.subplots()
    quiver(v, axes=ax)
    fig.savefig(tmp_path / "v.png")
    plt.close(fig)
    fig = plt.figure()
    f = Function(FunctionSpace(mesh, "CG", 1)).interpolate(X[0] * X[1])
    trisurf(f)
    fig.savefig(tmp_path / "s.png")
    plt.close(fig)


def test_plot_1d(tmp_path):
    mesh = UnitIntervalMesh(10)
    X = SpatialCoordinate(mesh)
    f = Function(FunctionSpace(mesh, "CG", 1)).interpolate(sin(X[0]))
    fig, ax = plt.subplots()
    plot(f, axes=ax)
    fig.savefig(tmp_path / "l.png")
    plt.close(fig)
