"""Matplotlib plotting helpers (reference: firedrake/pyplot/mpl.py —
triplot :130, tripcolor :439, tricontour/tricontourf :402, trisurf :524,
quiver :638, plot (1D) :1040).

Functions are sampled at mesh vertices (P1 interpolation) — matplotlib's
triangulation API is vertex-based.  Quadrilateral cells split into two
triangles for rendering."""
from __future__ import annotations

import numpy as np

__all__ = ["triplot", "tripcolor", "tricontour", "tricontourf",
           "trisurf", "quiver", "plot"]


def _mpl():
    import matplotlib.pyplot as plt
    return plt


def _triangulation(mesh):
    from matplotlib.tri import Triangulation
    cv = np.asarray(mesh.topology.cell_vertices)
    x = mesh._vertex_coords
    if mesh.cell.name == "triangle":
        tris = cv
    elif mesh.cell.name == "quadrilateral":
        # tensor-product corner order (v00, v10, v01, v11)
        tris = np.concatenate([cv[:, [0, 1, 3]], cv[:, [0, 3, 2]]])
    else:
        raise NotImplementedError(
            f"plotting {mesh.cell.name} meshes (2D cells only)")
    return Triangulation(x[:, 0], x[:, 1], tris), x


def _vertex_values(f):
    """Sample a Function at mesh vertices -> (nv,) or (nv, bs)."""
    from .functionspace import FunctionSpace, VectorFunctionSpace
    from .function import Function
    V = f.function_space()
    mesh = V.mesh_obj
    nv = len(mesh._vertex_coords)
    elem = V.scalar_element
    if not (elem.family == "Lagrange" and elem.degree == 1):
        bs = int(np.prod(V.value_shape)) if V.value_shape else 1
        if bs > 1:
            P1 = VectorFunctionSpace(mesh, "CG", 1, dim=bs)
        else:
            P1 = FunctionSpace(mesh, "CG", 1)
        f = Function(P1).interpolate(f)
        V = P1
    cv = np.asarray(mesh.topology.cell_vertices)
    cnm = np.asarray(V.cell_node_map)[:, :cv.shape[1]]
    perm = np.zeros(nv, dtype=np.int64)
    perm[cv.reshape(-1)] = cnm.reshape(-1)
    dat = np.asarray(f.dat)
    bs = V.block_size
    if bs > 1:
        return dat.reshape(-1, bs)[perm]
    return dat[perm]


def triplot(mesh, axes=None, **kwargs):
    """Draw the mesh edges."""
    plt = _mpl()
    axes = axes or plt.gca()
    if mesh.geometric_dimension == 1:
        x = mesh._vertex_coords[:, 0]
        axes.plot(x, np.zeros_like(x), "o-", **kwargs)
        return []
    tri, _ = _triangulation(mesh)
    return axes.triplot(tri, **kwargs)


def _scalar_plot(method, f, axes=None, **kwargs):
    plt = _mpl()
    axes = axes or plt.gca()
    mesh = f.function_space().mesh_obj
    tri, _ = _triangulation(mesh)
    vals = _vertex_values(f)
    if vals.ndim > 1:
        vals = np.linalg.norm(vals, axis=1)   # magnitude, like firedrake
    return getattr(axes, method)(tri, vals, **kwargs)


def tripcolor(f, axes=None, **kwargs):
    kwargs.setdefault("shading", "gouraud")
    return _scalar_plot("tripcolor", f, axes, **kwargs)


def tricontour(f, axes=None, **kwargs):
    return _scalar_plot("tricontour", f, axes, **kwargs)


def tricontourf(f, axes=None, **kwargs):
    return _scalar_plot("tricontourf", f, axes, **kwargs)


def trisurf(f, axes=None, **kwargs):
    """3D surface plot of a 2D scalar field (or a manifold mesh)."""
    plt = _mpl()
    if axes is None:
        fig = plt.gcf()
        axes = fig.add_subplot(projection="3d")
    mesh = f.function_space().mesh_obj
    vals = _vertex_values(f)
    if vals.ndim > 1:
        vals = np.linalg.norm(vals, axis=1)
    if mesh.geometric_dimension == 3:
        from matplotlib.tri import Triangulation
        cv = np.asarray(mesh.topology.cell_vertices)
        x = mesh._vertex_coords
        tris = cv if mesh.cell.name == "triangle" else \
            np.concatenate([cv[:, [0, 1, 3]], cv[:, [0, 3, 2]]])
        tri = Triangulation(x[:, 0], x[:, 1], tris)
        return axes.plot_trisurf(tri, x[:, 2], **kwargs)
    tri, _ = _triangulation(mesh)
    return axes.plot_trisurf(tri, vals, **kwargs)


def quiver(f, axes=None, **kwargs):
    """Arrow plot of a 2D vector field."""
    plt = _mpl()
    axes = axes or plt.gca()
    mesh = f.function_space().mesh_obj
    vals = _vertex_values(f)
    if vals.ndim != 2 or vals.shape[1] != 2:
        raise ValueError("quiver needs a 2-vector field")
    x = mesh._vertex_coords
    return axes.quiver(x[:, 0], x[:, 1], vals[:, 0], vals[:, 1],
                       **kwargs)


def plot(f, axes=None, **kwargs):
    """Line plot of a 1D Function."""
    plt = _mpl()
    axes = axes or plt.gca()
    mesh = f.function_space().mesh_obj
    if mesh.geometric_dimension != 1:
        raise ValueError("plot() is for 1D functions; use tripcolor/"
                         "trisurf in 2D")
    x = mesh._vertex_coords[:, 0]
    vals = _vertex_values(f)
    order = np.argsort(x)
    return axes.plot(x[order], vals[order], **kwargs)
