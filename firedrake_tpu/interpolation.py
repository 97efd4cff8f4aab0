"""Nodal interpolation (reference: firedrake/interpolation.py:209/:667
SameMeshInterpolator via TSFC dual evaluation).  For the Lagrange family the
dual basis is point evaluation at element nodes, so interpolation =
evaluate the expression at each cell's node points and scatter.

Cross-mesh interpolation (VertexOnlyMesh point location) lands later."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .language.core import Expr, Argument
from .compiler.preprocess import push_grad
from .compiler.lowering import PointsContext, Lowerer
from .function import Function

_interp_cache: dict = {}


def _build(expr: Expr, V):
    mesh = V.mesh_obj
    gdim = mesh.geometric_dimension
    scalar = V.scalar_element
    pts = scalar.nodes                       # (npts, tdim)
    integrand = push_grad(expr)
    from .language.core import Coefficient, ConstantBase
    coeffs = tuple(sorted({t.count: t for t in integrand.traverse()
                           if isinstance(t, Coefficient)}.values(),
                          key=lambda c: c.count))
    consts = tuple(sorted({t.count: t for t in integrand.traverse()
                           if isinstance(t, ConstantBase)}.values(),
                          key=lambda c: c.count))
    if any(isinstance(t, Argument) for t in integrand.traverse()):
        raise ValueError("cannot interpolate an expression with arguments")

    def kern(coords_e, ws, cvs):
        ctx = PointsContext(mesh, pts, coords_e)
        low = Lowerer(ctx, None, None,
                      {c.count: w for c, w in zip(coeffs, ws)},
                      {c.count: v for c, v in zip(consts, cvs)})
        v = low.eval(integrand, None)        # (1, 1, npts') + vs
        # constant subexpressions keep a size-1 point axis: broadcast
        return jnp.broadcast_to(v[0, 0], (len(pts),) + integrand.shape)

    coords_space = mesh.coordinates.function_space()
    cmap3 = jnp.asarray(coords_space.cell_dof_map.reshape(
        mesh.num_cells, -1, gdim))
    coeff_maps = {c.count: jnp.asarray(c.space.cell_dof_map)
                  for c in coeffs}
    target_map = jnp.asarray(V.cell_dof_map)     # (ncell, npts*bs)
    bs = V.block_size

    def run(coords_dat, coeff_dats, const_vals):
        ce = coords_dat[cmap3]
        ws = tuple(coeff_dats[c.count][coeff_maps[c.count]]
                   for c in coeffs)
        cvs = tuple(const_vals[c.count] for c in consts)
        vals = jax.vmap(lambda c, *w: kern(c, w, cvs))(ce, *ws)
        # vals: (ncell, npts) + value_shape; flatten components node-major
        vals = vals.reshape(vals.shape[0], -1)
        out = jnp.zeros(V.dim)
        out = out.at[target_map.reshape(-1)].set(vals.reshape(-1))
        return out

    jit_run = jax.jit(run)
    return jit_run, coeffs, consts


def interpolate_onto(expr, f: Function):
    expr = _as_expr_checked(expr, f.space)
    V = f.space
    key = (expr.signature(), id(V.mesh_obj), hash(V.element),
           tuple(id(c) for c in _expr_coeffs(expr)))
    if key not in _interp_cache:
        _interp_cache[key] = _build(expr, V)
    run, coeffs, consts = _interp_cache[key]
    coords_dat = jnp.asarray(V.mesh_obj.coordinates.dat)
    coeff_dats = {c.count: jnp.asarray(c.dat) for c in coeffs}
    const_vals = {c.count: jnp.asarray(c.values()) for c in consts}
    f.dat = run(coords_dat, coeff_dats, const_vals)
    return f


def _expr_coeffs(expr):
    from .language.core import Coefficient
    return tuple(sorted({t.count: t for t in expr.traverse()
                         if isinstance(t, Coefficient)}.values(),
                        key=lambda c: c.count))


def _as_expr_checked(expr, V):
    from .language.core import as_expr
    expr = as_expr(expr)
    if expr.shape != tuple(V.value_shape):
        raise ValueError(f"expression shape {expr.shape} != space value "
                         f"shape {tuple(V.value_shape)}")
    return expr


def interpolate(expr, V, **kwargs):
    """Eager interpolation returning a Function (classic Firedrake API)."""
    if isinstance(V, Function):
        return interpolate_onto(expr, V)
    f = Function(V)
    return interpolate_onto(expr, f)


class Interpolator:
    """Reusable interpolator (reference: interpolation.py Interpolator)."""

    def __init__(self, expr, V):
        self.expr = expr
        self.V = V

    def interpolate(self, output=None):
        f = output or Function(self.V)
        return interpolate_onto(self.expr, f)
