"""Quadrature rules on reference cells.

Role of FIAT quadrature + TSFC's rule selection (reference:
tsfc/kernel_interface/common.py:305-360 picks the rule from the estimated
polynomial degree). Rules are host-side numpy constants baked into kernels.

Simplex rules use conical (Duffy/collapsed) Gauss-Jacobi products — exact
for any requested degree, at the price of slightly more points than optimal
symmetric rules. Tensor-product cells use Gauss-Legendre products.
"""
from __future__ import annotations

import numpy as np
from dataclasses import dataclass
from functools import lru_cache

from .reference_cell import ReferenceCell, by_name


@dataclass(frozen=True)
class QuadratureRule:
    cell_name: str
    degree: int
    points: np.ndarray    # (nq, dim)
    weights: np.ndarray   # (nq,)

    @property
    def num_points(self):
        return len(self.weights)


def _gauss_legendre_01(n):
    """n-point Gauss-Legendre on [0,1]."""
    x, w = np.polynomial.legendre.leggauss(n)
    return (x + 1) / 2, w / 2


def _gauss_jacobi_01(n, alpha):
    """n-point Gauss-Jacobi with weight (1-x)^alpha, mapped to [0,1]."""
    from scipy.special import roots_jacobi
    x, w = roots_jacobi(n, alpha, 0.0)
    # on [-1,1] with weight (1-x)^alpha; map to [0,1]:
    # ∫_0^1 (1-t)^alpha f(t) dt = (1/2)^(alpha+1) ∫_-1^1 (1-x)^alpha f((x+1)/2) dx
    return (x + 1) / 2, w * 0.5 ** (alpha + 1)


@lru_cache(maxsize=None)
def make_quadrature(cell_name: str, degree: int) -> QuadratureRule:
    """A rule exact for polynomials of (total) degree ``degree``."""
    degree = max(int(degree), 0)
    cell = by_name(cell_name)
    n = degree // 2 + 1   # GL points exact to 2n-1

    if cell.name == "point":
        return QuadratureRule(cell_name, degree,
                              np.zeros((1, 0)), np.ones(1))
    if cell.name == "interval":
        x, w = _gauss_legendre_01(n)
        return QuadratureRule(cell_name, degree, x[:, None], w)
    if cell.name == "quadrilateral":
        x, w = _gauss_legendre_01(n)
        X, Y = np.meshgrid(x, x, indexing="ij")
        W = np.outer(w, w)
        pts = np.stack([X.ravel(), Y.ravel()], axis=1)
        return QuadratureRule(cell_name, degree, pts, W.ravel())
    if cell.name == "hexahedron":
        x, w = _gauss_legendre_01(n)
        X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
        W = np.einsum("i,j,k->ijk", w, w, w)
        pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)
        return QuadratureRule(cell_name, degree, pts, W.ravel())
    if cell.name == "triangle":
        # Duffy: (x,y) = (u(1-v̂)...) — use conical product:
        # ∫_T f = ∫_0^1 ∫_0^1 f(u(1-v), v) (1-v) du dv
        u, wu = _gauss_legendre_01(n)
        v, wv = _gauss_jacobi_01(n, 1.0)   # weight (1-v)
        U, V = np.meshgrid(u, v, indexing="ij")
        pts = np.stack([(U * (1 - V)).ravel(), V.ravel()], axis=1)
        W = np.outer(wu, wv).ravel()
        return QuadratureRule(cell_name, degree, pts, W)
    if cell.name == "prism":
        tq = make_quadrature("triangle", degree)
        zq = make_quadrature("interval", degree)
        pts = np.concatenate([
            np.repeat(tq.points, len(zq.points), axis=0),
            np.tile(zq.points, (len(tq.points), 1)),
        ], axis=1)
        W = np.outer(tq.weights, zq.weights).ravel()
        return QuadratureRule(cell_name, degree, pts, W)
    if cell.name == "tetrahedron":
        # conical product: x = u(1-v)(1-w), y = v(1-w), z = w
        u, wu = _gauss_legendre_01(n)
        v, wv = _gauss_jacobi_01(n, 1.0)
        w_, ww = _gauss_jacobi_01(n, 2.0)
        U, V, Wq = np.meshgrid(u, v, w_, indexing="ij")
        pts = np.stack([
            (U * (1 - V) * (1 - Wq)).ravel(),
            (V * (1 - Wq)).ravel(),
            Wq.ravel(),
        ], axis=1)
        W = np.einsum("i,j,k->ijk", wu, wv, ww).ravel()
        return QuadratureRule(cell_name, degree, pts, W)
    raise NotImplementedError(cell_name)
