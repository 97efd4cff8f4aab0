"""H(div) elements: Raviart-Thomas and Brezzi-Douglas-Marini (lowest
orders), plus 2D Nedelec (rotated RT) for H(curl).

Reference consumes these from FIAT (firedrake mixed-Poisson /
hybridization demos).  Construction here is moment-based: pick a spanning
polynomial set, build the dof-moment Vandermonde with quadrature, invert.

Conventions:
  * value_shape = (tdim,); reference basis maps to physical space with the
    CONTRAVARIANT Piola transform  phi = J phi_ref / detJ  (covariant
    J^{-T} phi_ref for H(curl)).
  * one dof per facet (RT1/BDM1 facet dofs x P0/P1 moments): the dof
    functional is the normal-flux moment with the facet's CANONICAL
    orientation (global normal = the one induced by sorted global vertex
    order); a cell whose outward normal disagrees contributes with sign -1
    (FunctionSpaceData.cell_dof_signs applies this, the FIAT/FInAT
    orientation-sign analogue).
"""
from __future__ import annotations

import numpy as np
from functools import lru_cache

from .finite_element import FiniteElement
from .reference_cell import by_name
from .quadrature import make_quadrature


class _MomentElement(FiniteElement):
    """Vector-valued element defined by span + moment dofs."""

    mapping = "contravariant"

    def __init__(self, cell, degree):
        if isinstance(cell, str):
            cell = by_name(cell)
        self.cell = cell
        self.degree = int(degree)
        self.value_shape = (cell.dim,)
        self._build()

    # subclasses define: _span_terms() -> list of fn(x)->(dim,) callables
    #                    _dof_functionals() -> list of fn(phi)->float
    def _build(self):
        terms = self._span_terms()
        dofs = self._dof_functionals()
        n = len(terms)
        assert len(dofs) == n, (len(dofs), n)
        V = np.zeros((n, n))
        for i, ell in enumerate(dofs):
            for j, t in enumerate(terms):
                V[i, j] = ell(t)
        self._coeffs = np.linalg.inv(V)        # basis_i = sum_j C[j,i] t_j
        self._terms = terms
        self.nodes = np.zeros((n, self.cell.dim))   # (dof points n/a)

    @property
    def ndof(self):
        return len(self._terms)

    def tabulate(self, points, order=1):
        pts = np.asarray(points, dtype=float)
        nq = len(pts)
        n = self.ndof
        d = self.cell.dim
        vals = np.zeros((nq, n, d))
        tvals = np.stack([np.array([t(p) for p in pts])
                          for t in self._terms], axis=1)  # (nq, n, d)
        vals = np.einsum("qjd,ji->qid", tvals, self._coeffs)
        out = {0: vals}
        if order >= 1:
            h = 1e-6
            grads = np.zeros((nq, n, d, d))
            for ax in range(d):
                pp = pts.copy()
                pp[:, ax] += h
                pm = pts.copy()
                pm[:, ax] -= h
                tp = np.stack([np.array([t(p) for p in pp])
                               for t in self._terms], axis=1)
                tm = np.stack([np.array([t(p) for p in pm])
                               for t in self._terms], axis=1)
                fd = (tp - tm) / (2 * h)
                grads[:, :, :, ax] = np.einsum("qjd,ji->qid", fd,
                                               self._coeffs)
            out[1] = grads
        return out

    def entity_permutation(self, dim, orientation):
        # single dof per facet: identity permutation; signs handled by
        # FunctionSpaceData via facet_dof_signs
        ed = self.entity_dofs.get(dim, {})
        n = len(ed.get(0, []))
        return np.arange(n, dtype=np.int32)

    def local_facet_sign(self, lf: int) -> float:
        """+-1: does the STORED local-facet vertex order induce the same
        direction (normal for HDiv / tangent for HCurl) as the cell's
        outward dof direction?  Composed with the orientation parity this
        gives the global continuity sign."""
        cell = self.cell
        pts = cell.vertices[list(cell.facets[lf])]
        nref = cell.facet_reference_normals[lf]
        if getattr(self, "continuity", "HDiv") == "HCurl":
            t_used = np.array([-nref[1], nref[0]])
            return float(np.sign(np.dot(pts[1] - pts[0], t_used)))
        if cell.dim == 2:
            t = pts[1] - pts[0]
            n_order = np.array([t[1], -t[0]])
            return float(np.sign(np.dot(n_order, nref)))
        n_order = np.cross(pts[1] - pts[0], pts[2] - pts[0])
        return float(np.sign(np.dot(n_order, nref)))

    def __eq__(self, other):
        return (type(self) is type(other)
                and self.cell.name == other.cell.name
                and self.degree == other.degree)

    def __hash__(self):
        return hash((type(self).__name__, self.cell.name, self.degree))

    def __repr__(self):
        return f"{type(self).__name__}({self.cell.name!r}, {self.degree})"


def _facet_quad(cell, lf, deg):
    """(points in cell ref coords, weights*|facet scale|, canonical normal,
    tangent basis) for local facet lf."""
    fc = cell.facet_cell
    q = make_quadrature(fc.name, deg)
    A, b = cell.facet_embedding(lf)
    pts = q.points @ A.T + b[None, :]
    scale = cell.facet_area_scale(lf)
    nref = cell.facet_reference_normals[lf]
    return pts, q.weights * scale, nref


class RaviartThomas(_MomentElement):
    """RT_1 on triangle/tetrahedron: span (P0)^d + x*P0; one normal-flux
    dof per facet."""

    family = "Raviart-Thomas"
    continuity = "HDiv"

    def _span_terms(self):
        d = self.cell.dim
        if self.degree != 1:
            raise NotImplementedError("RT degree > 1: next milestone")
        terms = []
        for i in range(d):
            e = np.zeros(d)
            e[i] = 1.0
            terms.append(lambda x, e=e: e)
        terms.append(lambda x: np.asarray(x, dtype=float))
        return terms

    def _dof_functionals(self):
        cell = self.cell
        out = []
        for lf in range(len(cell.facets)):
            pts, wts, nref = _facet_quad(cell, lf, 2 * self.degree + 1)

            def ell(t, pts=pts, wts=wts, nref=nref):
                vals = np.array([t(p) for p in pts])
                return float(np.sum(wts * (vals @ nref)))

            out.append(ell)
        return out

    @property
    def entity_dofs(self):
        cell = self.cell
        ed = {d: {e: [] for e in range(len(cell.topology[d]))}
              for d in cell.topology}
        for lf in range(len(cell.facets)):
            ed[cell.dim - 1][lf] = [lf]
        return ed

    @property
    def facet_dof_sign_flip(self):
        """True: facet dofs flip sign under facet orientation reversal."""
        return True


class BrezziDouglasMarini(_MomentElement):
    """BDM_1 on triangle: span (P1)^2; two normal moments (against P1 on
    the facet) per edge."""

    family = "Brezzi-Douglas-Marini"
    continuity = "HDiv"

    def _span_terms(self):
        if self.degree != 1 or self.cell.dim != 2:
            raise NotImplementedError("BDM1 on triangles only (for now)")
        terms = []
        for i in range(2):
            e = np.zeros(2)
            e[i] = 1.0
            terms.append(lambda x, e=e: e)
            terms.append(lambda x, e=e: e * x[0])
            terms.append(lambda x, e=e: e * x[1])
        return terms

    def _dof_functionals(self):
        cell = self.cell
        out = []
        for lf in range(len(cell.facets)):
            pts, wts, nref = _facet_quad(cell, lf, 2 * self.degree + 2)
            fverts = cell.vertices[list(cell.facets[lf])]
            # canonical facet parameter: s in [0,1] from facet vertex 0->1
            d = fverts[1] - fverts[0]
            s = ((pts - fverts[0]) @ d) / (d @ d)
            for mom in (lambda s: np.ones_like(s),
                        lambda s: 2 * s - 1):    # odd moment
                def ell(t, pts=pts, wts=wts, nref=nref, s=s, mom=mom):
                    vals = np.array([tt(p) for tt, p in
                                     zip([t] * len(pts), pts)])
                    return float(np.sum(wts * mom(s) * (vals @ nref)))
                out.append(ell)
        return out

    @property
    def entity_dofs(self):
        cell = self.cell
        ed = {d: {e: [] for e in range(len(cell.topology[d]))}
              for d in cell.topology}
        for lf in range(len(cell.facets)):
            ed[cell.dim - 1][lf] = [2 * lf, 2 * lf + 1]
        return ed

    @property
    def facet_dof_sign_flip(self):
        return True

    def entity_permutation(self, dim, orientation):
        # under edge reversal, s -> 1-s: even moment keeps sign (dof 0),
        # odd moment flips; the FLIP is handled via per-dof signs, the
        # ORDER of (even, odd) dofs is unchanged
        return np.arange(2, dtype=np.int32)

    def facet_dof_signs(self, orientation):
        """Per-facet-dof sign under facet orientation (0: canonical)."""
        if orientation == 0:
            return np.array([1.0, 1.0])
        # reversed edge: normal flips (both dofs) AND the odd moment flips
        # again: net [-1, +1]
        return np.array([-1.0, 1.0])


class NedelecFirstKind2D(_MomentElement):
    """N1curl_1 on triangle = rotated RT1; tangential edge dofs."""

    family = "Nedelec 1st kind H(curl)"
    continuity = "HCurl"
    mapping = "covariant"

    def _span_terms(self):
        if self.degree != 1 or self.cell.dim != 2:
            raise NotImplementedError("N1curl_1 on triangles only")
        terms = [lambda x: np.array([1.0, 0.0]),
                 lambda x: np.array([0.0, 1.0]),
                 lambda x: np.array([-x[1], x[0]])]
        return terms

    def _dof_functionals(self):
        cell = self.cell
        out = []
        for lf in range(len(cell.facets)):
            pts, wts, nref = _facet_quad(cell, lf, 3)
            tang = np.array([-nref[1], nref[0]])

            def ell(t, pts=pts, wts=wts, tang=tang):
                vals = np.array([t(p) for p in pts])
                return float(np.sum(wts * (vals @ tang)))

            out.append(ell)
        return out

    entity_dofs = RaviartThomas.entity_dofs
    facet_dof_sign_flip = True
