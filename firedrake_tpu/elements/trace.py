"""Facet trace elements and broken (DG-ized) elements.

Reference: FIAT's HDivTrace (used by firedrake hybridization,
slate/static_condensation/hybridization.py:18) and ufl BrokenElement.

* HDivTrace(cell, k): dofs live ON facets; functions are per-facet P_k
  with no cell interior.  They only make sense in facet integrals — cell
  tabulation raises; facet contexts call ``tabulate_facet(lf, pts)``.
* BrokenElement(elem): same local basis, all dofs attached to the cell
  (no inter-cell continuity, no orientation signs) — the hybridized
  mixed-method flux space.
"""
from __future__ import annotations

import numpy as np

from .finite_element import FiniteElement
from .reference_cell import by_name


class HDivTrace(FiniteElement):
    """Piecewise-P_k on facets (k = 0 for now)."""

    family = "HDiv Trace"
    mapping = "identity"

    def __init__(self, cell, degree: int = 0):
        if isinstance(cell, str):
            cell = by_name(cell)
        if degree != 0:
            raise NotImplementedError("HDivTrace degree >= 1: facet-local "
                                      "moment bases next")
        self.cell = cell
        self.degree = int(degree)
        self.value_shape = ()
        nlf = len(cell.facets)
        self.nodes = np.stack([cell.vertices[list(f[f >= 0])].mean(axis=0)
                               if hasattr(f, "__len__") else None
                               for f in (np.asarray(cell.facets))])

    @property
    def ndof(self):
        return len(self.cell.facets)

    @property
    def entity_dofs(self):
        cell = self.cell
        ed = {d: {e: [] for e in range(len(cell.topology[d]))}
              for d in cell.topology}
        for lf in range(len(cell.facets)):
            ed[cell.dim - 1][lf] = [lf]
        return ed

    def tabulate(self, points, order=1):
        raise ValueError("HDivTrace has no cell tabulation — trace "
                         "functions appear only in facet integrals")

    def tabulate_facet(self, lf: int, points, order: int = 0):
        """Basis at facet-embedded points: indicator of the owning facet
        (P0)."""
        nq = len(points)
        vals = np.zeros((nq, self.ndof))
        vals[:, lf] = 1.0
        out = {0: vals}
        if order >= 1:
            out[1] = np.zeros((nq, self.ndof, self.cell.dim))
        return out

    def entity_permutation(self, dim, orientation):
        return np.arange(1, dtype=np.int32)

    def __eq__(self, other):
        return (type(self) is type(other)
                and self.cell.name == other.cell.name
                and self.degree == other.degree)

    def __hash__(self):
        return hash(("HDivTrace", self.cell.name, self.degree))

    def __repr__(self):
        return f"HDivTrace({self.cell.name!r}, {self.degree})"


class BrokenElement(FiniteElement):
    """Discontinuous wrapper: all dofs attached to the cell interior."""

    def __init__(self, sub: FiniteElement):
        self.sub = sub
        self.cell = sub.cell
        self.degree = sub.degree
        self.family = f"Broken({sub.family})"
        self.value_shape = sub.value_shape
        self.mapping = getattr(sub, "mapping", "identity")
        self.nodes = sub.nodes

    @property
    def ndof(self):
        return self.sub.ndof

    @property
    def entity_dofs(self):
        cell = self.cell
        ed = {d: {e: [] for e in range(len(cell.topology[d]))}
              for d in cell.topology}
        ed[cell.dim][0] = list(range(self.ndof))
        return ed

    def tabulate(self, points, order=1):
        return self.sub.tabulate(points, order)

    def entity_permutation(self, dim, orientation):
        return np.arange(0, dtype=np.int32)

    # broken spaces carry no inter-cell continuity: no orientation signs
    facet_dof_sign_flip = False

    def __eq__(self, other):
        return type(self) is type(other) and self.sub == other.sub

    def __hash__(self):
        return hash(("Broken", hash(self.sub)))

    def __repr__(self):
        return f"BrokenElement({self.sub!r})"
