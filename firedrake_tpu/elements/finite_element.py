"""Finite element base classes (role of FIAT/FInAT; reference consumes these
through tsfc/fem.py and firedrake/functionspacedata.py:398).

An element knows:
  * its reference cell and polynomial degree,
  * its dof layout by mesh entity (``entity_dofs``) — this drives global
    numbering exactly like PETSc Sections built from FInAT entity_dofs
    (reference: firedrake/cython/dmcommon.pyx:1280),
  * how to tabulate basis values/gradients at arbitrary reference points
    (host-side numpy; results are baked into XLA programs as constants),
  * node coordinates for nodal interpolation (dual basis of point evals).
"""
from __future__ import annotations

import numpy as np
from functools import cached_property, lru_cache

from .reference_cell import ReferenceCell, by_name


class FiniteElement:
    """Scalar-valued nodal finite element."""

    #: subclasses set these
    cell: ReferenceCell
    degree: int
    family: str
    value_shape: tuple = ()

    # ------------------------------------------------------------------ api
    @property
    def ndof(self) -> int:
        return len(self.nodes)

    @property
    def value_size(self) -> int:
        return int(np.prod(self.value_shape, dtype=int)) if self.value_shape else 1

    @cached_property
    def reference_value_shape(self):
        return self.value_shape

    @property
    def sub_elements(self):
        """ufl compat: component elements (empty for scalar elements;
        VectorElement overrides with ncomp copies of its scalar)."""
        return []

    # nodes: (ndof, dim) point-evaluation locations
    # entity_dofs: {entity_dim: {entity_local_id: [dof ids]}}

    def tabulate(self, points: np.ndarray, order: int = 1):
        """Tabulate basis at ``points`` (nq, dim).

        Returns a dict with keys 0 (values, shape (nq, ndof)) and, if
        order >= 1, 1 (gradients, (nq, ndof, dim)); order >= 2 adds
        2 (hessians, (nq, ndof, dim, dim)).
        """
        raise NotImplementedError

    def entity_permutation(self, dim: int, orientation: int, nglobal_dofs=None):
        """Permutation of the *internal* dofs of a dim-entity when the cell
        sees the entity with the given orientation (0 = canonical).

        Returned p satisfies: cell-local slot k holds entity-canonical dof
        p[k].
        """
        raise NotImplementedError

    @property
    def is_dg(self) -> bool:
        ed = self.entity_dofs
        cd = ed.get(self.cell.dim, {})
        n_cell = sum(len(v) for v in cd.values())
        return n_cell == self.ndof

    def __repr__(self):
        var = getattr(self, "variant", None)
        v = f", variant={var!r}" if var else ""
        return (f"{type(self).__name__}({self.family!r}, "
                f"{self.cell.name!r}, {self.degree}{v})")

    # hashing for caches
    def __eq__(self, other):
        return (type(self) is type(other)
                and self.family == other.family
                and self.cell.name == other.cell.name
                and self.degree == other.degree
                and self.value_shape == other.value_shape
                and getattr(self, "variant", None)
                == getattr(other, "variant", None))

    def __hash__(self):
        return hash((type(self).__name__, self.family, self.cell.name,
                     self.degree, self.value_shape,
                     getattr(self, "variant", None)))


class Broken(FiniteElement):
    """The broken (fully discontinuous) version of an element: same
    local basis, every dof attached to the cell interior so nothing is
    shared between cells (reference: ufl BrokenElement, consumed by
    e.g. the vertex-based limiter's P1-DG space,
    tests/firedrake/regression/test_vertex_based_limiter.py:18)."""

    continuous = False

    def __init__(self, sub: FiniteElement):
        self.sub = sub
        self.cell = sub.cell
        self.degree = sub.degree
        self.family = f"Broken({sub.family})"
        self.value_shape = sub.value_shape
        self.mapping = getattr(sub, "mapping", "identity")

    @property
    def nodes(self):
        return self.sub.nodes

    @cached_property
    def embedded_superdegree(self):
        return getattr(self.sub, "embedded_superdegree", self.sub.degree)

    @cached_property
    def entity_dofs(self):
        ed = {d: {e: [] for e in range(len(self.cell.topology[d]))}
              for d in self.cell.topology}
        ed[self.cell.dim][0] = list(range(self.sub.ndof))
        return ed

    def tabulate(self, points, order=1):
        return self.sub.tabulate(points, order)

    def entity_permutation(self, dim, orientation, entity=0):
        return np.arange(0, dtype=np.int32)

    def __eq__(self, other):
        return type(self) is type(other) and self.sub == other.sub

    def __hash__(self):
        return hash(("Broken", hash(self.sub)))

    def __repr__(self):
        return f"Broken({self.sub!r})"


def BrokenElement(element):
    """ufl.BrokenElement analogue; accepts a concrete element or a
    FiniteElement(...) spec.  Breaking an already fully-discontinuous
    element is the identity (every dof is already cell-interior), so
    the element is returned unchanged — keeps e.g. VertexBasedLimiter's
    DG1 recognition working on BrokenElement(DG1) spaces."""
    if hasattr(element, "resolve"):
        element = element.resolve()
    if isinstance(element, VectorElement):
        return VectorElement(BrokenElement(element.sub), element.ncomp)
    if not getattr(element, "continuous", True):
        return element
    return Broken(element)


class VectorElement(FiniteElement):
    """Vector-valued element = ncomp copies of a scalar sub-element.

    Dof layout is node-major / component-minor (dof = scalar_dof*ncomp + c),
    matching pyop2's Dat block structure (reference: pyop2/types/dataset.py
    shape-per-node ('cdim')).
    """

    def __init__(self, sub: FiniteElement, ncomp: int):
        self.sub = sub
        self.ncomp = ncomp
        self.cell = sub.cell
        self.degree = sub.degree
        self.family = sub.family
        self.value_shape = sub.value_shape + (ncomp,) if sub.value_shape else (ncomp,)

    @property
    def continuous(self):
        return getattr(self.sub, "continuous", False)

    @property
    def nodes(self):
        return np.repeat(self.sub.nodes, self.ncomp, axis=0)

    @property
    def ndof(self):
        return self.sub.ndof * self.ncomp

    @cached_property
    def entity_dofs(self):
        out = {}
        for d, ent in self.sub.entity_dofs.items():
            out[d] = {}
            for e, dofs in ent.items():
                out[d][e] = [s * self.ncomp + c for s in dofs
                             for c in range(self.ncomp)]
        return out

    @property
    def sub_elements(self):
        return [self.sub] * self.ncomp

    def tabulate(self, points, order=1):
        return self.sub.tabulate(points, order)

    def entity_permutation(self, dim, orientation, nglobal_dofs=None):
        p = self.sub.entity_permutation(dim, orientation)
        ncomp = self.ncomp
        return np.concatenate([p[:, None] * ncomp + np.arange(ncomp)[None, :]
                               ]).reshape(-1) if len(p) else p

    def __eq__(self, other):
        return (type(self) is type(other) and self.sub == other.sub
                and self.ncomp == other.ncomp)

    def __hash__(self):
        return hash(("Vector", hash(self.sub), self.ncomp))

    def __repr__(self):
        return f"VectorElement({self.sub!r}, {self.ncomp})"


class TensorElement(VectorElement):
    """Tensor-valued element: shape (m, n), flattened row-major per node."""

    def __init__(self, sub: FiniteElement, shape: tuple):
        super().__init__(sub, int(np.prod(shape)))
        self.tensor_shape = tuple(shape)
        self.value_shape = tuple(shape)

    def __eq__(self, other):
        return (type(self) is type(other) and self.sub == other.sub
                and self.tensor_shape == other.tensor_shape)

    def __hash__(self):
        return hash(("Tensor", hash(self.sub), self.tensor_shape))

    def __repr__(self):
        return f"TensorElement({self.sub!r}, {self.tensor_shape})"
