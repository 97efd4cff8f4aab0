"""Host-side tabulation tables for kernel construction.

Replaces FInAT tabulation consumed by tsfc/fem.py.  All tables are numpy,
computed once per (element, points) and baked into XLA programs as
constants.

Table convention:  T[q, j, *value_shape, *(tdim,)*deriv_order]
  * scalar element: value_shape = ()
  * VectorElement(ncomp): slot j = scalar_dof*ncomp + c has value
    e_c * phi_{scalar_dof} — the interleaving matches
    FunctionSpace.cell_dof_map.
"""
from __future__ import annotations

import numpy as np
from functools import lru_cache

from ..elements import FiniteElement, VectorElement, TensorElement


def scalar_tables(element: FiniteElement, points: np.ndarray, order: int):
    """{d: (nq, ndof_scalar, (tdim,)*d)} for d in 0..order."""
    sub = element.sub if isinstance(element, VectorElement) else element
    tabs = sub.tabulate(np.asarray(points, dtype=np.float64), order)
    return tabs


def element_tables(element: FiniteElement, points: np.ndarray, order: int):
    """Full (vector-expanded) tables {d: (nq, nslot, *vs, *(tdim,)*d)}."""
    tabs = scalar_tables(element, points, order)
    if not isinstance(element, VectorElement):
        return {d: t for d, t in tabs.items()}
    nc = element.ncomp
    vs = element.value_shape
    out = {}
    eye = np.eye(nc)
    for d, t in tabs.items():
        nq, nd = t.shape[:2]
        rest = t.shape[2:]
        # expanded[q, j*nc+c, comp, *rest] = t[q, j, *rest] * eye[c, comp]
        e = np.einsum("qj...,cd->qjcd...", t, eye)
        e = e.reshape(nq, nd * nc, nc, *rest)
        if len(vs) == 2:
            e = e.reshape(nq, nd * nc, *vs, *rest)
        out[d] = e
    return out
