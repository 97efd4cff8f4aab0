"""Slate facet localization on prism (extruded) meshes — the round-3
verdict's untested corner.  One-sided dS localization must reproduce
the globally assembled operator on meshes with MIXED facet classes
(quads between columns, triangles between layers)."""
import numpy as np
import pytest
import jax.numpy as jnp

from firedrake_tpu import (ExtrudedMesh, FunctionSpace, Function,
                           TestFunction, TrialFunction,
                           SpatialCoordinate, UnitSquareMesh,
                           FacetNormal, FiniteElement,
                           TensorProductElement, HDiv, inner, dot, avg,
                           jump, dx, ds, dS, assemble, sin)
from firedrake_tpu.slate import Tensor, assemble_slate, _eval_local


@pytest.fixture(scope="module")
def prism_mesh():
    return ExtrudedMesh(UnitSquareMesh(2, 2), 2, layer_height=0.5)


def _dense(A, n):
    M = np.zeros((n, n))
    for j in range(n):
        M[:, j] = np.asarray(A.matvec(jnp.zeros(n).at[j].set(1.0)))
    return M


def test_prism_slate_cell_plus_exterior_facet(prism_mesh):
    """Tensor(cell + ds) matches global assembly on prisms (ds spans
    both quad side facets and triangle top/bottom facets)."""
    mesh = prism_mesh
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    form = inner(u, v) * dx + inner(u, v) * ds
    A_slate = assemble_slate(Tensor(form))
    A_ref = assemble(form)
    n = V.dim
    assert np.allclose(_dense(A_slate, n), _dense(A_ref, n), atol=1e-12)


def test_prism_slate_interior_facet_localization(prism_mesh):
    """The hybridization coupling shape on prisms: a broken H(div) flux
    against a single-valued multiplier through jump(sigma, n) * dS.
    One-sided localization (each facet visited from both cells with the
    cell's own outward normal) must equal the global matrix."""
    mesh = prism_mesh
    horiz = FiniteElement("BDM", "triangle", 1)
    vert = FiniteElement("DG", "interval", 0)
    W = FunctionSpace(mesh, HDiv(TensorProductElement(horiz, vert)))
    V = FunctionSpace(mesh, "CG", 1)
    sigma = TrialFunction(W)
    lam = TestFunction(V)
    n = FacetNormal(mesh)
    form = avg(lam) * jump(sigma, n) * dS
    loc = _eval_local(Tensor(form, axes=[V, W]), {})
    # scatter the per-cell tensors and compare against global assembly
    rows = np.asarray(V.cell_dof_map)
    cols = np.asarray(W.cell_dof_map)
    signs = (np.asarray(W.cell_dof_signs)
             if W.has_dof_signs else np.ones_like(cols, dtype=float))
    M = np.zeros((V.dim, W.dim))
    locn = np.asarray(loc.cell)
    for c in range(mesh.num_cells):
        M[np.ix_(rows[c], cols[c])] += locn[c]
    uref, vref = TrialFunction(W), TestFunction(V)
    A_ref = assemble(avg(vref) * jump(uref, n) * dS)
    Mref = np.zeros((V.dim, W.dim))
    for j in range(W.dim):
        Mref[:, j] = np.asarray(A_ref.matvec(
            jnp.zeros(W.dim).at[j].set(1.0)))
    assert np.abs(M - Mref).max() < 1e-11


def test_prism_slate_scalar_functional(prism_mesh):
    """Rank-0 Slate over dS on prisms.  Slate's per-cell localization
    visits every interior facet from BOTH adjacent cells (the
    reference's cell-facet loops do the same, slac/kernel_builder.py),
    so a fully single-valued integrand accumulates twice the facet
    integral — the convention hybridization's jump-style forms rely on
    (each side contributes its own one-sided term exactly once)."""
    mesh = prism_mesh
    V = FunctionSpace(mesh, "CG", 1)
    x, y, z = SpatialCoordinate(mesh)
    f = Function(V).interpolate(1 + x + y * z)
    form = avg(f) * dS
    val_slate = assemble_slate(Tensor(form))
    val_ref = assemble(form)
    assert abs(val_slate - 2.0 * val_ref) < 1e-11
