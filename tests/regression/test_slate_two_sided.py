"""Genuinely two-sided dS couplings through Slate (round-5 directive).

The reference *zeroes* negative restrictions at Tensor construction
(firedrake/slate/slate.py:903 RemoveNegativeRestrictions) and compiles
dS one-sided via cell-facet masking (slate/slac/kernel_builder.py:
facet_integral_predicates) — silently dropping cross-cell blocks of
jump-jump forms.  firedrake_tpu goes further: cross-cell blocks are
assembled exactly (facet-pair kernels + explicit cross-block scatter),
so Tensor-based assembly matches direct assembly for ANY dS form.
"""
import numpy as np
import pytest

import jax.numpy as jnp
from firedrake_tpu import (FunctionSpace, VectorFunctionSpace, Function,
                           TestFunction, TrialFunction, UnitSquareMesh,
                           UnitCubeMesh, SpatialCoordinate, FacetNormal,
                           inner, grad, jump, avg, dx, dS, assemble)
from firedrake_tpu.slate import Tensor, assemble_slate, _eval_local


def _dense(A, n):
    cols = [np.asarray(A.matvec(jnp.zeros(n).at[j].set(1.0)))
            for j in range(n)]
    return np.stack(cols, axis=1)


@pytest.mark.parametrize("mesh_fn", [lambda: UnitSquareMesh(3, 3),
                                     lambda: UnitCubeMesh(2, 2, 2)])
def test_jump_jump_penalty_matches_direct(mesh_fn):
    """The canonical two-sided coupling: an interior penalty matrix
    jump(u)*jump(v)*dS assembled through Tensor equals direct
    assembly entry for entry."""
    mesh = mesh_fn()
    V = FunctionSpace(mesh, "DG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    form = inner(jump(u), jump(v)) * dS
    A_slate = assemble_slate(Tensor(form))
    A_ref = assemble(form)
    assert np.abs(_dense(A_slate, V.dim) - _dense(A_ref, V.dim)).max() \
        < 1e-12


def test_full_ip_operator():
    """A complete symmetric-interior-penalty Laplacian (cell + two-sided
    facet terms in ONE Tensor) matches direct assembly."""
    mesh = UnitSquareMesh(3, 3)
    V = FunctionSpace(mesh, "DG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    n = FacetNormal(mesh)
    h = 1.0 / 3.0
    form = (inner(grad(u), grad(v)) * dx
            - inner(avg(grad(u)), jump(v, n)) * dS
            - inner(jump(u, n), avg(grad(v))) * dS
            + (4.0 / h) * inner(jump(u), jump(v)) * dS)
    A_slate = assemble_slate(Tensor(form))
    A_ref = assemble(form)
    D1, D2 = _dense(A_slate, V.dim), _dense(A_ref, V.dim)
    assert np.abs(D1 - D2).max() < 1e-11
    # and it is symmetric (the IP form is)
    assert np.abs(D1 - D1.T).max() < 1e-11


def test_two_sided_rank1_matches_direct():
    """avg(f)*jump(v) has cross terms (neighbor's coefficient against
    this cell's test function) — the facet-pair kernel gets them."""
    mesh = UnitSquareMesh(3, 3)
    V = FunctionSpace(mesh, "DG", 1)
    v = TestFunction(V)
    x = SpatialCoordinate(mesh)
    f = Function(V)
    f.interpolate(x[0] * x[0] + 2.0 * x[1])
    form = avg(f) * jump(v) * dS
    b_slate = assemble_slate(Tensor(form))
    b_ref = assemble(form)
    assert np.abs(np.asarray(b_slate.dat)
                  - np.asarray(b_ref.dat)).max() < 1e-13


def test_two_sided_scalar_functional():
    mesh = UnitSquareMesh(4, 4)
    V = FunctionSpace(mesh, "DG", 1)
    x = SpatialCoordinate(mesh)
    f = Function(V)
    # discontinuous field: projection of a cellwise-varying function
    f.interpolate(x[0] * x[1])
    form = avg(f) * jump(f) * dS
    s_slate = assemble_slate(Tensor(form))
    s_ref = assemble(form)
    assert abs(s_slate - float(s_ref)) < 1e-13


def test_linear_algebra_on_two_sided():
    """Cross blocks compose through linear ops: Add, Negative,
    Transpose; and global assembly sees the composed result."""
    mesh = UnitSquareMesh(3, 3)
    V = FunctionSpace(mesh, "DG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    n = FacetNormal(mesh)
    ip = inner(jump(u), jump(v)) * dS
    asym = inner(jump(u, n), avg(grad(v))) * dS
    mass = inner(u, v) * dx
    T = Tensor(ip) + Tensor(mass) - Tensor(asym).T
    direct = (assemble(ip) , assemble(mass), assemble(asym))
    D_ref = (_dense(direct[0], V.dim) + _dense(direct[1], V.dim)
             - _dense(direct[2], V.dim).T)
    D = _dense(assemble_slate(T), V.dim)
    assert np.abs(D - D_ref).max() < 1e-11


def test_vector_valued_two_sided():
    mesh = UnitSquareMesh(3, 3)
    V = VectorFunctionSpace(mesh, "DG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    form = inner(jump(u), jump(v)) * dS
    A_slate = assemble_slate(Tensor(form))
    A_ref = assemble(form)
    assert np.abs(_dense(A_slate, V.dim) - _dense(A_ref, V.dim)).max() \
        < 1e-12


def test_cell_local_algebra_on_cross_raises():
    mesh = UnitSquareMesh(3, 3)
    V = FunctionSpace(mesh, "DG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    A = Tensor(inner(jump(u), jump(v)) * dS)
    with pytest.raises(NotImplementedError, match="cross-cell"):
        _eval_local(A.inv, {})
    with pytest.raises(NotImplementedError, match="cross-cell"):
        _eval_local(A.solve(Tensor(inner(1.0, v) * dx)), {})
