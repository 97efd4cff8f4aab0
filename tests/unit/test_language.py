"""Symbolic language unit tests (shape rules, calculus, form splitting)."""
import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (TestFunction, TrialFunction, grad, div, inner,
                           dot, outer, dx, ds, derivative, lhs, rhs, action,
                           adjoint, replace, sym, tr, det, as_vector)
from firedrake_tpu.language.core import Zero


@pytest.fixture
def V():
    return fd.FunctionSpace(fd.UnitSquareMesh(2, 2), "CG", 1)


@pytest.fixture
def W():
    return fd.VectorFunctionSpace(fd.UnitSquareMesh(2, 2), "CG", 1)


def test_shapes(V, W):
    u, v = TrialFunction(V), TestFunction(V)
    w = TrialFunction(W)
    assert u.shape == ()
    assert grad(u).shape == (2,)
    assert grad(grad(u)).shape == (2, 2)
    assert w.shape == (2,)
    assert grad(w).shape == (2, 2)
    assert div(grad(w)).shape == (2,)
    assert inner(grad(u), grad(v)).shape == ()
    assert outer(w, w).shape == (2, 2)
    assert sym(grad(w)).shape == (2, 2)
    assert tr(grad(w)).shape == ()
    assert det(grad(w)).shape == ()


def test_shape_errors(V, W):
    u = TrialFunction(V)
    w = TrialFunction(W)
    with pytest.raises(ValueError):
        inner(u, w)
    with pytest.raises(ValueError):
        w * w          # tensor*tensor needs dot/inner/outer
    with pytest.raises(ValueError):
        u + w


def test_lhs_rhs(V):
    u, v = TrialFunction(V), TestFunction(V)
    f = fd.Function(V)
    F = inner(grad(u), grad(v)) * dx + inner(u, v) * dx - inner(f, v) * dx
    a = lhs(F)
    L = rhs(F)
    assert len(a.arguments()) == 2
    assert len(L.arguments()) == 1
    assert len(L.integrals()) == 1
    assert not L.coefficients() == ()


def test_derivative_linear(V):
    u = fd.Function(V)
    v = TestFunction(V)
    F = inner(grad(u), grad(v)) * dx
    J = derivative(F, u)
    assert len(J.arguments()) == 2
    # d/du of linear form == the bilinear form with trial in place of u
    du = J.arguments()[1]
    assert J.integrals()[0].integrand.shape == ()


def test_derivative_nonlinear(V):
    u = fd.Function(V)
    v = TestFunction(V)
    F = inner(u * u, v) * dx
    J = derivative(F, u)
    # J = 2 u du v dx: check structure by replacing
    assert len(J.arguments()) == 2


def test_action_adjoint(V):
    u, v = TrialFunction(V), TestFunction(V)
    w = fd.Function(V)
    a = inner(grad(u), grad(v)) * dx
    b = action(a, w)
    assert len(b.arguments()) == 1
    assert w in b.coefficients()
    at = adjoint(a)
    args = at.arguments()
    assert len(args) == 2


def test_zero_folding(V):
    u, v = TrialFunction(V), TestFunction(V)
    z = Zero(())
    assert (u * 0.0 * v * dx).empty()
    assert isinstance(u + z, type(u))


def test_replace(V):
    u, v = TrialFunction(V), TestFunction(V)
    w = fd.Function(V)
    a = inner(u, v) * dx
    b = replace(a, {u: w})
    assert len(b.arguments()) == 1


def test_form_signature_stable(V):
    u, v = TrialFunction(V), TestFunction(V)
    a1 = inner(grad(u), grad(v)) * dx
    a2 = inner(grad(u), grad(v)) * dx
    assert a1.signature() == a2.signature()
    a3 = inner(u, v) * dx
    assert a1.signature() != a3.signature()
