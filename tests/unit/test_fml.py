"""FML labelled forms (reference: firedrake/fml tests)."""
import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           TrialFunction, UnitSquareMesh, inner, grad, dx)
from firedrake_tpu.fml import (Label, Term, LabelledForm, subject,
                               all_terms, drop, identity, replace_subject)


def test_labels_and_maps():
    mesh = UnitSquareMesh(2, 2)
    V = FunctionSpace(mesh, "CG", 1)
    u = Function(V)
    v = TestFunction(V)
    time_derivative = Label("time_derivative")
    diffusion = Label("diffusion")

    lf = (time_derivative(subject(inner(u, v) * dx, u))
          + diffusion(subject(inner(grad(u), grad(v)) * dx, u)))
    assert len(lf.terms) == 2
    only_diff = lf.label_map(lambda t: t.has_label(diffusion),
                             map_if_false=drop)
    assert len(only_diff.terms) == 1
    # replace subject with a new function
    w = Function(V).assign(2.0)
    replaced = lf.label_map(all_terms, replace_subject(w))
    assert w in replaced.form.coefficients()
    # .form recombines
    assert len(lf.form.integrals()) == 2


def test_label_remove_and_value():
    mesh = UnitSquareMesh(2, 2)
    V = FunctionSpace(mesh, "CG", 1)
    v = TestFunction(V)
    u = Function(V)
    lab = Label("foo", value=41)
    term = lab(Term(inner(u, v) * dx), 42)
    assert term.get(lab) == 42
    t2 = lab.remove(term)
    assert not t2.has_label(lab)
