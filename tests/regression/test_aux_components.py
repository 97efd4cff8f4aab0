"""Auxiliary components: random functions, limiter, eigensolver, par_loop,
profiling (reference dirs: randomfunctiongen/, slope_limiter tests,
eigensolver tests, parloops tests)."""
import math

import numpy as np
import pytest

import firedrake_tpu as fd
from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                           TrialFunction, SpatialCoordinate, UnitSquareMesh,
                           DirichletBC, inner, grad, dx, conditional, ge,
                           RandomGenerator, PCG64, VertexBasedLimiter,
                           LinearEigenproblem, LinearEigensolver, par_loop,
                           READ, RW, INC, timed_region,
                           print_event_summary, write_flamegraph)


def test_random_function():
    rg = RandomGenerator(PCG64(seed=42))
    V = FunctionSpace(UnitSquareMesh(4, 4), "CG", 1)
    f = rg.normal(V, 0.0, 1.0)
    d = np.asarray(f.dat)
    assert d.shape == (V.dim,)
    assert 0.3 < d.std() < 3.0
    # seeded determinism
    g = RandomGenerator(PCG64(seed=42)).normal(V, 0.0, 1.0)
    assert np.allclose(np.asarray(g.dat), d)
    # plain array API passes through
    assert rg.uniform(size=5).shape == (5,)


def test_vertex_based_limiter():
    mesh = UnitSquareMesh(4, 4)
    Vd = FunctionSpace(mesh, "DG", 1)
    X = SpatialCoordinate(mesh)
    q = Function(Vd).interpolate(conditional(ge(X[0], 0.5), 1.0, 0.0))
    means0 = np.asarray(q.dat).reshape(-1, 3).mean(axis=1)
    VertexBasedLimiter(Vd).apply(q)
    d = np.asarray(q.dat)
    assert d.max() <= 1.0 + 1e-12 and d.min() >= -1e-12
    means1 = d.reshape(-1, 3).mean(axis=1)
    assert np.allclose(means0, means1)     # limiter conserves cell means


def test_laplace_eigenvalues():
    mesh = UnitSquareMesh(16, 16)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    bc = DirichletBC(V, 0.0, "on_boundary")
    ep = LinearEigenproblem(inner(grad(u), grad(v)) * dx,
                            inner(u, v) * dx, bcs=[bc])
    es = LinearEigensolver(ep, n_evals=3)
    n = es.solve()
    assert n >= 3
    assert abs(es.eigenvalue(0) - 2 * math.pi ** 2) < 0.5
    assert abs(es.eigenvalue(1) - 5 * math.pi ** 2) < 2.0


def test_par_loop_rw_inc():
    V = FunctionSpace(UnitSquareMesh(3, 3), "CG", 1)
    g = Function(V).assign(2.0)
    par_loop(lambda u: {"u": u * 2}, dx, {"u": (g, RW)})
    assert np.allclose(np.asarray(g.dat), 4.0)
    # INC accumulates cell-valency
    h = Function(V)
    import jax.numpy as jnp
    par_loop(lambda u, c: {"c": jnp.ones_like(c)}, dx,
             {"u": (g, READ), "c": (h, INC)})
    # each node receives one count per adjacent cell
    valency = np.zeros(V.dim)
    np.add.at(valency, V.cell_dof_map.reshape(-1), 1.0)
    assert np.allclose(np.asarray(h.dat), valency)


def test_profiling_events(tmp_path):
    with timed_region("outer"):
        with timed_region("inner"):
            x = sum(range(1000))
    from firedrake_tpu.utils.profiling import event_summary
    ev = event_summary()
    assert "outer" in ev and "outer;inner" in ev
    p = tmp_path / "flame.txt"
    write_flamegraph(str(p))
    assert "outer;inner" in open(p).read()


def test_device_lobpcg_eigensolver():
    """eps_backend='lobpcg': device-side block eigensolver (lumped-mass
    congruence + Gershgorin shift for smallest) — Dirichlet Laplacian
    eigenvalues within discretization error of pi^2 (i^2+j^2)."""
    import math
    from firedrake_tpu import (FunctionSpace, TestFunction, TrialFunction,
                               UnitSquareMesh, DirichletBC, inner, grad,
                               dx, LinearEigenproblem, LinearEigensolver)
    mesh = UnitSquareMesh(12, 12)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    prob = LinearEigenproblem(inner(grad(u), grad(v)) * dx, u * v * dx,
                              bcs=[DirichletBC(V, 0.0, "on_boundary")])
    es = LinearEigensolver(prob, n_evals=4, solver_parameters={
        "eps_backend": "lobpcg", "eps_which": "SM", "eps_max_it": 400})
    es.solve()
    exact = [math.pi ** 2 * (i * i + j * j)
             for (i, j) in [(1, 1), (1, 2), (2, 1), (2, 2)]]
    for i, ex in enumerate(exact):
        assert abs(es.eigenvalue(i) - ex) / ex < 0.02, (i, es.eigenvalue(i))
