"""hoisted_jit: closure constants become runtime parameters.

Guards the 16M-dof north-star delivery path: plain jit at that scale
serializes level operators into the HLO proto and the axon
remote-compile helper rejects the request (HTTP 413; PERF_NOTES
round 5).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from firedrake_tpu.utils.hoist import hoisted_jit


def test_matches_plain_jit():
    big = jnp.asarray(np.arange(50000, dtype=np.float64))

    def f(x):
        return (x * big).sum() + big[3]

    x = jnp.ones(50000)
    h = hoisted_jit(f, x)
    assert float(h(x)) == pytest.approx(float(jax.jit(f)(x)))


def test_no_large_literals_in_module():
    big = jnp.asarray(np.random.default_rng(0).random(50000))

    def f(x):
        return (x * big).sum()

    x = jnp.zeros(50000)
    plain = jax.jit(f).lower(x).as_text()
    h = hoisted_jit(f, x)
    hoisted = h._run.lower(h.consts, [x]).as_text()
    assert len(plain) > 500_000          # literal is baked in
    assert len(hoisted) < 20_000         # parameters only


def test_pytree_args_and_outputs():
    tbl = jnp.asarray(np.arange(12).reshape(3, 4), dtype=jnp.float64)

    def f(d, y):
        r = tbl @ d["v"] + y
        return {"out": r, "n": jnp.sum(r)}

    args = ({"v": jnp.ones(4)}, jnp.zeros(3))
    got = hoisted_jit(f, *args)(*args)
    want = f(*args)
    np.testing.assert_allclose(np.asarray(got["out"]),
                               np.asarray(want["out"]))
    assert float(got["n"]) == pytest.approx(float(want["n"]))


def test_int_scalar_arg_no_retrace():
    c = jnp.asarray(np.ones(100))

    def f(r, x):
        return jax.lax.fori_loop(0, r, lambda i, a: a + c, x)

    h = hoisted_jit(f, 1, jnp.zeros(100))
    assert float(h(3, jnp.zeros(100))[0]) == 3.0
    assert float(h(7, jnp.zeros(100))[0]) == 7.0


def test_structure_mismatch_raises():
    def f(x):
        return x + 1.0

    h = hoisted_jit(f, jnp.zeros(3))
    with pytest.raises(TypeError):
        h((jnp.zeros(3), jnp.zeros(3)))


def test_whole_ksp_program_hoists():
    """A CG+GMG whole-solve program lowers without baking the level
    arrays in (the bench/_solve_bench configuration, miniature)."""
    from firedrake_tpu import (FunctionSpace, TestFunction, TrialFunction,
                               UnitSquareMesh, MeshHierarchy, DirichletBC,
                               inner, grad, dx, assemble)
    from firedrake_tpu.mg.vcycle import GMGPreconditioner
    from firedrake_tpu.solving import _run_ksp, _bc_data

    base = UnitSquareMesh(4, 4)
    hier = MeshHierarchy(base, 2)
    mesh = hier.meshes[-1]
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    a = inner(grad(u), grad(v)) * dx
    bc = DirichletBC(V, 0.0, "on_boundary")
    bc_idx, _ = _bc_data([bc], V.dim)
    A = assemble(a, bcs=[bc]).with_dirichlet(jnp.asarray(bc_idx))
    mask = np.ones(V.dim)
    mask[bc_idx] = 0.0
    b = jnp.asarray(np.random.default_rng(1).random(V.dim)) \
        * jnp.asarray(mask)
    pc = GMGPreconditioner(a, [bc], V)
    params = {"ksp_type": "cg", "ksp_rtol": 1e-10}
    solver = hoisted_jit(
        lambda bb: _run_ksp(A.matvec, bb, params, pc=pc), b)
    res = solver(b)
    r = float(jnp.linalg.norm(b - A.matvec(res.x)) / jnp.linalg.norm(b))
    assert r < 1e-9
    assert len(solver.consts) > 0        # level arrays were hoisted
