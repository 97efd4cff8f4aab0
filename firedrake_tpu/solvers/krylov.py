"""JAX-native Krylov solvers (the PETSc KSP analogue, reference layer L1 —
SURVEY §2.9 N13).  All solvers are matvec-callback based (matrix-free
first, like firedrake/matrix_free/operators.py:211) and built on
lax.while_loop so a whole solve is ONE XLA program: no host round-trips
per iteration, which is what kills latency on TPU.

Convergence: ||r||_2 <= max(rtol * ||r0||, atol), iteration cap max_it —
matching PETSc's default test semantics closely enough for the regression
suite (KSPConvergedDefault uses the preconditioned norm; we use the true
residual norm, which is the stricter choice).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class KSPResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray
    residual_norm: jnp.ndarray
    converged: jnp.ndarray


def _tolcheck(rnorm, r0norm, rtol, atol):
    return rnorm <= jnp.maximum(rtol * r0norm, atol)


def _inner(dot):
    """(dot, norm) pair from an optional inner-product callback.

    Every solver takes `dot=` so the SAME loop runs serially
    (jnp.vdot) or SPMD inside shard_map (a psum-of-owned-partials dot
    from parallel/dsolve.py) — the PETSc VecDot-over-the-communicator
    role without a second code path."""
    dot = dot or jnp.vdot
    # complex-safe: vdot conjugates its first argument, so
    # dot(v, v) is real-valued — take .real to keep norms (and
    # every while_loop comparison fed by them) real-dtyped
    return dot, lambda v: jnp.sqrt(jnp.real(dot(v, v)))


def cg(op: Callable, b, x0=None, pc: Callable = None, rtol=1e-7,
       atol=1e-50, max_it=10000, dot=None) -> KSPResult:
    """Preconditioned conjugate gradients."""
    pc = pc or (lambda r: r)
    dot, _norm = _inner(dot)
    x0 = b * 0.0 if x0 is None else x0
    r0 = b - op(x0)
    z0 = pc(r0)
    gamma0 = dot(r0, z0)
    r0norm = _norm(r0)

    def cond(state):
        x, r, z, p, gamma, it, rnorm = state
        return (~_tolcheck(rnorm, r0norm, rtol, atol)) & (it < max_it)

    def body(state):
        x, r, z, p, gamma, it, rnorm = state
        Ap = op(p)
        alpha = gamma / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = pc(r)
        gamma_new = dot(r, z)
        beta = gamma_new / gamma
        p = z + beta * p
        return x, r, z, p, gamma_new, it + 1, _norm(r)

    init = (x0, r0, z0, z0, gamma0, jnp.zeros((), jnp.int32), r0norm)
    x, r, z, p, gamma, it, rnorm = jax.lax.while_loop(cond, body, init)
    return KSPResult(x, it, rnorm, _tolcheck(rnorm, r0norm, rtol, atol))


def bicgstab(op, b, x0=None, pc=None, rtol=1e-7, atol=1e-50,
             max_it=10000, dot=None) -> KSPResult:
    pc = pc or (lambda r: r)
    dot, _norm = _inner(dot)
    x0 = b * 0.0 if x0 is None else x0
    r0 = b - op(x0)
    rhat = r0
    r0norm = _norm(r0)

    def cond(state):
        x, r, p, v, rho, alpha, omega, it, rnorm = state
        return (~_tolcheck(rnorm, r0norm, rtol, atol)) & (it < max_it)

    def body(state):
        x, r, p, v, rho, alpha, omega, it, rnorm = state
        rho_new = dot(rhat, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        phat = pc(p)
        v = op(phat)
        alpha = rho_new / dot(rhat, v)
        s = r - alpha * v
        shat = pc(s)
        t = op(shat)
        omega = dot(t, s) / dot(t, t)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        return (x, r, p, v, rho_new, alpha, omega, it + 1,
                _norm(r))

    one = jnp.ones((), b.dtype)
    init = (x0, r0, b * 0.0, b * 0.0, one, one, one,
            jnp.zeros((), jnp.int32), r0norm)
    out = jax.lax.while_loop(cond, body, init)
    x, r = out[0], out[1]
    it, rnorm = out[7], out[8]
    return KSPResult(x, it, rnorm, _tolcheck(rnorm, r0norm, rtol, atol))


def gmres(op, b, x0=None, pc=None, rtol=1e-7, atol=1e-50, max_it=10000,
          restart=30, dot=None) -> KSPResult:
    """Restarted GMRES with left preconditioning and Givens rotations.

    The Arnoldi basis lives in a fixed (restart+1, n) buffer — static
    shapes, lax loops only."""
    pc = pc or (lambda r: r)
    dot, _norm = _inner(dot)
    x0 = b * 0.0 if x0 is None else x0
    n = b.shape[0]
    m = restart
    r0 = pc(b - op(x0))
    r0norm = _norm(r0)

    def arnoldi_step(carry, j):
        V, H, cs, sn, g = carry
        w = pc(op(V[j]))
        # modified Gram-Schmidt against all basis vectors (masked)
        def mgs(k, wh):
            w, hcol = wh
            hk = jnp.where(k <= j, dot(V[k], w), 0.0)
            w = w - hk * V[k]
            return w, hcol.at[k].set(hk)
        w, hcol = jax.lax.fori_loop(0, m + 1, mgs,
                                    (w, jnp.zeros(m + 1, b.dtype)))
        hj1 = _norm(w)
        hcol = hcol.at[j + 1].set(hj1)
        V = V.at[j + 1].set(jnp.where(hj1 > 0, w / hj1, w))
        # apply existing Givens rotations to hcol
        def rot(k, hc):
            t = cs[k] * hc[k] + sn[k] * hc[k + 1]
            hc = hc.at[k + 1].set(-jnp.conj(sn[k]) * hc[k]
                                  + cs[k] * hc[k + 1])
            return hc.at[k].set(t)
        def rot_masked(k, hc):
            return jax.lax.cond(k < j, lambda: rot(k, hc), lambda: hc)
        hcol = jax.lax.fori_loop(0, m, rot_masked, hcol)
        # new rotation to kill hcol[j+1]
        # complex-safe Givens (G = [[c, s], [-conj(s), c]], c real;
        # real data reduces to the classical rotation up to sign)
        a1 = jnp.abs(hcol[j])
        denom = jnp.sqrt(a1 ** 2 + jnp.abs(hcol[j + 1]) ** 2)
        sign1 = jnp.where(a1 > 0,
                          hcol[j] / jnp.where(a1 > 0, a1, 1.0),
                          1.0 + 0.0 * hcol[j])
        c = jnp.where(denom > 0, a1 / denom, 1.0)
        s = jnp.where(denom > 0,
                      sign1 * jnp.conj(hcol[j + 1])
                      / jnp.where(denom > 0, denom, 1.0),
                      0.0 * hcol[j])
        cs2 = cs.at[j].set(c)
        sn2 = sn.at[j].set(s)
        hcol = hcol.at[j].set(c * hcol[j] + s * hcol[j + 1])
        hcol = hcol.at[j + 1].set(0.0)
        H = H.at[:, j].set(hcol)
        g2 = g.at[j + 1].set(-jnp.conj(s) * g[j])
        g2 = g2.at[j].set(c * g[j])
        return (V, H, cs2, sn2, g2)

    def cycle(x):
        r = pc(b - op(x))
        beta = _norm(r)
        V = (jnp.zeros((m + 1, n)) + 0.0 * b).at[0].set(
            jnp.where(beta > 0, r / beta, r))
        H = jnp.zeros((m + 1, m), b.dtype)
        cs = jnp.zeros(m)
        sn = jnp.zeros(m, b.dtype)
        g = jnp.zeros(m + 1, b.dtype).at[0].set(beta)

        def inner_cond(st):
            V, H, cs, sn, g, j = st
            return (j < m) & (jnp.abs(g[j]) >
                              jnp.maximum(rtol * r0norm, atol))

        def inner_body(st):
            V, H, cs, sn, g, j = st
            V, H, cs, sn, g = arnoldi_step((V, H, cs, sn, g), j)
            return V, H, cs, sn, g, j + 1

        V, H, cs, sn, g, j = jax.lax.while_loop(
            inner_cond, inner_body,
            (V, H, cs, sn, g, jnp.zeros((), jnp.int32)))
        # solve the (j x j) triangular system H y = g (masked back-subst)
        Hm = H[:m, :m] + jnp.eye(m) * jnp.where(
            jnp.arange(m) >= j, 1.0, 0.0)[None, :] * 0.0
        # mask: treat columns >= j as identity to keep solve well-posed
        Hmask = jnp.where((jnp.arange(m)[:, None] < j)
                          & (jnp.arange(m)[None, :] < j), H[:m, :m],
                          jnp.eye(m))
        gm = jnp.where(jnp.arange(m) < j, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Hmask, gm, lower=False)
        x = x + V[:m].T @ y
        return x, jnp.abs(g[j]), j

    def outer_cond(st):
        x, rnorm, total_it = st
        return (~_tolcheck(rnorm, r0norm, rtol, atol)) & (total_it < max_it)

    def outer_body(st):
        x, rnorm, total_it = st
        x, rn, j = cycle(x)
        return x, rn, total_it + j

    x, rnorm, it = jax.lax.while_loop(
        outer_cond, outer_body,
        (x0, r0norm, jnp.zeros((), jnp.int32)))
    # report true residual
    true_r = _norm(b - op(x))
    return KSPResult(x, it, true_r, _tolcheck(rnorm, r0norm, rtol, atol))


def fgmres(op, b, x0=None, pc=None, rtol=1e-7, atol=1e-50, max_it=10000,
           restart=30, dot=None) -> KSPResult:
    """Flexible GMRES (right preconditioning, Z basis stored) — required
    when the preconditioner is nonstationary (an inner Krylov solve, a
    nonlinear patch sweep), the PETSc KSPFGMRES role."""
    pc = pc or (lambda r: r)
    dot, _norm = _inner(dot)
    x0 = b * 0.0 if x0 is None else x0
    n = b.shape[0]
    m = restart
    r0 = b - op(x0)
    r0norm = _norm(r0)

    def arnoldi_step(carry, j):
        V, Z, H, cs, sn, g = carry
        z = pc(V[j])
        Z = Z.at[j].set(z)
        w = op(z)

        def mgs(k, wh):
            w, hcol = wh
            hk = jnp.where(k <= j, dot(V[k], w), 0.0)
            w = w - hk * V[k]
            return w, hcol.at[k].set(hk)
        w, hcol = jax.lax.fori_loop(0, m + 1, mgs,
                                    (w, jnp.zeros(m + 1, b.dtype)))
        hj1 = _norm(w)
        hcol = hcol.at[j + 1].set(hj1)
        V = V.at[j + 1].set(jnp.where(hj1 > 0, w / hj1, w))

        def rot(k, hc):
            t = cs[k] * hc[k] + sn[k] * hc[k + 1]
            hc = hc.at[k + 1].set(-jnp.conj(sn[k]) * hc[k]
                                  + cs[k] * hc[k + 1])
            return hc.at[k].set(t)

        def rot_masked(k, hc):
            return jax.lax.cond(k < j, lambda: rot(k, hc), lambda: hc)
        hcol = jax.lax.fori_loop(0, m, rot_masked, hcol)
        # complex-safe Givens (G = [[c, s], [-conj(s), c]], c real;
        # real data reduces to the classical rotation up to sign)
        a1 = jnp.abs(hcol[j])
        denom = jnp.sqrt(a1 ** 2 + jnp.abs(hcol[j + 1]) ** 2)
        sign1 = jnp.where(a1 > 0,
                          hcol[j] / jnp.where(a1 > 0, a1, 1.0),
                          1.0 + 0.0 * hcol[j])
        c = jnp.where(denom > 0, a1 / denom, 1.0)
        s = jnp.where(denom > 0,
                      sign1 * jnp.conj(hcol[j + 1])
                      / jnp.where(denom > 0, denom, 1.0),
                      0.0 * hcol[j])
        cs2 = cs.at[j].set(c)
        sn2 = sn.at[j].set(s)
        hcol = hcol.at[j].set(c * hcol[j] + s * hcol[j + 1])
        hcol = hcol.at[j + 1].set(0.0)
        H = H.at[:, j].set(hcol)
        g2 = g.at[j + 1].set(-jnp.conj(s) * g[j])
        g2 = g2.at[j].set(c * g[j])
        return (V, Z, H, cs2, sn2, g2)

    def cycle(x):
        r = b - op(x)
        beta = _norm(r)
        V = (jnp.zeros((m + 1, n)) + 0.0 * b).at[0].set(
            jnp.where(beta > 0, r / beta, r))
        Z = jnp.zeros((m, n)) + 0.0 * b
        H = jnp.zeros((m + 1, m), b.dtype)
        cs = jnp.zeros(m)
        sn = jnp.zeros(m, b.dtype)
        g = jnp.zeros(m + 1, b.dtype).at[0].set(beta)

        def inner_cond(st):
            V, Z, H, cs, sn, g, j = st
            return (j < m) & (jnp.abs(g[j]) >
                              jnp.maximum(rtol * r0norm, atol))

        def inner_body(st):
            V, Z, H, cs, sn, g, j = st
            V, Z, H, cs, sn, g = arnoldi_step((V, Z, H, cs, sn, g), j)
            return V, Z, H, cs, sn, g, j + 1

        V, Z, H, cs, sn, g, j = jax.lax.while_loop(
            inner_cond, inner_body,
            (V, Z, H, cs, sn, g, jnp.zeros((), jnp.int32)))
        Hmask = jnp.where((jnp.arange(m)[:, None] < j)
                          & (jnp.arange(m)[None, :] < j), H[:m, :m],
                          jnp.eye(m))
        gm = jnp.where(jnp.arange(m) < j, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Hmask, gm, lower=False)
        x = x + Z.T @ y
        return x, jnp.abs(g[j]), j

    def outer_cond(st):
        x, rnorm, total_it = st
        return (~_tolcheck(rnorm, r0norm, rtol, atol)) & (total_it < max_it)

    def outer_body(st):
        x, rnorm, total_it = st
        x, rn, j = cycle(x)
        return x, rn, total_it + j

    x, rnorm, it = jax.lax.while_loop(
        outer_cond, outer_body,
        (x0, r0norm, jnp.zeros((), jnp.int32)))
    true_r = _norm(b - op(x))
    return KSPResult(x, it, true_r, _tolcheck(rnorm, r0norm, rtol, atol))


def richardson(op, b, x0=None, pc=None, rtol=1e-7, atol=1e-50,
               max_it=10000, damping=1.0, dot=None) -> KSPResult:
    pc = pc or (lambda r: r)
    dot, _norm = _inner(dot)
    x0 = b * 0.0 if x0 is None else x0
    r0 = b - op(x0)
    r0norm = _norm(r0)

    def cond(st):
        x, r, it, rnorm = st
        return (~_tolcheck(rnorm, r0norm, rtol, atol)) & (it < max_it)

    def body(st):
        x, r, it, rnorm = st
        x = x + damping * pc(r)
        r = b - op(x)
        return x, r, it + 1, _norm(r)

    x, r, it, rnorm = jax.lax.while_loop(
        cond, body, (x0, r0, jnp.zeros((), jnp.int32), r0norm))
    return KSPResult(x, it, rnorm, _tolcheck(rnorm, r0norm, rtol, atol))


def chebyshev(op, b, x0=None, pc=None, rtol=1e-7, atol=1e-50,
              max_it=10000, emin=0.1, emax=1.1, dot=None) -> KSPResult:
    """Chebyshev iteration on eigenvalue bounds [emin, emax] of pc∘op —
    the classic MG smoother (PETSc KSPCHEBYSHEV)."""
    pc = pc or (lambda r: r)
    dot, _norm = _inner(dot)
    x0 = b * 0.0 if x0 is None else x0
    theta = (emax + emin) / 2
    delta = (emax - emin) / 2
    r0 = b - op(x0)
    r0norm = _norm(r0)

    def cond(st):
        x, r, p, alpha, it, rnorm = st
        return (~_tolcheck(rnorm, r0norm, rtol, atol)) & (it < max_it)

    def body(st):
        x, r, p, alpha, it, rnorm = st
        z = pc(r)
        beta = jnp.where(it == 0, 0.0,
                         (delta * alpha / 2) ** 2)
        alpha_new = jnp.where(it == 0, 1.0 / theta,
                              1.0 / (theta - beta / alpha))
        p = z + beta * p
        x = x + alpha_new * p
        r = b - op(x)
        return x, r, p, alpha_new, it + 1, _norm(r)

    init = (x0, r0, b * 0.0, jnp.ones(()),
            jnp.zeros((), jnp.int32), r0norm)
    x, r, p, a, it, rnorm = jax.lax.while_loop(cond, body, init)
    return KSPResult(x, it, rnorm, _tolcheck(rnorm, r0norm, rtol, atol))


def minres(op, b, x0=None, pc=None, rtol=1e-7, atol=1e-50,
           max_it=10000, dot=None) -> KSPResult:
    """MINRES via gmres fallback (dedicated Lanczos version later)."""
    return gmres(op, b, x0=x0, pc=pc, rtol=rtol, atol=atol, max_it=max_it,
                 restart=60, dot=dot)


KSP_METHODS = {
    "cg": cg,
    "bicgstab": bicgstab,
    "bcgs": bicgstab,
    "gmres": gmres,
    "fgmres": fgmres,
    "minres": minres,
    "richardson": richardson,
    "chebyshev": chebyshev,
}
