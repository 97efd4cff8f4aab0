"""TPU A/B: stencil vs gather-table P1 assembly + stencil SpMV.

Honest protocol (PERF_NOTES round 2b): force materialization by reading
ONE scalar; repeat on device via lax.fori_loop with a non-factorable
carry; difference 1-rep vs R-rep.  Run ALONE (never two TPU procs).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
if os.environ.get("FDTPU_BENCH_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), file=sys.stderr)


def per_rep(call, budget=20.0):
    call(1)
    t0 = time.perf_counter()
    call(1)
    base = time.perf_counter() - t0
    R = max(4, min(5000, int(budget / max(base, 4e-3))))
    t0 = time.perf_counter()
    call(R + 1)
    tR = time.perf_counter() - t0
    return max(tR - base, 1e-9) / R, R, base


def assembly_bench(n, degree=1, stencil=True):
    from firedrake_tpu import (FunctionSpace, TestFunction, TrialFunction,
                               UnitSquareMesh, inner, grad, dx)
    from firedrake_tpu.assemble import FormAssembler
    if not stencil:
        os.environ["FDTPU_NO_STENCIL"] = "1"
    try:
        mesh = UnitSquareMesh(n, n)
        V = FunctionSpace(mesh, "CG", degree)
        u, v = TrialFunction(V), TestFunction(V)
        asm = FormAssembler(inner(grad(u), grad(v)) * dx + u * v * dx)
    finally:
        os.environ.pop("FDTPU_NO_STENCIL", None)
    used_stencil = asm._stencil is not None
    coords = jnp.asarray(mesh.coordinates.dat)
    ncd = coords.shape[0]
    if used_stencil:
        st, ac = None, None
    else:
        st, ac = asm._arg_statics, asm._acc_args

    @jax.jit
    def run(r, c0, cds):
        def body(i, carry):
            c = cds + 1e-20 * carry.reshape(-1)[:ncd]
            return asm._run(c, {}, {}, arg_statics=st, acc=ac)
        return jax.lax.fori_loop(0, r, body, c0)

    spec = jax.eval_shape(
        lambda c: asm._run(c, {}, {}, arg_statics=st, acc=ac), coords)
    z = jnp.zeros(spec.shape, spec.dtype)

    def call(r):
        return float(run(r, z, coords).reshape(-1)[0])

    dt, R, base = per_rep(call)
    return dict(n=n, degree=degree, stencil=used_stencil, dofs=V.dim,
                sec=dt, mdofs=V.dim / dt / 1e6, reps=R, base=base)


def spmv_bench(n, degree=1, stencil=True):
    from firedrake_tpu import (FunctionSpace, TestFunction, TrialFunction,
                               UnitSquareMesh, inner, grad, dx, assemble)
    if not stencil:
        os.environ["FDTPU_NO_STENCIL"] = "1"
    try:
        mesh = UnitSquareMesh(n, n)
        V = FunctionSpace(mesh, "CG", degree)
        u, v = TrialFunction(V), TestFunction(V)
        A = assemble(inner(grad(u), grad(v)) * dx + u * v * dx)
    finally:
        os.environ.pop("FDTPU_NO_STENCIL", None)
    x = jnp.ones(V.dim)
    mv = A.matvec

    @jax.jit
    def run(r, x0):
        def body(i, xc):
            return mv(xc) * (1.0 / (1.0 + 1e-9))
        return jax.lax.fori_loop(0, r, body, x0)

    def call(r):
        return float(run(r, x)[0])

    dt, R, base = per_rep(call)
    nnz = int(A.nnz if hasattr(A, "nnz") else A.sparsity.nnz)
    return dict(n=n, dofs=V.dim, sec=dt, gflops=2.0 * nnz / dt / 1e9,
                nnz=nnz, reps=R, base=base,
                stencil=type(A).__name__ == "StencilMatrix")


def solve_bench(nbase, levels, degree=1):
    import math
    from firedrake_tpu import (FunctionSpace, TestFunction, TrialFunction,
                               SpatialCoordinate, UnitSquareMesh,
                               MeshHierarchy, DirichletBC, inner, grad,
                               dx, sin, assemble)
    from firedrake_tpu.mg.vcycle import GMGPreconditioner
    from firedrake_tpu.solving import _run_ksp, _bc_data
    hier = MeshHierarchy(UnitSquareMesh(nbase, nbase), levels)
    mesh = hier.meshes[-1]
    V = FunctionSpace(mesh, "CG", degree)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = 2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1])
    a = inner(grad(u), grad(v)) * dx
    L = f * v * dx
    bc = DirichletBC(V, 0.0, "on_boundary")
    A = assemble(a, bcs=[bc])
    bc_idx, _ = _bc_data([bc], V.dim)
    A = A.with_dirichlet(jnp.asarray(bc_idx))
    mask = np.ones(V.dim)
    mask[bc_idx] = 0.0
    b = jnp.asarray(assemble(L).dat) * jnp.asarray(mask)
    pc = GMGPreconditioner(a, [bc], V)
    params = {"ksp_type": "cg", "ksp_rtol": 1e-10}
    solver = jax.jit(lambda bb: _run_ksp(A.matvec, bb, params, pc=pc))
    res = solver(b)                                  # warm + compile
    float(res.x[0])
    t0 = time.perf_counter()
    res = solver(b)
    float(res.x[0])
    dt = time.perf_counter() - t0
    return dict(dofs=V.dim, seconds=dt, iterations=int(res.iterations),
                stencil=type(A).__name__ == "StencilMatrix")


def main():
    out = {}
    for args in sys.argv[1:]:
        kind, n, *rest = args.split(":")
        n = int(n)
        deg = int(rest[0]) if rest else 1
        stencil = "nostencil" not in rest
        key = args
        try:
            if kind == "asm":
                out[key] = assembly_bench(n, deg, stencil)
            elif kind == "spmv":
                out[key] = spmv_bench(n, deg, stencil)
            elif kind == "gmg":
                out[key] = solve_bench(n, deg)   # deg slot = levels
        except Exception as e:
            out[key] = {"error": repr(e)[:300]}
        print(key, "->", json.dumps(out[key]), file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
