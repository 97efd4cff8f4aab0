"""TPU A/B: extruded column-compressed assembly vs the general gather
path on a tall domain (the VERDICT round-3 item-4 gate: >=2x).

Honest protocol (PERF_NOTES round 2b): force materialization by reading
ONE scalar; repeat on device via lax.fori_loop with a non-factorable
carry; difference 1-rep vs R-rep.  Run ALONE (never two TPU procs).

Usage: python scripts/bench_extruded_tpu.py asm:hex:64:64 asm:hex:64:64:nocolumn ...
  kind: asm (matrix), rhs (vector), spmv
  cell: hex | prism | quad ; then n (base), nlay, optional degree,
  optional 'nocolumn'.
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


def _mesh(cell, n, nlay):
    from firedrake_tpu import UnitIntervalMesh, UnitSquareMesh
    from firedrake_tpu.mesh.utility import ExtrudedMesh
    if cell == "quad":
        return ExtrudedMesh(UnitIntervalMesh(n), nlay)
    if cell == "hex":
        return ExtrudedMesh(UnitSquareMesh(n, n, quadrilateral=True), nlay)
    return ExtrudedMesh(UnitSquareMesh(n, n), nlay)


def form_bench(cell, n, nlay, degree=1, column=True, rank=2):
    from firedrake_tpu import (FunctionSpace, TestFunction, TrialFunction,
                               inner, grad, dx)
    from firedrake_tpu.assemble import FormAssembler
    if not column:
        os.environ["FDTPU_NO_COLUMN"] = "1"
    try:
        mesh = _mesh(cell, n, nlay)
        V = FunctionSpace(mesh, "CG", degree)
        u, v = TrialFunction(V), TestFunction(V)
        if rank == 2:
            form = inner(grad(u), grad(v)) * dx + u * v * dx
        else:
            from firedrake_tpu import Constant
            form = inner(Constant(1.0), v) * dx
        asm = FormAssembler(form)
    finally:
        os.environ.pop("FDTPU_NO_COLUMN", None)
    used = asm._column is not None
    coords = jnp.asarray(mesh.coordinates.dat)
    ncd = coords.shape[0]
    st = None if used else asm._arg_statics
    ac = None if used else asm._acc_args
    cv = {c.count: jnp.asarray(c.values()) for c in asm.constants}

    @jax.jit
    def run(r, c0, cds):
        def body(i, carry):
            # non-factorable carry->input dependency (PERF_NOTES 2b);
            # scalar add so rank-1 outputs (shorter than coords) work
            c = cds + 1e-20 * carry.reshape(-1)[0]
            return asm._run(c, {}, cv, arg_statics=st, acc=ac)
        return jax.lax.fori_loop(0, r, body, c0)

    spec = jax.eval_shape(
        lambda c: asm._run(c, {}, cv, arg_statics=st, acc=ac), coords)
    z = jnp.zeros(spec.shape, spec.dtype)

    def call(r):
        return float(run(r, z, coords).reshape(-1)[0])

    dt, R, base = per_rep(call)
    return dict(cell=cell, n=n, nlay=nlay, degree=degree, column=used,
                rank=rank, dofs=V.dim, sec=dt, mdofs=V.dim / dt / 1e6,
                reps=R, base=base)


def spmv_bench(cell, n, nlay, degree=1, column=True):
    from firedrake_tpu import (FunctionSpace, TestFunction, TrialFunction,
                               inner, grad, dx, assemble)
    if not column:
        os.environ["FDTPU_NO_COLUMN"] = "1"
    try:
        mesh = _mesh(cell, n, nlay)
        V = FunctionSpace(mesh, "CG", degree)
        u, v = TrialFunction(V), TestFunction(V)
        A = assemble(inner(grad(u), grad(v)) * dx + u * v * dx)
    finally:
        os.environ.pop("FDTPU_NO_COLUMN", None)
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
    return dict(cell=cell, n=n, nlay=nlay, dofs=V.dim, sec=dt,
                gflops=2.0 * nnz / dt / 1e9, nnz=nnz, reps=R, base=base,
                column=type(A).__name__ == "ColumnMatrix")


def main():
    out = {}
    for args in sys.argv[1:]:
        parts = args.split(":")
        kind, cell, n, nlay = parts[0], parts[1], int(parts[2]), \
            int(parts[3])
        deg = int(parts[4]) if len(parts) > 4 and parts[4].isdigit() else 1
        column = "nocolumn" not in parts
        try:
            if kind == "asm":
                out[args] = form_bench(cell, n, nlay, deg, column, rank=2)
            elif kind == "rhs":
                out[args] = form_bench(cell, n, nlay, deg, column, rank=1)
            elif kind == "spmv":
                out[args] = spmv_bench(cell, n, nlay, deg, column)
        except Exception as e:
            out[args] = {"error": repr(e)[:300]}
        print(args, "->", json.dumps(out[args]), file=sys.stderr,
              flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
