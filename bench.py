"""Benchmarks on the default JAX backend (TPU under the driver).

Prints ONE JSON line (the driver contract): P1 Poisson matrix-assembly
throughput.  The full BASELINE.json metric set (P2 assembly, ELL matvec
GFLOP/s, CG+GMG solve time) is measured too, written to
BENCH_DETAILS.json and echoed on stderr.

Methodology (PERF_NOTES.md): steady-state timing after compile; the
assembly program is repeated ON DEVICE via lax.fori_loop with a
carry->input dependency so the ~1-2 ms tunnel dispatch latency and d2h
readback are amortized out of the per-iteration cost.

Baseline: the reference publishes no numbers (BASELINE.md); Firedrake-
class CPU assembly is memory-bandwidth-bound at roughly 1e7 assembled
DoFs/s/core (docs/source/parallelism.rst characterization), so
vs_baseline is value / 1e7.
"""
import json
import sys
import time

BASELINE_DOFS_PER_SEC = 1.0e7


def _setup():
    import os
    os.environ.setdefault("FDTPU_NO_BATCHED", "1")
    import jax
    jax.config.update("jax_enable_x64", True)
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    return jax


def _assembly_bench(jax, n, degree, reps=10):
    """On-device repeated matrix assembly; returns dofs/s."""
    import jax.numpy as jnp
    from firedrake_tpu import (FunctionSpace, TestFunction, TrialFunction,
                               UnitSquareMesh, inner, grad, dx)
    from firedrake_tpu.assemble import get_assembler

    mesh = UnitSquareMesh(n, n)
    V = FunctionSpace(mesh, "CG", degree)
    u, v = TrialFunction(V), TestFunction(V)
    a = inner(grad(u), grad(v)) * dx
    asm = get_assembler(a)
    coords = jnp.asarray(mesh.coordinates.dat)
    statics, acc = asm._arg_statics, asm._acc_args

    import jax as _jax

    # statics/acc as ARGUMENTS, not closure constants (multi-MB embedded
    # literals blow up remote compiles — assemble.py)
    @_jax.jit
    def run(reps_, c0, cds, st, ac):
        def body(i, carry):
            # carry -> coords dependency defeats CSE across reps
            c = cds + 0.0 * carry[0]
            return asm._run(c, {}, {}, arg_statics=st, acc=ac)
        return _jax.lax.fori_loop(0, reps_, body, c0)

    def run_(r, c0):
        return run(r, c0, coords, statics, acc)

    out = run_(1, jnp.zeros(asm.sparsity.nnz))
    out.block_until_ready()            # compile + 1 rep
    t0 = time.perf_counter()
    out = run_(1, out)
    out.block_until_ready()
    t1 = time.perf_counter()           # 1-rep wall (dispatch + 1)
    out = run_(reps + 1, out)
    out.block_until_ready()
    t2 = time.perf_counter()           # (reps+1)-rep wall
    dt = max((t2 - t1) - (t1 - t0), 1e-9) / reps
    return V.dim / dt, V.dim, dt


def _matvec_bench(jax, n, degree=1, reps=20):
    """Assembled ELL SpMV GFLOP/s (2 flops per stored nonzero)."""
    import jax.numpy as jnp
    from firedrake_tpu import (FunctionSpace, TestFunction, TrialFunction,
                               UnitSquareMesh, inner, grad, dx, assemble)

    mesh = UnitSquareMesh(n, n)
    V = FunctionSpace(mesh, "CG", degree)
    u, v = TrialFunction(V), TestFunction(V)
    A = assemble(inner(grad(u), grad(v)) * dx + u * v * dx)
    x = jnp.ones(V.dim)
    mv = A.matvec

    def body(i, xc):
        return mv(xc)

    @jax.jit
    def run(r, x0):
        return jax.lax.fori_loop(0, r, body, x0)

    y = run(1, x)
    y.block_until_ready()
    t0 = time.perf_counter()
    y = run(1, y)
    y.block_until_ready()
    t1 = time.perf_counter()
    y = run(reps + 1, y)
    y.block_until_ready()
    t2 = time.perf_counter()
    dt = max((t2 - t1) - (t1 - t0), 1e-9) / reps
    nnz = int(A.nnz) if hasattr(A, "nnz") else A.to_scipy().nnz
    return 2.0 * nnz / dt / 1e9, V.dim, dt


def _solve_bench(jax, n, degree, pc):
    """End-to-end CG solve wall time (includes setup amortized out by
    solving twice and timing the second)."""
    import numpy as np
    import math
    import jax.numpy as jnp
    from firedrake_tpu import (FunctionSpace, Function, TestFunction,
                               TrialFunction, SpatialCoordinate,
                               UnitSquareMesh, DirichletBC, inner, grad,
                               dx, solve, sin)
    mesh = UnitSquareMesh(n, n)
    V = FunctionSpace(mesh, "CG", degree)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = 2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1])
    a = inner(grad(u), grad(v)) * dx
    L = f * v * dx
    bc = DirichletBC(V, 0.0, "on_boundary")
    params = {"ksp_type": "cg", "pc_type": pc, "ksp_rtol": 1e-10}
    w = Function(V)
    solve(a == L, w, bcs=[bc], solver_parameters=params)  # warm
    t0 = time.perf_counter()
    w2 = Function(V)
    solve(a == L, w2, bcs=[bc], solver_parameters=params)
    dt = time.perf_counter() - t0
    return dt, V.dim


def main():
    jax = _setup()
    details = {}

    val, dofs, dt = _assembly_bench(jax, 512, 1)
    details["p1_assembly_512"] = {
        "dofs": dofs, "sec_per_assembly": dt, "dofs_per_sec": val}
    headline = val

    try:
        v2, d2, t2 = _assembly_bench(jax, 1024, 1, reps=5)
        details["p1_assembly_1024"] = {
            "dofs": d2, "sec_per_assembly": t2, "dofs_per_sec": v2}
        headline = max(headline, v2)
    except Exception as e:       # noqa: BLE001 — record and continue
        details["p1_assembly_1024"] = {"error": str(e)[:200]}

    try:
        v2, d2, t2 = _assembly_bench(jax, 384, 2, reps=5)
        details["p2_assembly_384"] = {
            "dofs": d2, "sec_per_assembly": t2, "dofs_per_sec": v2}
    except Exception as e:
        details["p2_assembly_384"] = {"error": str(e)[:200]}

    try:
        gf, d3, t3 = _matvec_bench(jax, 512)
        details["ell_matvec_512"] = {
            "dofs": d3, "sec_per_matvec": t3, "gflops": gf}
    except Exception as e:
        details["ell_matvec_512"] = {"error": str(e)[:200]}

    try:
        dt4, d4 = _solve_bench(jax, 256, 1, "mg")
        details["cg_gmg_solve_256_p1"] = {"dofs": d4, "seconds": dt4}
    except Exception as e:
        details["cg_gmg_solve_256_p1"] = {"error": str(e)[:200]}

    with open("/root/repo/BENCH_DETAILS.json", "w") as fh:
        json.dump(details, fh, indent=1)
    print(json.dumps(details, indent=1), file=sys.stderr)

    print(json.dumps({
        "metric": "p1_poisson_assembly_throughput",
        "value": round(headline, 1),
        "unit": "dof/s",
        "vs_baseline": round(headline / BASELINE_DOFS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
