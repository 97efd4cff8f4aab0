"""Benchmarks on the default JAX backend (TPU under the driver).

Prints ONE JSON line (the driver contract): P1 Poisson matrix-assembly
throughput.  The full BASELINE.json metric set (P2 assembly, SpMV
GFLOP/s, CG+GMG solve time) is measured too, written to
BENCH_DETAILS.json.

Methodology (PERF_NOTES.md round 2b): through the axon tunnel,
`block_until_ready` can return before the remote work completes, so
every timed call FORCES materialization by reading one scalar of the
result back.  Work is repeated ON DEVICE via lax.fori_loop with a
non-factorable carry->input dependency (a pure coordinate scale is
algebraically transparent to XLA and gets hoisted); differencing a
1-rep call against an R-rep call cancels the constant dispatch +
readback overhead.  Rep counts are chosen to stay under the ~60 s
remote execution watchdog.

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


def _per_rep(call):
    """Per-repetition seconds from a forced-materialized (1, R) pair,
    R sized from the 1-rep wall to stay under the execution watchdog."""
    call(1)                             # warm (compile + sync path)
    t0 = time.perf_counter()
    call(1)
    base = time.perf_counter() - t0
    R = max(8, min(5000, int(20.0 / max(base, 4e-3))))
    t0 = time.perf_counter()
    call(R + 1)
    tR = time.perf_counter() - t0
    return max(tR - base, 1e-9) / R, R


def _assembly_bench(jax, n, degree):
    """On-device repeated matrix assembly; returns dofs/s."""
    import jax.numpy as jnp
    from firedrake_tpu import (FunctionSpace, TestFunction, TrialFunction,
                               UnitSquareMesh, inner, grad, dx)
    from firedrake_tpu.assemble import get_assembler

    mesh = UnitSquareMesh(n, n)
    V = FunctionSpace(mesh, "CG", degree)
    u, v = TrialFunction(V), TestFunction(V)
    asm = get_assembler(inner(grad(u), grad(v)) * dx)
    coords = jnp.asarray(mesh.coordinates.dat)
    statics, acc = asm._arg_statics, asm._acc_args

    @jax.jit
    def run(r, c0, cds, st, ac):
        nc = cds.shape[0]

        def body(i, carry):
            c = cds + 1e-20 * carry[:nc]
            return asm._run(c, {}, {}, arg_statics=st, acc=ac)
        out = jax.lax.fori_loop(0, r, body, c0)
        return out[0]

    z = jnp.zeros(asm.sparsity.nnz)

    def call(r):
        return float(run(r, z, coords, statics, acc))

    dt, R = _per_rep(call)
    return V.dim / dt, V.dim, dt, R


def _matvec_bench(jax, n, degree=1):
    """SpMV GFLOP/s (ELL form; 2 flops per stored nonzero)."""
    import jax.numpy as jnp
    from firedrake_tpu import (FunctionSpace, TestFunction, TrialFunction,
                               UnitSquareMesh, inner, grad, dx, assemble)

    mesh = UnitSquareMesh(n, n)
    V = FunctionSpace(mesh, "CG", degree)
    u, v = TrialFunction(V), TestFunction(V)
    A = assemble(inner(grad(u), grad(v)) * dx + u * v * dx)
    x = jnp.ones(V.dim)
    mv = A.matvec

    @jax.jit
    def run(r, x0):
        def body(i, xc):
            return mv(xc) * (1.0 / (1.0 + 1e-9))
        return jax.lax.fori_loop(0, r, body, x0)[0]

    def call(r):
        return float(run(r, x))

    dt, R = _per_rep(call)
    nnz = int(A.sparsity.nnz)
    return 2.0 * nnz / dt / 1e9, V.dim, dt, R


def _solve_bench(jax, nbase, levels, degree):
    """CG+GMG solve wall time at the KSP level — setup is d2h-free
    (device Chebyshev bounds + device coarse inverse; PERF_NOTES 2b);
    the timed call is forced-materialized via one scalar read."""
    import math
    import numpy as np
    import jax.numpy as jnp
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
    # chebyshev coarse solve: the Pallas Gauss-Jordan inverse inside
    # the nested CG+V-cycle program crashes the remote compile helper
    # (SIGABRT); a 30-step Chebyshev coarse sweep is PC-grade accurate
    pc = GMGPreconditioner(a, [bc], V, params={
        "mg_coarse_ksp_type": "chebyshev",
        "mg_coarse_ksp_max_it": 30,
        "mg_coarse_ksp_rtol": 0.0,
        "mg_coarse_pc_type": "jacobi"})
    params = {"ksp_type": "cg", "ksp_rtol": 1e-10}
    res = _run_ksp(A.matvec, b, params, pc=pc)       # warm + compile
    float(res.x[0])
    t0 = time.perf_counter()
    res = _run_ksp(A.matvec, b, params, pc=pc)
    float(res.x[0])
    dt = time.perf_counter() - t0
    return dt, V.dim, int(res.iterations)


def _free_device():
    """Drop cached assemblers (their statics hold multi-GB tile-padded
    device mirrors: a (C, 3) int32 map pads its minor dim 3 -> 128) so
    each metric starts with a clean HBM."""
    import gc
    from firedrake_tpu.assemble import _assembler_cache
    _assembler_cache.clear()
    gc.collect()


def main():
    jax = _setup()
    details = {}

    val, dofs, dt, R = _assembly_bench(jax, 512, 1)
    details["p1_assembly_512"] = {
        "dofs": dofs, "sec_per_assembly": dt, "dofs_per_sec": val,
        "reps": R}
    headline = val
    _free_device()

    try:
        v2, d2, t2, R2 = _assembly_bench(jax, 256, 2)
        details["p2_assembly_256"] = {
            "dofs": d2, "sec_per_assembly": t2, "dofs_per_sec": v2,
            "reps": R2}
    except Exception as e:       # noqa: BLE001 — record and continue
        details["p2_assembly_256"] = {"error": str(e)[:200]}
    _free_device()

    try:
        gf, d3, t3, R3 = _matvec_bench(jax, 512)
        details["spmv_512"] = {
            "dofs": d3, "sec_per_matvec": t3, "gflops": gf, "reps": R3}
    except Exception as e:
        details["spmv_512"] = {"error": str(e)[:200]}
    _free_device()

    try:
        dt4, d4, its = _solve_bench(jax, 32, 3, 1)
        details["cg_gmg_solve_p1"] = {"dofs": d4, "seconds": dt4,
                                      "iterations": its}
    except Exception as e:
        details["cg_gmg_solve_p1"] = {"error": str(e)[:200]}

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
