"""Benchmarks on the default JAX backend (TPU under the driver).

Prints ONE JSON line (the driver contract): P1 Poisson matrix-assembly
throughput at 1024^2 (1.05M dofs) through the structured-mesh stencil
path (assembly/stencil.py — zero gathers).  The full metric set (P2
assembly, stencil SpMV, CG+GMG solves at 66k/1M/16M dofs, and the
general gather path for unstructured parity) goes to
BENCH_DETAILS.json, which is rewritten INCREMENTALLY after every
metric so a killed run still leaves its completed measurements behind.

Delivery contract (round-5 hardening after BENCH_r04 rc=124):
- the headline JSON line is printed to stdout AS SOON AS its inputs
  exist (the first two metrics), not at the end — a timeout later in
  the run can no longer lose it;
- a global wall-clock budget (FDTPU_BENCH_BUDGET seconds, default
  1500) skips any metric that does not fit the remaining time, so the
  process exits 0 inside the driver's own timeout;
- metrics are ordered cheapest-and-most-important first; the two 3D
  programs (first remote compile through the tunnel can take tens of
  minutes on a cold .jax_cache) run LAST;
- a drift check compares each metric against BENCH_EXPECT.json
  (best-known values from prior rounds) and prints a WARN line for
  >1.5x regressions (round-3->4 solve drift went unflagged; never
  again).

Methodology (PERF_NOTES.md round 2b): through the axon tunnel,
`block_until_ready` can return before the remote work completes, so
every timed call FORCES materialization by reading one scalar of the
result back.  Work is repeated ON DEVICE via lax.fori_loop with a
non-factorable carry->input dependency; differencing a 1-rep call
against an R-rep call cancels the constant dispatch + readback
overhead.  Rep counts stay under the ~60 s remote execution watchdog.
Round 5: the SOLVE benches use the same differencing protocol (the
round-4 single-call solve numbers included one ~50-600 ms dispatch +
scalar-readback round trip, which is what doubled them vs round 3 —
see PERF_NOTES round 5).  The f32 accuracy gate compares on DEVICE
and reads back one scalar, so no bulk d2h ever precedes a timing.

Baseline: the reference publishes no numbers (BASELINE.md); Firedrake-
class CPU assembly is memory-bandwidth-bound at roughly 1e7 assembled
DoFs/s/core (docs/source/parallelism.rst characterization), so
vs_baseline is value / 1e7.
"""
import json
import os
import sys
import time

BASELINE_DOFS_PER_SEC = 1.0e7
_T0 = time.perf_counter()
_BUDGET = float(os.environ.get("FDTPU_BENCH_BUDGET", "1500"))

# minimum remaining seconds to even start a metric (compile + 2 timed
# calls); the 3D entries get a larger floor because a cold cache means
# a long first remote compile.
_FLOOR = {"default": 90.0, "p2_assembly_3d_64": 240.0,
          "cg_gmg_16m": 300.0}


def _remaining():
    return _BUDGET - (time.perf_counter() - _T0)


def _setup():
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


def _per_rep(call, budget=20.0):
    """Per-repetition seconds from a forced-materialized (1, R) pair,
    R sized from the 1-rep wall to stay under the execution watchdog."""
    call(1)                             # warm (compile + sync path)
    t0 = time.perf_counter()
    call(1)
    base = time.perf_counter() - t0
    # long solves: a single R-rep remote execution must stay under the
    # tunnel's ~60-80 s execution watchdog, so floor R at 2 (dispatch
    # overhead is then <5% of a multi-second metric), not 4
    rmin = 4 if base < 5.0 else 2
    R = max(rmin, min(5000, int(budget / max(base, 4e-3))))
    t0 = time.perf_counter()
    call(R + 1)
    tR = time.perf_counter() - t0
    return max(tR - base, 1e-9) / R, R


HBM_GBPS = 819.0                # TPU v5e peak HBM bandwidth


def _assembly_bench(jax, n, degree, stencil=True, dim=2, prec=None,
                    pallas=None):
    """On-device repeated matrix assembly; returns dofs/s plus the
    achieved effective bandwidth (bytes of assembled output + gathered
    coords per second) against the HBM roofline — the BASELINE.json
    >50%-of-HBM gate, machine-checkable.  `prec` runs the FDTPU_PREC
    mixed-precision executor (reduced-dtype kernels, f64 accumulation;
    compiler/precision.py); `pallas` forces the fused Pallas cell
    evaluator on (1) or off (0) against its current default."""
    import numpy as np
    import jax.numpy as jnp
    from firedrake_tpu import (FunctionSpace, TestFunction, TrialFunction,
                               UnitSquareMesh, UnitCubeMesh, inner, grad,
                               dx)
    from firedrake_tpu.assemble import FormAssembler

    if not stencil:
        os.environ["FDTPU_NO_STENCIL"] = "1"
    if prec:
        os.environ["FDTPU_PREC"] = prec
    if pallas is not None:
        os.environ["FDTPU_PALLAS"] = str(pallas)
    try:
        mesh = UnitCubeMesh(n, n, n) if dim == 3 else UnitSquareMesh(n, n)
        V = FunctionSpace(mesh, "CG", degree)
        u, v = TrialFunction(V), TestFunction(V)
        asm = FormAssembler(inner(grad(u), grad(v)) * dx + u * v * dx)

        used_stencil = asm._stencil is not None
        coords = jnp.asarray(mesh.coordinates.dat)
        ncd = coords.shape[0]
        st = None if used_stencil else asm._arg_statics
        ac = None if used_stencil else asm._acc_args

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

        dt, R = _per_rep(call)
    finally:
        os.environ.pop("FDTPU_NO_STENCIL", None)
        os.environ.pop("FDTPU_PREC", None)
        if pallas is not None:
            os.environ.pop("FDTPU_PALLAS", None)
    out_bytes = int(np.prod(spec.shape)) * spec.dtype.itemsize
    in_bytes = coords.size * coords.dtype.itemsize
    gbps = (out_bytes + in_bytes) / dt / 1e9
    return dict(dofs=V.dim, sec_per_assembly=dt,
                dofs_per_sec=V.dim / dt, reps=R, stencil=used_stencil,
                prec=prec or "f64", out_bytes=out_bytes,
                effective_gbps=gbps, pct_hbm=100.0 * gbps / HBM_GBPS)


def _matvec_bench(jax, n, degree=1):
    """SpMV GFLOP/s (2 flops per CSR-pattern nonzero; the stencil form
    is counted by its CSR-equivalent nnz, not padded channel slots)."""
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
        return jax.lax.fori_loop(0, r, body, x0)

    def call(r):
        return float(run(r, x)[0])

    dt, R = _per_rep(call)
    nnz = int(A.nnz if hasattr(A, "nnz") else A.sparsity.nnz)
    gbps = (8.0 * nnz + 16.0 * V.dim) / dt / 1e9
    return dict(dofs=V.dim, sec_per_matvec=dt,
                gflops=2.0 * nnz / dt / 1e9, nnz=nnz, reps=R,
                stencil=type(A).__name__ == "StencilMatrix",
                effective_gbps=gbps, pct_hbm=100.0 * gbps / HBM_GBPS)


def _solve_bench(jax, nbase, levels, degree, dim=2, matfree=False,
                 rep_budget=15.0, chunked=False):
    """CG+GMG solve time at the KSP level on a structured hierarchy
    (stencil operators + stencil transfers), ONE jitted whole-solve
    program.  `seconds` is the 1-vs-R differenced per-solve time (the
    constant tunnel dispatch + scalar-readback round trip — 50-600 ms
    once the client is in synchronous mode — is cancelled out;
    PERF_NOTES round 5 pins this as the round-4 'drift').
    `seconds_single` is the raw single-call wall for continuity with
    rounds 3/4.  `matfree=True` runs the fine operator as an
    action-assembly MatrixFreeOperator (the 16M-dof north-star
    configuration — no channel planes at the fine level).

    `chunked=True` (the 16M entry): the whole-solve dispatch exceeds
    the tunnel's ~60-80 s remote-execution watchdog and crashes the
    TPU worker (round-5 probe), so run warm-restarted CG in
    ksp_max_it=FDTPU_SOLVE_CHUNK chunks — one watchdog-sized dispatch
    each, one rnorm scalar readback between chunks, stop at the global
    ||r|| <= rtol*||b|| criterion (ksp_atol carries it into each
    chunk's own while_loop so a chunk can stop mid-way)."""
    import math
    import numpy as np
    import jax.numpy as jnp
    from firedrake_tpu import (FunctionSpace, TestFunction, TrialFunction,
                               SpatialCoordinate, UnitSquareMesh,
                               UnitCubeMesh, MeshHierarchy, DirichletBC,
                               inner, grad, dx, sin, assemble)
    from firedrake_tpu.mg.vcycle import GMGPreconditioner
    from firedrake_tpu.solving import _run_ksp, _bc_data

    base = (UnitCubeMesh(nbase, nbase, nbase) if dim == 3
            else UnitSquareMesh(nbase, nbase))
    hier = MeshHierarchy(base, levels)
    mesh = hier.meshes[-1]
    V = FunctionSpace(mesh, "CG", degree)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = dim * math.pi ** 2
    for k in range(dim):
        f = f * sin(math.pi * X[k])
    a = inner(grad(u), grad(v)) * dx
    L = f * v * dx
    bc = DirichletBC(V, 0.0, "on_boundary")
    bc_idx, _ = _bc_data([bc], V.dim)
    if matfree:
        from firedrake_tpu.assembly.matfree import MatrixFreeOperator
        A = MatrixFreeOperator(a)
    else:
        A = assemble(a, bcs=[bc])
    A = A.with_dirichlet(jnp.asarray(bc_idx))
    pc_params = {}
    if matfree:
        # dof-vector-only MG levels: only the coarse base assembles
        # channel planes (its dense coarse inverse must also stay small
        # — a 36k-dof P2 coarse level would mean a 10 GB dense LU)
        pc_params["mg_matfree_threshold"] = 2e4
    mask = np.ones(V.dim)
    mask[bc_idx] = 0.0
    b = jnp.asarray(assemble(L).dat) * jnp.asarray(mask)
    pc = GMGPreconditioner(a, [bc], V, params=pc_params)
    params = {"ksp_type": "cg", "ksp_rtol": 1e-10}
    # ONE jitted whole-solve program (PETSc re-runs KSPSolve without
    # re-setup; retracing the while-loop per call would time Python).
    # hoisted_jit: closed-over level operators / transfer tables /
    # masks become runtime parameters, not HLO literals — at 16M dofs
    # plain jit serializes a program too large for the remote-compile
    # helper (HTTP 413; PERF_NOTES round 5).
    from firedrake_tpu.utils.hoist import hoisted_jit

    if chunked:
        K = int(os.environ.get("FDTPU_SOLVE_CHUNK", "4"))
        bnorm = float(jnp.linalg.norm(b))
        rtol = params["ksp_rtol"]
        cparams = dict(params)
        cparams["ksp_max_it"] = K
        cparams["ksp_atol"] = rtol * bnorm   # global criterion in-chunk
        z = jnp.zeros_like(b)
        step = hoisted_jit(
            lambda bb, xx: _run_ksp(A.matvec, bb, cparams, pc=pc, x0=xx),
            b, z)
        res = step(b, z)                             # warm + compile
        float(res.residual_norm)
        t0 = time.perf_counter()
        x, total_it = z, 0
        for _ in range(100):
            res = step(b, x)
            x = res.x
            total_it += int(res.iterations)
            if float(res.residual_norm) <= rtol * bnorm:
                break
        dt = time.perf_counter() - t0
        rel = float(jnp.linalg.norm(b - A.matvec(x)) / bnorm)
        return dict(dofs=V.dim, seconds=dt, seconds_single=dt, reps=1,
                    iterations=total_it, rel_residual=rel,
                    matfree=matfree, chunk_max_it=K)

    solver = hoisted_jit(
        lambda bb: _run_ksp(A.matvec, bb, params, pc=pc), b)
    res = solver(b)                                  # warm + compile
    float(res.x[0])

    # continuity number: single-call wall incl. one dispatch round trip
    t0 = time.perf_counter()
    res = solver(b)
    float(res.x[0])
    dt_single = time.perf_counter() - t0

    # honest per-solve time: R solves on device, carry-dependent rhs
    def run_loop(r, x0):
        def body(i, carry):
            rr = _run_ksp(A.matvec, b + 1e-30 * carry, params, pc=pc)
            return rr.x
        return jax.lax.fori_loop(0, r, body, x0)

    z = jnp.zeros_like(b)
    run = hoisted_jit(run_loop, 1, z)

    def call(r):
        return float(run(r, z)[0])

    dt, R = _per_rep(call, budget=rep_budget)

    rel = float(jnp.linalg.norm(b - A.matvec(res.x))
                / jnp.linalg.norm(b))
    return dict(dofs=V.dim, seconds=dt, seconds_single=dt_single,
                reps=R, iterations=int(res.iterations),
                rel_residual=rel, matfree=matfree)


def _prec_accuracy(jax, n):
    """Tolerance gate for the mixed-precision executor: max relative
    entry error of the f32-kernel assembly against full f64, computed
    ON DEVICE (one scalar readback — a bulk d2h here would flip the
    tunnel client into synchronous mode and poison every later
    timing; PERF_NOTES rounds 2b/5)."""
    import jax.numpy as jnp
    from firedrake_tpu import (FunctionSpace, TestFunction, TrialFunction,
                               UnitSquareMesh, inner, grad, dx, assemble)
    from firedrake_tpu.assemble import _assembler_cache

    def dense(prec):
        os.environ.pop("FDTPU_PREC", None)
        if prec:
            os.environ["FDTPU_PREC"] = prec
        _assembler_cache.clear()
        try:
            mesh = UnitSquareMesh(n, n)
            V = FunctionSpace(mesh, "CG", 1)
            u, v = TrialFunction(V), TestFunction(V)
            A = assemble(inner(grad(u), grad(v)) * dx + u * v * dx)
            dat = A.channels if hasattr(A, "channels") else A.data
            return jnp.asarray(dat).reshape(-1)
        finally:
            os.environ.pop("FDTPU_PREC", None)
            _assembler_cache.clear()

    a64 = dense(None)
    a32 = dense("f32")
    rel = float(jnp.abs(a32 - a64).max() / jnp.abs(a64).max())
    return dict(max_rel_err=rel, passed=bool(rel < 1e-5))


def _free_device():
    import gc
    from firedrake_tpu.assemble import _assembler_cache
    _assembler_cache.clear()
    gc.collect()


def _load_expect():
    try:
        with open("/root/repo/BENCH_EXPECT.json") as fh:
            return json.load(fh)
    except Exception:
        return {}


def _drift_check(name, result, expect):
    """WARN (stderr) when a metric regresses >1.5x vs its best-known
    value in BENCH_EXPECT.json."""
    exp = expect.get(name)
    if not exp or not isinstance(result, dict):
        return
    field, best, higher = exp["field"], exp["value"], exp["higher_is_better"]
    got = result.get(field)
    if got is None:
        return
    bad = (got < best / 1.5) if higher else (got > best * 1.5)
    if bad:
        print(f"WARN drift: {name}.{field} = {got:.6g} vs best-known "
              f"{best:.6g} (>1.5x regression)", file=sys.stderr,
              flush=True)


def main():
    jax = _setup()
    details = {}
    expect = _load_expect()
    headline_printed = [False]

    def flush_details():
        tmp = "/root/repo/BENCH_DETAILS.json.tmp"
        with open(tmp, "w") as fh:
            json.dump(details, fh, indent=1)
        os.replace(tmp, "/root/repo/BENCH_DETAILS.json")

    only = os.environ.get("FDTPU_BENCH_ONLY")
    only = set(only.split(",")) if only else None

    def metric(name, fn, *args, **kw):
        floor = _FLOOR.get(name, _FLOOR["default"])
        if only is not None and name not in only:
            return
        if _remaining() < floor:
            details[name] = {"skipped": "budget",
                             "remaining_s": round(_remaining(), 1)}
        else:
            try:
                details[name] = fn(jax, *args, **kw)
            except Exception as e:   # noqa: BLE001 — record and continue
                details[name] = {"error": str(e)[:300]}
            _free_device()
        print(name, "->", json.dumps(details[name]), file=sys.stderr,
              flush=True)
        _drift_check(name, details[name], expect)
        flush_details()

    def print_headline():
        """Exactly one JSON line on stdout, as early as possible."""
        if headline_printed[0]:
            return
        gate = details.get("f32_accuracy_gate", {})
        f32 = details.get("p1_assembly_1024_f32", {})
        if gate.get("passed") and "dofs_per_sec" in f32:
            name = "p1_poisson_assembly_throughput_f32kernels_f64acc"
            headline = f32["dofs_per_sec"]
        else:
            name = "p1_poisson_assembly_throughput"
            head = details.get("p1_assembly_1024", {})
            headline = head.get("dofs_per_sec") or details.get(
                "p1_assembly_512", {}).get("dofs_per_sec", 0.0)
        if not headline:
            return
        print(json.dumps({
            "metric": name,
            "value": round(headline, 1),
            "unit": "dof/s",
            "vs_baseline": round(headline / BASELINE_DOFS_PER_SEC, 3),
        }), flush=True)
        headline_printed[0] = True

    # --- headline inputs first; print the driver line immediately ---
    metric("p1_assembly_1024_f32", _assembly_bench, 1024, 1, prec="f32")
    metric("f32_accuracy_gate", _prec_accuracy, 64)
    print_headline()

    # --- timing-sensitive metrics (no bulk d2h has happened) ---
    metric("p1_assembly_1024", _assembly_bench, 1024, 1)
    print_headline()          # fallback headline if the f32 gate failed
    metric("spmv_1024", _matvec_bench, 1024)
    metric("cg_gmg_solve_66k", _solve_bench, 32, 3, 1)
    metric("cg_gmg_solve_1m", _solve_bench, 32, 5, 1)

    # --- breadth metrics ---
    metric("p2_assembly_512", _assembly_bench, 512, 2)
    metric("p1_assembly_512", _assembly_bench, 512, 1)
    metric("p1_assembly_gather_512", _assembly_bench, 512, 1,
           stencil=False)
    metric("p1_assembly_gather_512_f32", _assembly_bench, 512, 1,
           stencil=False, prec="f32")

    # --- north star (BASELINE.json): P2 Poisson on a cube at 16M dofs
    # — tet6 stencil hierarchy, matrix-free fine level, whole solve ONE
    # XLA program.  Run LAST: on a cold cache each first remote compile
    # can take tens of minutes and must not eat the other metrics. ---
    metric("p2_assembly_3d_64", _assembly_bench, 64, 2, dim=3)
    metric("cg_gmg_16m", _solve_bench, 8, 4, 2, dim=3, matfree=True,
           rep_budget=8.0, chunked=True)

    print_headline()
    flush_details()
    print(f"bench done in {time.perf_counter() - _T0:.1f}s "
          f"(budget {_BUDGET:.0f}s)", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
