"""Pin the round-4 CG+GMG solve drift (VERDICT r04 Weak #3).

Hypotheses to separate, in one sequential on-chip session:
  A. single-call solve timing includes a constant tunnel dispatch +
     scalar-readback round trip (sync mode) — the differenced 1-vs-R
     protocol cancels it;
  B. a preceding BULK d2h (round 4's f32_accuracy_gate read 200k f64
     values) makes later single-call timings worse than they would
     have been.

Protocol: fresh process -> solve_66k and solve_1m timed BOTH ways
(single-call and differenced) -> bulk 200k-value d2h -> re-time both
single-call.  Writes /tmp/solve_ab.json.  Run ALONE on the TPU.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def solve_setup(jax, nbase, levels, degree):
    import math
    import numpy as np
    import jax.numpy as jnp
    from firedrake_tpu import (FunctionSpace, TestFunction, TrialFunction,
                               SpatialCoordinate, UnitSquareMesh,
                               MeshHierarchy, DirichletBC, inner, grad,
                               dx, sin, assemble)
    from firedrake_tpu.mg.vcycle import GMGPreconditioner
    from firedrake_tpu.solving import _run_ksp, _bc_data

    base = UnitSquareMesh(nbase, nbase)
    hier = MeshHierarchy(base, levels)
    mesh = hier.meshes[-1]
    V = FunctionSpace(mesh, "CG", degree)
    u, v = TrialFunction(V), TestFunction(V)
    X = SpatialCoordinate(mesh)
    f = 2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1])
    a = inner(grad(u), grad(v)) * dx
    L = f * v * dx
    bc = DirichletBC(V, 0.0, "on_boundary")
    bc_idx, _ = _bc_data([bc], V.dim)
    A = assemble(a, bcs=[bc]).with_dirichlet(jnp.asarray(bc_idx))
    mask = np.ones(V.dim)
    mask[bc_idx] = 0.0
    b = jnp.asarray(assemble(L).dat) * jnp.asarray(mask)
    pc = GMGPreconditioner(a, [bc], V)
    params = {"ksp_type": "cg", "ksp_rtol": 1e-10}
    solver = jax.jit(lambda bb: _run_ksp(A.matvec, bb, params, pc=pc))

    @jax.jit
    def run(r, x0):
        def body(i, carry):
            rr = _run_ksp(A.matvec, b + 1e-30 * carry, params, pc=pc)
            return rr.x
        return jax.lax.fori_loop(0, r, body, x0)

    return solver, run, b, V.dim


def time_single(solver, b):
    res = solver(b)
    float(res.x[0])
    t0 = time.perf_counter()
    res = solver(b)
    float(res.x[0])
    return time.perf_counter() - t0


def time_diff(jax, run, b, budget=15.0):
    import jax.numpy as jnp
    z = jnp.zeros_like(b)

    def call(r):
        return float(run(r, z)[0])

    call(1)
    t0 = time.perf_counter()
    call(1)
    base = time.perf_counter() - t0
    R = max(4, min(200, int(budget / max(base, 4e-3))))
    t0 = time.perf_counter()
    call(R + 1)
    tR = time.perf_counter() - t0
    return max(tR - base, 1e-9) / R, R, base


def main():
    import os
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
    import jax.numpy as jnp
    import numpy as np

    out = {}
    probs = {"66k": (32, 3, 1), "1m": (32, 5, 1)}
    setups = {}
    for tag, (nb, lv, dg) in probs.items():
        solver, run, b, dim = solve_setup(jax, nb, lv, dg)
        setups[tag] = (solver, run, b)
        single = time_single(solver, b)
        diff, R, base1 = time_diff(jax, run, b)
        out[tag] = {"dofs": dim, "single_before_bulk_d2h": single,
                    "differenced": diff, "reps": R,
                    "one_rep_wall": base1}
        print(tag, json.dumps(out[tag]), flush=True)

    # bulk d2h: the round-4 gate read ~200k f64 values to host
    big = jnp.arange(200000, dtype=jnp.float64) * 1.000001
    t0 = time.perf_counter()
    _ = np.asarray(big)
    out["bulk_d2h_seconds"] = time.perf_counter() - t0
    print("bulk d2h:", out["bulk_d2h_seconds"], flush=True)

    for tag in probs:
        solver, run, b = setups[tag]
        out[tag]["single_after_bulk_d2h"] = time_single(solver, b)
        d2, R2, _ = time_diff(jax, run, b, budget=10.0)
        out[tag]["differenced_after_bulk_d2h"] = d2
        print(tag, "after bulk d2h:",
              json.dumps({k: out[tag][k] for k in
                          ("single_after_bulk_d2h",
                           "differenced_after_bulk_d2h")}), flush=True)

    with open("/tmp/solve_ab.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
