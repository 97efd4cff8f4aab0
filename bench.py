"""Benchmark: P1 Poisson matrix assembly throughput on the default JAX
backend (TPU under the driver).  Prints ONE JSON line.

Baseline: the reference publishes no numbers (BASELINE.md); Firedrake-class
CPU assembly is memory-bandwidth-bound at roughly 1e7 assembled DoFs/s/core
(docs/source/parallelism.rst characterization + typical published runs), so
vs_baseline is value / 1e7.
"""
import json
import time

BASELINE_DOFS_PER_SEC = 1.0e7


def main():
    import os
    # The cell-last path compiles very slowly through the axon remote
    # compiler and does not beat cell-major on this chip yet
    # (PERF_NOTES.md); bench the proven path.
    os.environ.setdefault("FDTPU_NO_BATCHED", "1")
    import jax
    jax.config.update("jax_enable_x64", True)
    # persistent compile cache: remote compiles through the axon tunnel
    # take minutes; cache hits make repeat runs fast
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import firedrake_tpu as fd
    from firedrake_tpu import (FunctionSpace, TestFunction, TrialFunction,
                               UnitSquareMesh, inner, grad, dx)
    from firedrake_tpu.assemble import get_assembler

    n = 256
    mesh = UnitSquareMesh(n, n)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    a = inner(grad(u), grad(v)) * dx
    asm = get_assembler(a)

    coords = jnp.asarray(mesh.coordinates.dat)
    cd = {}
    cv = {}
    # index maps + accumulation table passed as jit ARGUMENTS (constants
    # blow up remote compile time)
    args = (coords, cd, cv, asm._arg_statics, asm._acc_args)
    # warmup/compile
    out = asm._jitted(*args)
    out.block_until_ready()
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = asm._jitted(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    dofs_per_sec = V.dim / dt
    print(json.dumps({
        "metric": "p1_poisson_assembly_throughput",
        "value": round(dofs_per_sec, 1),
        "unit": "dof/s",
        "vs_baseline": round(dofs_per_sec / BASELINE_DOFS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
