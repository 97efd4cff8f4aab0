"""On-chip A/B: f32 stencil assembly with the Pallas fused kernel
evaluator (FDTPU_PALLAS=1) vs the plain XLA trace — honest protocol
(forced materialization + 1-vs-R differencing; PERF_NOTES round 2b).

Run ALONE on the TPU (never concurrently with another TPU process).
Writes /tmp/pallas_ab.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(pallas, n=1024):
    os.environ["FDTPU_PREC"] = "f32"
    if pallas:
        os.environ["FDTPU_PALLAS"] = "1"
    else:
        os.environ.pop("FDTPU_PALLAS", None)
    import jax
    import jax.numpy as jnp
    from firedrake_tpu import (FunctionSpace, TestFunction,
                               TrialFunction, UnitSquareMesh, inner,
                               grad, dx)
    from firedrake_tpu.assemble import FormAssembler, _assembler_cache
    _assembler_cache.clear()
    mesh = UnitSquareMesh(n, n)
    V = FunctionSpace(mesh, "CG", 1)
    u, v = TrialFunction(V), TestFunction(V)
    asm = FormAssembler(inner(grad(u), grad(v)) * dx + u * v * dx)
    assert asm._stencil is not None
    coords = jnp.asarray(mesh.coordinates.dat)
    ncd = coords.shape[0]

    @jax.jit
    def run(r, c0, cds):
        def body(i, carry):
            c = cds + 1e-20 * carry.reshape(-1)[:ncd]
            return asm._run(c, {}, {})
        return jax.lax.fori_loop(0, r, body, c0)

    spec = jax.eval_shape(lambda c: asm._run(c, {}, {}), coords)
    z = jnp.zeros(spec.shape, spec.dtype)

    def call(r):
        return float(run(r, z, coords).reshape(-1)[0])

    call(1)
    t0 = time.perf_counter()
    call(1)
    base = time.perf_counter() - t0
    R = max(4, min(2000, int(20.0 / max(base, 4e-3))))
    t0 = time.perf_counter()
    call(R + 1)
    tR = time.perf_counter() - t0
    dt = max(tR - base, 1e-9) / R
    os.environ.pop("FDTPU_PREC", None)
    os.environ.pop("FDTPU_PALLAS", None)
    return dict(sec_per_assembly=dt, dofs=V.dim,
                dofs_per_sec=V.dim / dt, reps=R)


def main():
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
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    out = {}
    if which in ("xla", "both"):
        out["xla_f32"] = measure(False)
        print("xla_f32", json.dumps(out["xla_f32"]), flush=True)
    if which in ("pallas", "both"):
        out["pallas_f32"] = measure(True)
        print("pallas_f32", json.dumps(out["pallas_f32"]), flush=True)
    with open("/tmp/pallas_ab.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
