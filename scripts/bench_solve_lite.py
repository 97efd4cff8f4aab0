"""One-number bisection probe: differenced CG+GMG solve time at 66k
dofs (plus the 1M config with --big).  Run ALONE on the TPU from a
worktree: PYTHONPATH=<tree>:/root/.axon_site python .../bench_solve_lite.py
"""
import json
import sys


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
    sys.path.insert(0, "/root/repo/scripts")
    from bench_solve_ab import solve_setup, time_single, time_diff

    big = "--big" in sys.argv
    nb, lv = (32, 5) if big else (32, 3)
    solver, run, b, dim = solve_setup(jax, nb, lv, 1)
    single = time_single(solver, b)
    diff, R, base1 = time_diff(jax, run, b, budget=10.0)
    print(json.dumps({"dofs": dim, "single": single,
                      "differenced": diff, "reps": R}), flush=True)


if __name__ == "__main__":
    main()
