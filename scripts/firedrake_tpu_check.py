#!/usr/bin/env python
"""Smoke check — a curated end-to-end subset (reference:
scripts/firedrake-check:15-38).  Runs in ~2 minutes on CPU:
    python scripts/firedrake_tpu_check.py
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    # CPU by default (the check is a correctness gate, not a benchmark);
    # opt into the TPU with FDTPU_CHECK_TPU=1
    if os.environ.get("FDTPU_CHECK_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")
    t0 = time.time()
    import firedrake_tpu as fd
    from firedrake_tpu import (
        FunctionSpace, VectorFunctionSpace, MixedFunctionSpace, Function,
        TestFunction, TrialFunction, TestFunctions, TrialFunctions,
        SpatialCoordinate, UnitSquareMesh, MeshHierarchy, DirichletBC,
        Constant, inner, dot, div, grad, dx, ds, dS, avg, jump, sin, cos,
        solve, errornorm, assemble, as_vector, VertexBasedLimiter,
        LinearVariationalProblem, LinearVariationalSolver)

    checks = []

    def check(name, fn):
        t = time.time()
        try:
            fn()
            checks.append((name, "OK", time.time() - t))
        except Exception as e:
            checks.append((name, f"FAIL: {type(e).__name__}: {e}",
                           time.time() - t))

    def poisson():
        mesh = UnitSquareMesh(16, 16)
        V = FunctionSpace(mesh, "CG", 2)
        u, v = TrialFunction(V), TestFunction(V)
        X = SpatialCoordinate(mesh)
        f = Function(V).interpolate(
            2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1]))
        uh = Function(V)
        solve(inner(grad(u), grad(v)) * dx == inner(f, v) * dx, uh,
              bcs=[DirichletBC(V, 0.0, "on_boundary")],
              solver_parameters={"ksp_type": "cg", "pc_type": "jacobi",
                                 "ksp_rtol": 1e-10})
        assert errornorm(sin(math.pi * X[0]) * sin(math.pi * X[1]),
                         uh) < 1e-3

    def gmg():
        mh = MeshHierarchy(UnitSquareMesh(4, 4), 2)
        V = FunctionSpace(mh[-1], "CG", 1)
        u, v = TrialFunction(V), TestFunction(V)
        X = SpatialCoordinate(mh[-1])
        f = Function(V).interpolate(sin(math.pi * X[0]))
        uh = Function(V)
        p = LinearVariationalProblem(
            inner(grad(u), grad(v)) * dx, inner(f, v) * dx, uh,
            bcs=[DirichletBC(V, 0.0, "on_boundary")])
        s = LinearVariationalSolver(
            p, solver_parameters={"ksp_type": "cg", "pc_type": "mg",
                                  "ksp_rtol": 1e-9})
        s.solve()
        assert s.ksp_iterations < 20

    def stokes_fieldsplit():
        mesh = UnitSquareMesh(4, 4)
        W = MixedFunctionSpace([VectorFunctionSpace(mesh, "CG", 2),
                                FunctionSpace(mesh, "CG", 1)])
        u, p = TrialFunctions(W)
        v, q = TestFunctions(W)
        X = SpatialCoordinate(mesh)
        a = (inner(grad(u), grad(v)) - p * div(v) - q * div(u)) * dx
        L = inner(Constant([0.0, 0.0]), v) * dx
        uex = as_vector([X[1] * (1 - X[1]), 0.0])
        Vv = W.subspaces[0]
        w = Function(W)
        prob = LinearVariationalProblem(
            a, L, w, bcs=[DirichletBC(
                W.sub(0), Function(Vv).interpolate(uex), (1, 2, 3, 4))])
        LinearVariationalSolver(prob, solver_parameters={
            "ksp_type": "gmres", "pc_type": "fieldsplit",
            "pc_fieldsplit_type": "schur",
            "fieldsplit_0_pc_type": "lu", "ksp_rtol": 1e-10,
            "ksp_gmres_restart": 100, "ksp_max_it": 2000}).solve()
        assert errornorm(uex, w.subfunctions[0]) < 1e-7

    def dg_advection():
        mesh = UnitSquareMesh(8, 8)
        V = FunctionSpace(mesh, "DG", 1)
        X = SpatialCoordinate(mesh)
        from firedrake_tpu import conditional, ge, FacetNormal
        q = Function(V).interpolate(conditional(ge(X[0], 0.3), 1.0, 0.0))
        VertexBasedLimiter(V).apply(q)
        n = FacetNormal(mesh)
        val = assemble(jump(q) * jump(q) * dS)
        assert np.isfinite(val)

    def mixed_poisson_rt():
        mesh = UnitSquareMesh(8, 8)
        W = MixedFunctionSpace([FunctionSpace(mesh, "RT", 1),
                                FunctionSpace(mesh, "DG", 0)])
        sigma, u = TrialFunctions(W)
        tau, v = TestFunctions(W)
        X = SpatialCoordinate(mesh)
        f = Function(W.subspaces[1]).interpolate(
            2 * math.pi ** 2 * sin(math.pi * X[0]) * sin(math.pi * X[1]))
        a = (dot(sigma, tau) + div(tau) * u + div(sigma) * v) * dx
        w = Function(W)
        solve(a == -inner(f, v) * dx, w,
              solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
        assert errornorm(sin(math.pi * X[0]) * sin(math.pi * X[1]),
                         w.subfunctions[1]) < 0.15

    def checkpoint_io(tmpdir="/tmp"):
        from firedrake_tpu import CheckpointFile
        mesh = UnitSquareMesh(3, 3)
        V = FunctionSpace(mesh, "CG", 1)
        X = SpatialCoordinate(mesh)
        f = Function(V, name="f").interpolate(X[0])
        with CheckpointFile(f"{tmpdir}/fdtpu_check.h5", "w") as chk:
            chk.save_function(f)
        with CheckpointFile(f"{tmpdir}/fdtpu_check.h5", "r") as chk:
            m2 = chk.load_mesh("mesh")
            f2 = chk.load_function(m2, "f")
        assert np.allclose(np.asarray(f2.dat), np.asarray(f.dat))

    def adjoint_gradient():
        from firedrake_tpu.adjoint import (continue_annotation,
                                           pause_annotation, Control,
                                           ReducedFunctional,
                                           get_working_tape)
        get_working_tape().clear_tape()
        mesh = UnitSquareMesh(4, 4)
        V = FunctionSpace(mesh, "CG", 1)
        m = Function(V).assign(1.0)
        u = Function(V)
        v = TestFunction(V)
        continue_annotation()
        solve((inner(grad(u), grad(v)) - inner(m, v)) * dx == 0, u,
              bcs=[DirichletBC(V, 0.0, "on_boundary")],
              solver_parameters={"ksp_rtol": 1e-12})
        J = assemble(inner(u, u) * dx)
        pause_annotation()
        g = ReducedFunctional(J, Control(m)).derivative()
        assert np.linalg.norm(np.asarray(g.dat)) > 0

    def hybridization():
        mesh = UnitSquareMesh(4, 4)
        from firedrake_tpu import (MixedFunctionSpace, TrialFunctions,
                                   TestFunctions, dot, div)
        S = FunctionSpace(mesh, "RT", 1)
        Q = FunctionSpace(mesh, "DG", 0)
        W = MixedFunctionSpace([S, Q])
        sigma, u = TrialFunctions(W)
        tau, v = TestFunctions(W)
        a = (dot(sigma, tau) - u * div(tau) - div(sigma) * v) * dx
        L = -v * dx
        wh, wr = Function(W), Function(W)
        solve(a == L, wh, solver_parameters={
            "ksp_type": "preonly", "pc_type": "hybridization"})
        solve(a == L, wr, solver_parameters={
            "ksp_type": "preonly", "pc_type": "lu"})
        assert np.abs(np.asarray(wh.subfunctions[1].dat)
                      - np.asarray(wr.subfunctions[1].dat)).max() < 1e-9

    def adaptivity():
        from firedrake_tpu import refine_marked, Constant
        import firedrake_tpu as fd
        mesh = UnitSquareMesh(4, 4)
        m2 = refine_marked(mesh, np.arange(mesh.num_cells) % 3 == 0)
        assert abs(assemble(Constant(1.0) * fd.dx(domain=m2))
                   - 1.0) < 1e-12

    check("poisson (CG2, strong bcs, CG+Jacobi)", poisson)
    check("geometric multigrid", gmg)
    check("stokes fieldsplit/schur", stokes_fieldsplit)
    check("DG jump/limiter", dg_advection)
    check("mixed poisson RT1xDG0", mixed_poisson_rt)
    check("hybridization pc", hybridization)
    check("adaptive refinement", adaptivity)
    check("checkpoint roundtrip", checkpoint_io)
    check("adjoint gradient", adjoint_gradient)

    print(f"\nfiredrake_tpu check ({time.time() - t0:.1f}s total):")
    nfail = 0
    for name, status, dt in checks:
        print(f"  [{status.split(':')[0]:4s}] {name} ({dt:.1f}s)"
              + ("" if status == "OK" else f"  {status}"))
        nfail += status != "OK"
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
