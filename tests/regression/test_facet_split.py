"""FacetSplitPC (reference: tests/firedrake/regression/
test_facet_split.py — split a high-degree CG problem into interior and
facet dofs and solve the permuted system with fieldsplit)."""
import numpy as np

from firedrake_tpu import (UnitSquareMesh, FunctionSpace, Function,
                           TrialFunction, TestFunction,
                           SpatialCoordinate, DirichletBC, dx, inner,
                           grad, solve, errornorm)


def _problem(degree=3, quad=False, n=4):
    mesh = UnitSquareMesh(n, n, quadrilateral=quad)
    V = FunctionSpace(mesh, "CG", degree)
    u, v = TrialFunction(V), TestFunction(V)
    x, y = SpatialCoordinate(mesh)
    a = inner(grad(u), grad(v)) * dx
    L = (x - y) * v * dx
    bcs = [DirichletBC(V, 0.0, "on_boundary")]
    u_lu = Function(V)
    solve(a == L, u_lu, bcs=bcs,
          solver_parameters={"ksp_type": "preonly", "pc_type": "lu"})
    return V, a, L, bcs, u_lu


def test_facet_split_schur_matches_lu():
    """Schur over (interior, facet) with exact inner solves is an exact
    factorization: preonly application already matches LU."""
    V, a, L, bcs, u_lu = _problem(degree=3)
    u_fs = Function(V)
    solve(a == L, u_fs, bcs=bcs,
          solver_parameters={
              "ksp_type": "preonly",
              "pc_type": "python",
              "pc_python_type": "firedrake_tpu.FacetSplitPC",
              "facet_pc_type": "fieldsplit",
              "facet_pc_fieldsplit_type": "schur",
              "facet_pc_fieldsplit_schur_fact_type": "full",
              "facet_fieldsplit_0_ksp_type": "preonly",
              "facet_fieldsplit_0_pc_type": "lu",
              "facet_fieldsplit_1_ksp_type": "cg",
              "facet_fieldsplit_1_ksp_rtol": 1e-12,
              "facet_fieldsplit_1_ksp_max_it": 2000,
              "facet_fieldsplit_1_pc_type": "none"})
    assert errornorm(u_lu, u_fs) < 1e-7


def test_facet_split_as_preconditioner_quad():
    """Additive interior/facet fieldsplit as a CG preconditioner."""
    V, a, L, bcs, u_lu = _problem(degree=4, quad=True)
    u_fs = Function(V)
    solve(a == L, u_fs, bcs=bcs,
          solver_parameters={
              "ksp_type": "cg", "ksp_rtol": 1e-11,
              "pc_type": "python",
              "pc_python_type": "firedrake_tpu.FacetSplitPC",
              "facet_pc_fieldsplit_type": "symmetric_multiplicative",
              "facet_fieldsplit_0_pc_type": "lu",
              "facet_fieldsplit_1_pc_type": "lu"})
    assert errornorm(u_lu, u_fs) < 1e-8


def test_facet_split_restriction_domain():
    """facet,interior ordering permutes the fields."""
    V, a, L, bcs, u_lu = _problem(degree=3)
    u_fs = Function(V)
    solve(a == L, u_fs, bcs=bcs,
          solver_parameters={
              "ksp_type": "cg", "ksp_rtol": 1e-11,
              "pc_type": "python",
              "pc_python_type": "firedrake_tpu.FacetSplitPC",
              "facet_restriction_domain": "facet,interior",
              "facet_fieldsplit_0_pc_type": "lu",
              "facet_fieldsplit_1_pc_type": "lu"})
    assert errornorm(u_lu, u_fs) < 1e-8


def test_interior_facet_split_counts():
    from firedrake_tpu.solvers.facet_split import interior_facet_split
    mesh = UnitSquareMesh(3, 3)
    V = FunctionSpace(mesh, "CG", 4)
    interior, facet = interior_facet_split(V)
    # P4 triangle: 3 interior dofs per cell
    assert interior.size == 3 * mesh.num_cells
    assert interior.size + facet.size == V.dim
    assert np.intersect1d(interior, facet).size == 0
