"""Preconditioner construction (reference: firedrake/preconditioners/ zoo,
PETSc PC composition via solver_parameters).  Round-1 set: none/jacobi +
host-side LU for `preonly` direct solves; the PC protocol is simply a
traceable callable z = pc(r), composable inside jitted Krylov loops."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def identity_pc(r):
    return r


def make_jacobi(diag):
    d = jnp.where(jnp.abs(diag) > 0, diag, 1.0)

    def pc(r):
        return r / d

    return pc


def make_pc(pc_type: str, A=None, params=None):
    """A is an assembled Matrix (or None for matrix-free with no PC).

    Legacy flat dispatch — new code should go through
    composition.build_pc (recursive options-tree composition)."""
    params = params or {}
    if pc_type in (None, "none"):
        return identity_pc
    if pc_type in ("jacobi", "bjacobi", "sor", "ilu", "icc"):
        if pc_type != "jacobi":
            import warnings
            warnings.warn(
                f"pc_type {pc_type!r} has no TPU-native implementation; "
                "substituting point-Jacobi (different convergence)",
                stacklevel=2)
        if A is None:
            raise ValueError(f"pc_type {pc_type!r} needs an assembled "
                             "matrix (got matfree); use 'none'")
        return make_jacobi(A.diagonal())
    if pc_type in ("patch", "asm", "star", "python_asm_star"):
        if A is None or getattr(A, "row_space", None) is None:
            raise ValueError("patch/asm pc needs an assembled matrix "
                             "with a row space")
        return make_star_patch(A, A.row_space)
    if pc_type == "vanka":
        return make_vanka_patch(A, A.row_space)
    raise NotImplementedError(f"pc_type {pc_type!r}")


def direct_solve(A, b):
    """Host-side sparse LU (the PETSc `-pc_type lu` + MUMPS role for
    moderate sizes; a batched device direct solver is future work).

    Consistent-singular systems (e.g. enclosed-flow Stokes whose
    pressure is defined up to a constant and no nullspace was given)
    fall back to a minimum-norm least-squares solve instead of
    returning NaNs — pivot order decides whether SuperLU notices the
    singularity, so this must not depend on dof numbering."""
    import warnings
    from scipy.sparse.linalg import spsolve, lsqr
    Asp = A.to_scipy().tocsc()
    bh = np.asarray(b)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        x = spsolve(Asp, bh)
    if not np.all(np.isfinite(x)):
        if Asp.shape[0] <= 5000:
            x, *_ = np.linalg.lstsq(Asp.toarray(), bh, rcond=None)
        else:
            x = lsqr(Asp, bh, atol=1e-14, btol=1e-14,
                     iter_lim=20 * Asp.shape[0])[0]
    return jnp.asarray(x)


def make_star_patch(A, V, multiplicative=False):
    """Vertex-star additive Schwarz smoother (reference:
    firedrake/preconditioners/asm.py ASMStarPC / PatchPC with
    construct_dim=0): one patch per mesh vertex containing every dof on
    entities whose closure includes the vertex.

    TPU shape: all patches are padded to one static size and solved as
    ONE batched dense inverse-apply (npatch, K, K) — the reference loops
    small LAPACK solves; here the batch rides the MXU."""
    import jax
    mesh = V.mesh_obj
    topo = mesh.topology
    cmap = V.cell_dof_map.astype(np.int64)
    cv = topo.cell_vertices
    nvert = len(mesh._vertex_coords)
    # vertex -> dofs of all incident cells (the star closure)
    patches = [set() for _ in range(nvert)]
    for c in range(topo.num_cells):
        dofs = cmap[c]
        for vv in cv[c]:
            patches[int(vv)].update(int(d) for d in dofs)
    patches = [sorted(p) for p in patches if p]
    return _batched_patch_pc(A.to_scipy().tocsr(), patches)


def _batched_patch_pc(Asp, patches):
    """Additive Schwarz over dof-index patches as ONE batched dense
    inverse-apply (npatch, K, K) riding the MXU — the tinyasm role."""
    K = max(len(p) for p in patches)
    npatch = len(patches)
    idx = np.zeros((npatch, K), dtype=np.int64)
    mask = np.zeros((npatch, K))
    for i, p in enumerate(patches):
        idx[i, :len(p)] = p
        mask[i, :len(p)] = 1.0
    Ap = np.zeros((npatch, K, K))
    for i, p in enumerate(patches):
        sub = Asp[np.ix_(p, p)].toarray()
        n = len(p)
        Ap[i, :n, :n] = sub
        # pad with identity so the batched inverse stays well-posed
        Ap[i, n:, n:] = np.eye(K - n)
    from ..ops.batched_inverse import batched_inv
    Apinv = jnp.asarray(batched_inv(jnp.asarray(Ap)))
    idx_j = jnp.asarray(idx)
    mask_j = jnp.asarray(mask)

    def pc(r):
        # plain additive Schwarz: z = sum_p R_p^T A_p^-1 R_p r (SPD as a
        # sum of SPD terms — safe under CG)
        rp = r[idx_j] * mask_j                       # (npatch, K)
        zp = jnp.einsum("pij,pj->pi", Apinv, rp) * mask_j
        return jnp.zeros_like(r).at[idx_j.reshape(-1)].add(
            zp.reshape(-1))

    return pc


def make_vanka_patch(A, W, exclude_field=None, seed_field=None):
    """Vanka smoother for mixed (saddle-point) systems (reference:
    firedrake/preconditioners/asm.py ASMVankaPC, patch.py vanka
    construction): one patch per dof of the SEED field (default: the
    last field, e.g. pressure), containing that dof plus every dof of
    the other fields it couples to — the row/column nonzeros of the
    off-diagonal blocks. Patch solves are one batched dense inverse.

    exclude_field accepted for option-compat (a field never included as
    seed)."""
    import scipy.sparse as sp
    if W is None or not getattr(W, "num_sub_spaces", 0):
        raise ValueError("vanka needs a mixed function space")
    nf = W.num_sub_spaces
    if seed_field is None:
        seed_field = nf - 1
        if exclude_field is not None and int(exclude_field) == seed_field:
            seed_field = nf - 2
    Asp = A.to_scipy().tocsr()
    Acsc = Asp.tocsc()
    off = int(W.offsets[seed_field])
    dim = W.subspaces[seed_field].dim
    patches = []
    for s in range(off, off + dim):
        row = Asp.indices[Asp.indptr[s]:Asp.indptr[s + 1]]
        col = Acsc.indices[Acsc.indptr[s]:Acsc.indptr[s + 1]]
        p = set(int(i) for i in row) | set(int(i) for i in col)
        p.add(s)
        # drop other seed-field dofs: classic Vanka couples one pressure
        # dof with its velocity neighbourhood only
        p = {i for i in p if not (off <= i < off + dim) or i == s}
        patches.append(sorted(p))
    return _batched_patch_pc(Asp, patches)
