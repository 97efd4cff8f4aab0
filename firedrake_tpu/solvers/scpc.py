"""SCPC: static condensation of cell-interior dofs.

Reference: firedrake/slate/static_condensation/scpc.py (SCPC.initialize
:31 builds the condensed interface operator via Slate, :160 local
back-substitution).

Interior dofs (entity_dofs[cell_dim]) never couple across cells, so the
global Schur complement is the ASSEMBLY of per-cell Schur complements —
batched dense algebra on device:
    S_c = A_c[G, G] - A_c[G, I] A_c[I, I]^{-1} A_c[I, G]
    E_c = F_c[G]    - A_c[G, I] A_c[I, I]^{-1} F_c[I]
solve the (much smaller) interface system, then back-substitute
    u_I = A_c[I, I]^{-1} (F_c[I] - A_c[I, G] u_G)  per cell.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def solve_scpc(problem, params, appctx=None):
    from ..slate import _local_form_tensor
    from ..assembly.sparsity import Sparsity
    from ..assembly.matrix import Matrix
    from ..ops.batched_inverse import batched_inv
    from .preconditioners import direct_solve

    p = problem
    V = p.u.function_space()
    elem = V.element
    ed = elem.entity_dofs
    mesh = V.mesh_obj
    cdim = mesh.cell.dim
    islots = np.asarray(sorted(ed[cdim][0]), dtype=np.int64) \
        if ed.get(cdim, {}).get(0) else np.zeros(0, dtype=np.int64)
    if len(islots) == 0:
        raise ValueError("SCPC: the element has no cell-interior dofs "
                         "to condense (use a direct/Krylov solver)")
    nd = elem.ndof
    gslots = np.asarray([k for k in range(nd) if k not in set(islots)],
                        dtype=np.int64)

    # interface ("trace") numbering: compress the surviving global dofs
    cmap = V.cell_dof_map.astype(np.int64)
    interior_global = np.unique(cmap[:, islots].reshape(-1))
    keep = np.ones(V.dim, dtype=bool)
    keep[interior_global] = False
    cond_id = np.cumsum(keep) - 1          # global -> condensed index
    ncond = int(keep.sum())
    gmap = cond_id[cmap[:, gslots]]        # (nc, nG) condensed ids

    # batched local tensors (signs already canonical)
    A_loc = _local_form_tensor(p.a).cell                  # (nc, nd, nd)
    F_loc = (_local_form_tensor(p.L).cell if p.L is not None
             else jnp.zeros(A_loc.shape[:2]))             # (nc, nd)

    AII = A_loc[:, islots[:, None], islots[None, :]]
    AIG = A_loc[:, islots[:, None], gslots[None, :]]
    AGI = A_loc[:, gslots[:, None], islots[None, :]]
    AGG = A_loc[:, gslots[:, None], gslots[None, :]]
    AIIinv = batched_inv(AII)
    GIi = jnp.einsum("cij,cjk->cik", AGI, AIIinv)         # A_GI A_II^-1
    S_loc = AGG - jnp.einsum("cij,cjk->cik", GIi, AIG)
    E_loc = F_loc[:, gslots] - jnp.einsum(
        "cij,cj->ci", GIi, F_loc[:, islots])

    sp = Sparsity(ncond, ncond, [(np.asarray(gmap), np.asarray(gmap))])
    data = jnp.zeros(sp.nnz).at[jnp.asarray(
        sp.block_positions[0])].add(S_loc.reshape(len(A_loc), -1)
                                    .reshape(-1))
    S = Matrix(sp, data, None, None)
    rhs = jnp.zeros(ncond).at[jnp.asarray(gmap).reshape(-1)].add(
        E_loc.reshape(-1))

    # Dirichlet bcs live on interface dofs (boundary nodes are never
    # interior): row replacement + rhs values on the condensed system
    if p.bcs:
        from ..solving import _bc_data
        idx, g = _bc_data(p.bcs, V.dim)
        rows = jnp.asarray(cond_id[np.asarray(idx, dtype=np.int64)])
        vals = jnp.asarray(g[np.asarray(idx, dtype=np.int64)])
        # symmetric elimination with lifting (keeps the condensed
        # system SPD for inner CG)
        gfull = jnp.zeros(ncond).at[rows].set(vals)
        rhs = rhs - S.matvec(gfull)
        rhs = rhs.at[rows].set(vals)
        S = S.with_dirichlet(rows, symmetric=True)

    # condensed-system options under the condensed_field_ prefix
    # (nested solver_parameters are flattened in solving.py; legacy
    # nested access kept for direct callers)
    pre = "condensed_field_"
    sub = {(pre + k): v
           for k, v in dict(params.get("condensed_field", {})).items()}
    sub.update({k: v for k, v in params.items() if k.startswith(pre)})
    ksp = sub.get(pre + "ksp_type", "preonly")
    if ksp == "preonly" and sub.get(pre + "pc_type", "lu") in (
            "lu", "cholesky"):
        uG = direct_solve(S, rhs)
        its = 1
    else:
        # full recursive composition on the condensed operator
        from .composition import OpCtx, build_ksp
        sub.setdefault(pre + "ksp_rtol", 1e-7)
        sub.setdefault(pre + "ksp_max_it", 10000)
        ictx = OpCtx(mat=S, space=None, form=None, bcs=(),
                     appctx=appctx or {})
        tsolve = build_ksp(ictx, sub, pre)
        if ksp == "preonly":
            uG, its = tsolve(rhs), 1
        else:
            res = tsolve._full(rhs, x0=jnp.zeros(ncond))
            uG, its = res.x, int(res.iterations)

    # back-substitution of the interior dofs, per cell
    uG_loc = uG[jnp.asarray(gmap)]                        # (nc, nG)
    uI_loc = jnp.einsum(
        "cij,cj->ci", AIIinv,
        F_loc[:, islots] - jnp.einsum("cij,cj->ci", AIG, uG_loc))

    out = np.zeros(V.dim)
    out[keep] = np.asarray(uG)
    # interior dofs are cell-unique: direct write
    out[np.asarray(cmap[:, islots]).reshape(-1)] = \
        np.asarray(uI_loc).reshape(-1)
    p.u.dat = out
    return its
