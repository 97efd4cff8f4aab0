"""FacetSplitPC: interior/facet dof splitting (reference:
firedrake/preconditioners/facet_split.py:272 FacetSplitPC).

The reference restricts the element into its "interior" and "facet"
parts, rebuilds the form on the resulting mixed space, and hands the
permuted system to a sub-PC under the ``facet_`` prefix — the standard
route to statically-condensed solvers for high-degree CG (interior
dofs eliminated cell-locally, the global solve lives on the facet
skeleton).

TPU-first shape: the split is pure numbering arithmetic — with our
offset-based global numbering (functionspace.py:8) the cell-interior
dofs are exactly the dofs of the top-dimensional entity class, so the
permutation falls out of the offsets table with no element surgery.
The permuted operator is sliced into 2x2 ELL blocks and the whole
``facet_*`` options tree (any fieldsplit/schur/ksp nesting) builds on
it through the standard composition layer; the composed apply is one
traceable program."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .pcs import PCBase

__all__ = ["FacetSplitPC"]


class _ISSpace:
    """Minimal function-space stand-in for an index-set block (enough
    for OpCtx/build_ksp: .dim and a mesh handle)."""

    num_sub_spaces = 0

    def __init__(self, dim, mesh_obj=None):
        self.dim = dim
        self.mesh_obj = mesh_obj


class _SplitSpace:
    """2-field stand-in so the stock fieldsplit builder runs on the
    permuted operator."""

    def __init__(self, dims, mesh_obj=None):
        self.subspaces = [_ISSpace(d, mesh_obj) for d in dims]
        self.offsets = np.concatenate([[0], np.cumsum(dims)])[:-1]
        self.num_sub_spaces = len(dims)
        self.dim = int(sum(dims))
        self.mesh_obj = mesh_obj


class _PermMat:
    """Permuted operator as 2x2 ELL blocks + a full-matrix matvec."""

    def __init__(self, csr, dims, mesh_obj=None):
        from .composition import EllMatrix
        self.shape = csr.shape
        self.blocks = {}
        offs = np.concatenate([[0], np.cumsum(dims)])
        for i in range(len(dims)):
            for j in range(len(dims)):
                sub = csr[offs[i]:offs[i + 1], offs[j]:offs[j + 1]]
                if sub.nnz:
                    self.blocks[(i, j)] = EllMatrix(
                        sub.tocsr(), row_space=None)
        self._full = EllMatrix(csr)
        self._csr = csr

    def matvec(self, x):
        return self._full.matvec(x)

    __matmul__ = matvec

    def diagonal(self):
        return self._full.diagonal()

    def to_scipy(self):
        return self._csr

    def to_dense(self):
        return self._csr.toarray()


def interior_facet_split(V):
    """(interior_dofs, facet_dofs) of V in its current numbering —
    interior = dofs of the top-dimensional entity class (cell
    interiors), facet = everything else (vertices/edges/faces)."""
    sdata = V.sdata
    D = V.mesh_obj.topology.dim
    interior_nodes = []
    for (d, a), off in sdata.offsets.items():
        if d != D:
            continue
        npe = sdata.npe_class.get((d, a), 0)
        cnt = sdata.mesh.topology.entity_class_counts(d).get(a, 0)
        if npe and cnt:
            interior_nodes.append(np.arange(off, off + cnt * npe,
                                            dtype=np.int64))
    interior_nodes = (np.concatenate(interior_nodes) if interior_nodes
                      else np.empty(0, dtype=np.int64))
    if sdata.node_perm is not None:
        interior_nodes = sdata.node_perm[interior_nodes]
    mask = np.zeros(sdata.num_nodes, dtype=bool)
    mask[interior_nodes] = True
    facet_nodes = np.nonzero(~mask)[0]
    interior_nodes = np.sort(interior_nodes)
    bs = V.block_size

    def expand(nodes):
        if bs == 1:
            return nodes
        return (nodes[:, None] * bs
                + np.arange(bs)[None, :]).reshape(-1)

    return expand(interior_nodes), expand(facet_nodes)


class FacetSplitPC(PCBase):
    """Split into interior/facet dofs and solve the permuted system
    under ``facet_*`` options (default: fieldsplit).  Options:
    ``facet_restriction_domain`` ("interior,facet" | "facet,interior" |
    a single domain — single domains solve that block only, with the
    other part handled by Jacobi, mirroring the reference's restricted
    solves)."""

    _prefix = "facet_"

    def initialize_ctx(self, ctx, params, prefix):
        from .composition import OpCtx, build_ksp, opt
        self.appctx = ctx.appctx
        V = ctx.space
        if ctx.mat is None or V is None:
            raise ValueError("FacetSplitPC needs an assembled matrix and "
                             "the problem's function space")
        if getattr(V, "num_sub_spaces", 1) > 1:
            raise ValueError("decomposition of mixed spaces is not "
                             "supported (reference facet_split.py:60)")
        interior, facet = interior_facet_split(V)
        if interior.size == 0:
            raise ValueError(
                f"{V.name} has no interior dofs to split off "
                "(degree too low for an interior/facet decomposition)")
        domains = [s.strip() for s in str(opt(
            params, prefix, self._prefix + "restriction_domain",
            "interior,facet")).split(",") if s.strip()]
        groups = {"interior": interior, "facet": facet}
        try:
            parts = [groups.pop(dom) for dom in domains]
        except KeyError as e:
            raise ValueError(f"unknown restriction domain {e}") from e
        rest = [g for g in groups.values()]        # unselected dofs last
        perm = np.concatenate(parts + rest)
        assert perm.size == V.dim
        inv = np.empty_like(perm)
        inv[perm] = np.arange(perm.size)
        self._perm = jnp.asarray(perm)
        self._inv = jnp.asarray(inv)

        csr = ctx.mat.to_scipy().tocsr()[perm][:, perm].tocsr()
        dims = [p.size for p in parts] + [g.size for g in rest]
        dims = [d for d in dims if d]
        A = _PermMat(csr, dims, V.mesh_obj)
        W = _SplitSpace(dims, V.mesh_obj)
        ictx = OpCtx(mat=A, space=W, form=None, bcs=(),
                     appctx=ctx.appctx)
        p = dict(params)
        sub = prefix + self._prefix
        p.setdefault(sub + "ksp_type", "preonly")
        p.setdefault(sub + "pc_type",
                     "fieldsplit" if len(dims) > 1 else "lu")
        self._solve = build_ksp(ictx, p, sub)

    def apply(self, r):
        return self._solve(r[self._perm])[self._inv]
