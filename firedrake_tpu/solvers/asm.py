"""Column-structured additive Schwarz smoothers for extruded meshes.

Reference surface: firedrake/preconditioners/asm.py —
ASMLinesmoothPC (:255, one patch per vertical column over a base-mesh
entity of chosen codimension) and ASMExtrudedStarPC (:381, vertex-star
patches swept through the full column).  The reference builds one
PETSc IS per patch and loops small LAPACK factorizations; here every
patch within a codimension has ONE static size — (n_base_entity_dofs x
column_height) — so the whole smoother is a single batched dense
inverse-apply riding the MXU (the tinyasm shape, solvers/
preconditioners.py _batched_patch_pc).

Patch construction is pure numbering arithmetic: with the column
renumbering (functionspace.py _maybe_column_renumber) a node id is
``base_node * Hd + z``, so the column over a base entity is a
contiguous z-run of each of its base nodes — no mesh traversal, no
section queries (the reference needs plex height strata + section
offsets, asm.py:283-306).
"""
from __future__ import annotations

import numpy as np

from .pcs import PCBase

__all__ = ["ASMLinesmoothPC", "ASMExtrudedStarPC",
           "entity_interior_nodes"]


def entity_interior_nodes(sdata, d):
    """(num_entities(d),) list of node-id arrays: the dofs *interior* to
    each dim-d mesh entity, in the space's current numbering (grid/
    column renumbering applied).  Pure offset arithmetic over the
    numbering scheme dof(d, g, k) = offsets[(d, a)] + g*npe + k."""
    topo = sdata.mesh.topology
    cls_idx = topo.entity_class_index(d)
    arity = topo.entity_arity(d)
    out = []
    for g in range(topo.num_entities(d)):
        a = int(arity[g])
        npe = sdata.npe_class.get((d, a), 0)
        if npe == 0:
            out.append(np.empty(0, dtype=np.int64))
            continue
        start = sdata.offsets[(d, a)] + int(cls_idx[g]) * npe
        out.append(np.arange(start, start + npe, dtype=np.int64))
    if sdata.node_perm is not None:
        perm = sdata.node_perm
        out = [perm[nodes] for nodes in out]
    return out


def _expand_block(nodes, bs):
    if bs == 1:
        return nodes
    return (nodes[:, None] * bs + np.arange(bs)[None, :]).reshape(-1)


def _column_patches(V, codims):
    """Patches of full vertical columns over base-mesh entities of the
    given codimensions (reference ASMLinesmoothPC.get_patches)."""
    col = getattr(V.sdata, "column", None)
    mesh = V.mesh_obj
    if not getattr(mesh, "_extruded", False):
        raise ValueError("linesmooth needs an extruded mesh")
    patches = []
    if col is not None and getattr(V.sdata, "column_numbered", False):
        base_sdata = col.base_sdata
        Hd = col.kz * col.nlay + 1
        db = base_sdata.mesh.topology.dim
        z = np.arange(Hd, dtype=np.int64)
        for c in codims:
            d = db - c
            if d < 0 or d > db:
                raise ValueError(f"codim {c} out of range for base "
                                 f"dimension {db}")
            for nodes_b in entity_interior_nodes(base_sdata, d):
                if nodes_b.size == 0:
                    continue
                nodes = (nodes_b[:, None] * Hd + z[None, :]).reshape(-1)
                patches.append(_expand_block(nodes, V.block_size))
        if patches:
            return patches
    # fallback without column metadata (DG / non-Lagrange spaces): the
    # codim-0 cell-column closure — all dofs of the nlay cells stacked
    # over one base cell (cells are numbered base-major: c = b*nlay + l)
    if set(codims) - {0}:
        raise NotImplementedError(
            "linesmooth codims other than 0 need a column-numbered "
            "scalar Lagrange space; this space has no column metadata")
    nlay = int(mesh._layers)
    cmap = V.cell_dof_map.astype(np.int64)
    ncell = cmap.shape[0]
    assert ncell % nlay == 0
    for b in range(ncell // nlay):
        dofs = np.unique(cmap[b * nlay:(b + 1) * nlay].reshape(-1))
        patches.append(dofs)
    return patches


class ASMLinesmoothPC(PCBase):
    """Line smoother for extruded meshes: one additive-Schwarz patch per
    vertical column over a base-mesh entity (reference asm.py:255).
    ``<prefix>pc_linesmooth_codims`` selects the base-entity
    codimensions (default "0,1", matching the reference)."""

    _prefix = "pc_linesmooth_"

    def initialize_ctx(self, ctx, params, prefix):
        from .composition import opt
        from .preconditioners import _batched_patch_pc
        self.appctx = ctx.appctx
        V = ctx.space
        if ctx.mat is None or V is None:
            raise ValueError("ASMLinesmoothPC needs an assembled matrix "
                             "and the problem's function space")
        codims = [int(s) for s in str(opt(
            params, prefix, self._prefix + "codims", "0,1")).split(",")
            if s.strip() != ""]
        patches = _column_patches(V, codims)
        if not patches:
            raise ValueError(f"no line patches for codims {codims} "
                             "(no dofs on those base entities)")
        self._pc = _batched_patch_pc(ctx.mat.to_scipy().tocsr(), patches)

    def apply(self, r):
        return self._pc(r)


class ASMExtrudedStarPC(PCBase):
    """Vertex-star patches swept through the vertical column (reference
    asm.py:381 ASMExtrudedStarPC): one patch per base-mesh vertex,
    containing every dof interior to a base entity incident to that
    vertex, over the FULL column height.  The workhorse smoother for
    parameter-robust multigrid on extruded meshes."""

    _prefix = "pc_star_"

    def initialize_ctx(self, ctx, params, prefix):
        from .preconditioners import _batched_patch_pc
        self.appctx = ctx.appctx
        V = ctx.space
        if ctx.mat is None or V is None:
            raise ValueError("ASMExtrudedStarPC needs an assembled "
                             "matrix and the problem's function space")
        col = getattr(V.sdata, "column", None)
        if col is None or not getattr(V.sdata, "column_numbered", False):
            raise NotImplementedError(
                "ASMExtrudedStarPC needs a column-numbered scalar "
                "Lagrange space (extruded mesh)")
        base_sdata = col.base_sdata
        topo = base_sdata.mesh.topology
        db = topo.dim
        Hd = col.kz * col.nlay + 1
        z = np.arange(Hd, dtype=np.int64)
        # base-vertex stars: entity (d, g) belongs to star(v) iff v is
        # one of its vertices (closure contains v)
        nvert = topo.num_vertices
        star_nodes = [[] for _ in range(nvert)]
        for d in range(db + 1):
            ent_nodes = entity_interior_nodes(base_sdata, d)
            if all(n.size == 0 for n in ent_nodes):
                continue
            ev = topo.entity_vertices(d)
            for g, verts in enumerate(np.asarray(ev)):
                nodes = ent_nodes[g]
                if nodes.size == 0:
                    continue
                for v in verts:
                    if v >= 0:
                        star_nodes[int(v)].append(nodes)
        patches = []
        for parts in star_nodes:
            if not parts:
                continue
            nodes_b = np.unique(np.concatenate(parts))
            nodes = (nodes_b[:, None] * Hd + z[None, :]).reshape(-1)
            patches.append(_expand_block(nodes, V.block_size))
        self._pc = _batched_patch_pc(ctx.mat.to_scipy().tocsr(), patches)

    def apply(self, r):
        return self._pc(r)


class ASMGridLinePC(PCBase):
    """Alternating-direction line smoother on STRUCTURED grids: one
    additive-Schwarz patch per grid line along each requested axis
    (default: every axis).  The 3D answer to the reference's
    PCPATCH/ASM line smoothers for anisotropy-free structured problems
    (reference asm.py:255 role): on a grid-numbered space every line is
    pure index arithmetic, and all lines of an axis share one static
    size, so the smoother is a few batched dense inverse-applies.
    ``<prefix>pc_gridline_axes`` selects axes, e.g. "2" or "0,1,2"."""

    _prefix = "pc_gridline_"

    def initialize_ctx(self, ctx, params, prefix):
        from .composition import opt
        from .preconditioners import _batched_patch_pc
        from ..assembly.stencil import _space_grid
        self.appctx = ctx.appctx
        V = ctx.space
        if ctx.mat is None or V is None:
            raise ValueError("ASMGridLinePC needs an assembled matrix "
                             "and the problem's function space")
        s = getattr(V.mesh_obj, "_structured", None)
        sg = _space_grid(V, s) if s is not None else None
        if sg is None:
            raise NotImplementedError(
                "ASMGridLinePC needs a grid-numbered Lagrange space on "
                "a structured mesh")
        gdims = np.asarray(sg.gdims, dtype=np.int64)
        D = len(gdims)
        axes = [int(a) for a in str(opt(
            params, prefix, self._prefix + "axes",
            ",".join(map(str, range(D))))).split(",") if a.strip() != ""]
        strides = np.cumprod(np.concatenate([[1], gdims[:-1]]))
        patches = []
        for ax in axes:
            if not 0 <= ax < D:
                raise ValueError(f"grid axis {ax} out of range")
            others = [a for a in range(D) if a != ax]
            base = np.zeros(1, dtype=np.int64)
            for a in others:
                base = (base[:, None]
                        + np.arange(gdims[a]) * strides[a]).reshape(-1)
            line = np.arange(gdims[ax]) * strides[ax]
            pat = base[:, None] + line[None, :]        # (nlines, L)
            patches.extend(_expand_block(p, V.block_size) for p in pat)
        self._pc = _batched_patch_pc(ctx.mat.to_scipy().tocsr(), patches)

    def apply(self, r):
        return self._pc(r)
