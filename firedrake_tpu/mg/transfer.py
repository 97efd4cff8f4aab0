"""Grid transfer: prolong / restrict / inject between hierarchy levels.

Reference: firedrake/mg/kernels.py:155/:256/:347 (TSFC-generated transfer
kernels executed as parloops, mg/interface.py:37,116,193) and
mg/mgimpl.pyx coarse<->fine maps.  Here the transfer is three tabulated
einsum/scatter programs baked per (hierarchy level, element):

  prolong:  fine nodal values = coarse basis at child-mapped fine nodes
  restrict: exact transpose of prolong (dual/residual transfer), using
            fine-dof multiplicity weighting for the cellwise transpose
  inject:   coarse nodal values = fine function at coarse node points
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .mesh import child_reference_maps
from ..functionspace import FunctionSpace


def _geometric_child_maps(mc, mf, type_of=None):
    """Per-type, per-child affine reference maps (A, b) with child_ref
    = A s + b, computed from actual vertex coordinates and VERIFIED
    against every coarse cell of the type (refinement is uniform within
    a type; orientation forcing at mesh build permutes vertices
    identically across same-type cells).  type_of: per-coarse-cell
    refinement variant (tets choose the shortest octahedron diagonal),
    None = single type."""
    tdim = mc.cell.dim
    Xc = mc._vertex_coords[mc.topology.cell_vertices]   # (nc, nv, g)
    Xf = mf._vertex_coords[mf.topology.cell_vertices]
    c2f = np.asarray(mf._c2f_cells)                     # (nc, nchild)
    v0 = Xc[:, 0]
    Ac = np.stack([Xc[:, k + 1] - Xc[:, 0] for k in range(tdim)],
                  axis=-1)                              # (nc, g, t)
    Aci = np.linalg.inv(Ac)
    # children of every coarse cell pulled back to coarse ref coords
    q = np.einsum("ctg,cnvg->cnvt", Aci,
                  Xf[c2f] - v0[:, None, None, :])       # (nc,nch,nv,t)
    if type_of is None:
        type_of = np.zeros(len(q), dtype=np.int64)
    ntypes = int(type_of.max()) + 1
    out_types = []
    for t in range(ntypes):
        qt = q[type_of == t]
        if not len(qt):
            # type unused on this mesh: placeholder identity maps (the
            # per-type tables are never gathered for an empty type)
            out_types.append([(np.eye(tdim), np.zeros(tdim))]
                             * c2f.shape[1])
            continue
        if not np.allclose(qt, qt[0][None], atol=1e-10):
            raise RuntimeError("refinement is not cell-uniform within "
                               "a type; cannot build transfer maps")
        maps = []
        for verts in qt[0]:                             # (nv, tdim)
            A = np.stack([verts[k + 1] - verts[0] for k in range(tdim)],
                         axis=1)
            maps.append((A, verts[0]))
        out_types.append(maps)
    return out_types


class LevelTransfer:
    """Transfer ops between Vc (coarse) and Vf (fine = refined mesh).

    Structured hierarchies carry PER-TYPE child reference maps
    (mf._child_maps — the two triangles of each grid quad refine
    differently); classic refinement has one type."""

    def __init__(self, Vc: FunctionSpace, Vf: FunctionSpace):
        self.Vc, self.Vf = Vc, Vf
        mc, mf = Vc.mesh_obj, Vf.mesh_obj
        assert getattr(mf, "_coarse_mesh", None) is mc, \
            "fine mesh is not a refinement of the coarse mesh"
        elem = Vc.scalar_element
        assert elem == Vf.scalar_element
        cmaps_by_type = getattr(mf, "_child_maps", None)
        if cmaps_by_type is None:
            # derive the child affine maps GEOMETRICALLY from the two
            # meshes (and verify them on every cell): the tabulated
            # child_reference_maps assume the built fine cells keep the
            # topological vertex order, but the mesh constructor forces
            # positive orientation by swapping vertices — on tets this
            # silently permuted children vs the assumed maps (broken
            # prolongation; caught by the 3D GMG regression)
            cmaps_by_type = _geometric_child_maps(
                mc, mf, getattr(mf, "_c2f_type_of", None))
        ntypes = len(cmaps_by_type)
        self.ntypes = ntypes
        nodes = elem.nodes                               # (nd, tdim)
        nd = elem.ndof
        self.P = []          # per type: (nchild, nd_fine, nd_coarse)
        self.child_of = []
        self.I = []
        for cmaps in cmaps_by_type:
            P = np.stack([elem.tabulate(nodes @ A.T + b, 0)[0]
                          for (A, b) in cmaps])          # (nchild, nd, nd)
            self.P.append(jnp.asarray(P))
            # injection: for each coarse node, owning child + basis vals
            child_of = np.zeros(nd, dtype=np.int64)
            I = np.zeros((nd, nd))
            for n, p in enumerate(nodes):
                for k, (A, b) in enumerate(cmaps):
                    q = np.linalg.solve(A, p - b)
                    if mc.cell.contains_points(q[None])[0]:
                        child_of[n] = k
                        I[n] = elem.tabulate(q[None], 0)[0][0]
                        break
                else:
                    raise RuntimeError("coarse node not in any child")
            self.child_of.append(jnp.asarray(child_of))
            self.I.append(jnp.asarray(I))

        c2f = np.asarray(mf._c2f_cells)                  # (ncoarse, nchild)
        self.c2f = c2f
        bs = Vc.block_size
        self.bs = bs
        self.nd = nd
        cmap = np.asarray(Vc.cell_dof_map)
        fmap = np.asarray(Vf.cell_dof_map)
        # per coarse type: default ordering interleaves (cell=ntypes*q+t);
        # extruded hierarchies order cells column-major and carry an
        # explicit coarse-cell -> type map instead
        type_of = getattr(mf, "_c2f_type_of", None)
        if type_of is None:
            type_of = np.arange(c2f.shape[0]) % ntypes
        self.cmap_t = [jnp.asarray(cmap[type_of == t])
                       for t in range(ntypes)]
        self.fmap_t = [jnp.asarray(fmap[c2f[type_of == t]])
                       for t in range(ntypes)]   # (ncq, nchild, nd*bs)
        # fine dof multiplicity (for the cellwise transpose in restrict)
        mult = np.zeros(Vf.dim)
        np.add.at(mult, fmap.reshape(-1), 1.0)
        self.fine_mult = jnp.asarray(np.where(mult > 0, mult, 1.0))
        self._jit()

    def _jit(self):
        ntypes, bs, nd = self.ntypes, self.bs, self.nd
        P, I, child_of = self.P, self.I, self.child_of
        cmap_t, fmap_t = self.cmap_t, self.fmap_t
        nVf, nVc = self.Vf.dim, self.Vc.dim
        mult = self.fine_mult

        def _blocked(dofs):
            # (..., nd*bs) -> (..., nd, bs)
            return dofs.reshape(dofs.shape[:-1] + (nd, bs))

        @jax.jit
        def prolong(cdat):
            out = jnp.zeros(nVf, dtype=cdat.dtype)
            for t in range(ntypes):
                cd = _blocked(cdat[cmap_t[t]])           # (nc, nd, bs)
                vals = jnp.einsum("kij,njb->nkib", P[t], cd)
                out = out.at[fmap_t[t].reshape(-1)].set(vals.reshape(-1))
            return out

        @jax.jit
        def restrict_(fdual):
            fw = fdual / mult
            out = jnp.zeros(nVc, dtype=fdual.dtype)
            for t in range(ntypes):
                fd = _blocked(fw[fmap_t[t]])             # (nc, k, nd, bs)
                vals = jnp.einsum("kij,nkib->njb", P[t], fd)
                out = out.at[cmap_t[t].reshape(-1)].add(vals.reshape(-1))
            return out

        @jax.jit
        def inject(fdat):
            out = jnp.zeros(nVc, dtype=fdat.dtype)
            for t in range(ntypes):
                fd = _blocked(fdat[fmap_t[t]])           # (nc, k, nd, bs)
                sel = jnp.take(fd, child_of[t], axis=1)  # (nc, ndc, nd, bs)
                vals = jnp.einsum("njib,ji->njb", sel, I[t])
                out = out.at[cmap_t[t].reshape(-1)].set(vals.reshape(-1))
            return out

        self.prolong_fn = prolong
        self.restrict_fn = restrict_
        self.inject_fn = inject


def _grid_transfer_classes(mesh, elem):
    """Residue-class stencil table for grid transfers at any degree.

    A grid-numbered degree-k space on a 2x-refined structured mesh is
    NESTED in the fine space; the fine node at fine-lattice position f
    evaluates the coarse function at coarse-quad position f/(2k), so
    prolongation decomposes into (2k)^D residue classes.  For class
    r = f mod 2k the weights are the coarse basis values at the point
    r/(2k) of the containing cell type; slots off a shared lattice plane
    (r_ax == 0) have zero weight there (Lagrange trace property), which
    keeps every class a pure strided-slice + pad program.

    Returns (k, D, classes) with classes[r] = [(slot_offset, weight)]."""
    from ..assembly.stencil import (type_vertex_offsets, grid_slot_offsets,
                                    _map_ref_points)
    import itertools
    tverts = type_vertex_offsets(mesh)
    offs = grid_slot_offsets(elem, tverts)
    k = elem.degree
    D = len(tverts[0][0])
    nodes = np.asarray(elem.nodes, dtype=np.float64)
    classes = {}
    for r in itertools.product(range(2 * k), repeat=D):
        pt = np.asarray(r, dtype=np.float64) / (2 * k)
        found = None
        for t, verts in enumerate(tverts):
            V = np.asarray(verts, dtype=np.float64)
            if len(V) == D + 1:
                E = (V[1:] - V[:1]).T
                lam = np.linalg.solve(E, pt - V[0])
                if lam.min() < -1e-12 or lam.sum() > 1 + 1e-12:
                    continue
                ref = lam
            else:
                ref = pt                        # unit-cube reference
            found = (t, ref)
            break
        assert found is not None, f"class {r} in no cell type"
        t, ref = found
        tab = elem.tabulate(np.asarray(ref)[None], 0)[0][0]   # (nd,)
        ent = []
        for s_i, w in enumerate(tab):
            if abs(w) < 1e-12:
                continue
            off = offs[t][s_i]
            # trace property: on-plane classes only couple on-plane slots
            assert all(off[ax] == 0 for ax in range(D) if r[ax] == 0), \
                (r, off, w)
            ent.append((off, float(w)))
        classes[r] = ent
    return k, D, classes


class StructuredTransfer:
    """Zero-gather grid transfers for grid-numbered P_k/Q_k spaces on a
    structured hierarchy (any dimension, any degree): prolong/restrict/
    inject are pure strided-slice/pad programs (reference role:
    mg/kernels.py:155 generated transfer kernels; here the structure
    makes them stencils)."""

    def __init__(self, Vc, Vf):
        self.Vc, self.Vf = Vc, Vf
        from ..assembly.stencil import struct_dims
        sc = Vc.mesh_obj._structured
        sf = Vf.mesh_obj._structured
        self.dims = struct_dims(sc)             # coarse cell counts
        assert struct_dims(sf) == tuple(2 * n for n in self.dims)
        self.bs = Vc.block_size
        self.k, self.D, self.classes = _grid_transfer_classes(
            Vc.mesh_obj, Vc.scalar_element)
        self._jit()

    def _jit(self):
        k, D, bs = self.k, self.D, self.bs
        dims = self.dims
        gc = tuple(k * n + 1 for n in dims)              # coarse grid
        gf = tuple(2 * k * n + 1 for n in dims)          # fine grid
        cshape = tuple(reversed(gc))
        fshape = tuple(reversed(gf))
        classes = self.classes
        rev = tuple(reversed(range(D)))

        def _planes(dat, shape):
            if bs == 1:
                return [dat.reshape(shape)]
            return [dat[d::bs].reshape(shape) for d in range(bs)]

        def _join(planes):
            if bs == 1:
                return planes[0].reshape(-1)
            return jnp.stack([p.reshape(-1) for p in planes],
                             axis=-1).reshape(-1)

        def _slot_slice(C, off, r):
            """Coarse values of one slot pattern for class r: stride-k
            slices; on-plane axes (r_ax==0) take the full lattice."""
            starts, limits, strides = [], [], []
            for ax in rev:
                if r[ax] == 0:
                    starts.append(0)
                    limits.append(k * dims[ax] + 1)
                else:
                    starts.append(off[ax])
                    limits.append(off[ax] + k * (dims[ax] - 1) + 1)
                strides.append(k)
            return jax.lax.slice(C, tuple(starts), tuple(limits),
                                 tuple(strides))

        def _pro_plane(C):
            out = None
            zero = jnp.zeros((), C.dtype)
            for r, ents in classes.items():
                acc = None
                for off, w in ents:
                    v = w * _slot_slice(C, off, r)
                    acc = v if acc is None else acc + v
                cfg = []
                for ax in rev:
                    if r[ax] == 0:
                        cfg.append((0, 0, 2 * k - 1))
                    else:
                        cfg.append((r[ax],
                                    gf[ax] - (r[ax]
                                              + 2 * k * (dims[ax] - 1) + 1),
                                    2 * k - 1))
                v = jax.lax.pad(acc, zero, tuple(cfg))
                out = v if out is None else out + v
            return out

        def _res_plane(F):
            out = None
            zero = jnp.zeros((), F.dtype)
            for r, ents in classes.items():
                # strided class extraction from the fine grid
                sl = tuple(slice(r[ax], None, 2 * k) for ax in rev)
                Fr = F[sl]
                for off, w in ents:
                    cfg = []
                    for ax in rev:
                        if r[ax] == 0:
                            cfg.append((0, 0, k - 1))
                        else:
                            cfg.append((off[ax],
                                        gc[ax] - (off[ax]
                                                  + k * (dims[ax] - 1) + 1),
                                        k - 1))
                    v = jax.lax.pad(w * Fr, zero, tuple(cfg))
                    out = v if out is None else out + v
            return out

        @jax.jit
        def prolong(cdat):
            ps = _planes(cdat, cshape)
            return _join([_pro_plane(C) for C in ps])

        @jax.jit
        def restrict_(fdual):
            ps = _planes(fdual, fshape)
            return _join([_res_plane(F) for F in ps])

        inj = tuple(slice(None, None, 2) for _ in range(D))

        @jax.jit
        def inject(fdat):
            ps = _planes(fdat, fshape)
            return _join([F[inj] for F in ps])

        self.prolong_fn = prolong
        self.restrict_fn = restrict_
        self.inject_fn = inject


def _structured_ok(Vc, Vf):
    from ..assembly.stencil import struct_dims
    mc, mf = Vc.mesh_obj, Vf.mesh_obj
    sc = getattr(mc, "_structured", None)
    sf = getattr(mf, "_structured", None)
    if sc is None or sf is None or getattr(mf, "_coarse_mesh", None) \
            is not mc:
        return False
    if struct_dims(sf) != tuple(2 * n for n in struct_dims(sc)):
        return False
    ec = Vc.scalar_element
    if getattr(ec, "family", None) != "Lagrange":
        return False
    return (getattr(Vc.sdata, "grid_numbered", False)
            and getattr(Vf.sdata, "grid_numbered", False)
            and ec == Vf.scalar_element)


_transfer_cache = {}


class NonNestedTransfer:
    """Transfers between levels of a NonNestedHierarchy: prolongation is
    cross-mesh node interpolation (fine nodes evaluate the coarse
    function wherever they land), restriction its transpose, injection
    the reverse interpolation.  Reference: firedrake/mg/mesh.py:442
    (non-nested hierarchies; the reference uses supermesh projection,
    here nodal interpolation — exact on shared polynomial content)."""

    def __init__(self, Vc, Vf):
        from ..interpolation import cross_mesh_scalar_matrix
        if getattr(Vc.scalar_element, "mapping", "identity") != "identity":
            raise NotImplementedError("non-nested transfer: nodal spaces")
        self.bs = Vc.block_size
        self._P = cross_mesh_scalar_matrix(Vc, Vf)   # fine <- coarse
        self._I = cross_mesh_scalar_matrix(Vf, Vc)   # coarse <- fine
        bs = self.bs
        if bs == 1:
            self.prolong_fn = self._P.matvec
            self.restrict_fn = self._P.transpose_matvec
            self.inject_fn = self._I.matvec
        else:
            def _blocked(op):
                def run(x):
                    xm = x.reshape(-1, bs)
                    return jnp.stack([op(xm[:, k]) for k in range(bs)],
                                     axis=1).reshape(-1)
                return run
            self.prolong_fn = _blocked(self._P.matvec)
            self.restrict_fn = _blocked(self._P.transpose_matvec)
            self.inject_fn = _blocked(self._I.matvec)


def get_transfer(Vc, Vf) -> LevelTransfer:
    key = (id(Vc.mesh_obj), id(Vf.mesh_obj), hash(Vc.element))
    if key not in _transfer_cache:
        if getattr(Vf.mesh_obj, "_nonnested_coarse", None) \
                is Vc.mesh_obj:
            _transfer_cache[key] = NonNestedTransfer(Vc, Vf)
        elif _structured_ok(Vc, Vf):
            _transfer_cache[key] = StructuredTransfer(Vc, Vf)
        elif (getattr(Vf.mesh_obj, "_c2f_cells", None) is None
                and getattr(Vf.mesh_obj, "parent_cells", None)
                is not None):
            # NVB-bisected level (AdaptiveMeshHierarchy): variable
            # children per parent -> sparse interpolation transfer
            from .adaptive import AdaptiveTransfer
            _transfer_cache[key] = AdaptiveTransfer(Vc, Vf)
        else:
            _transfer_cache[key] = LevelTransfer(Vc, Vf)
    return _transfer_cache[key]


def _level_spaces(V):
    """[spaces on every hierarchy level] for V's mesh hierarchy."""
    mesh = V.mesh_obj
    h = getattr(mesh, "_mg_hierarchy", None)
    if h is None:
        raise ValueError("mesh is not part of a MeshHierarchy")
    return [FunctionSpace(m, V.element) for m in h]


# ------------------------------------------------ public firedrake surface
def prolong(coarse, fine):
    """prolong(coarse_function, fine_function) (reference:
    mg/interface.py:37)."""
    Vc, Vf = coarse.function_space(), fine.function_space()
    t = get_transfer(Vc, Vf)
    fine.dat = t.prolong_fn(jnp.asarray(coarse.dat))
    return fine


def restrict(fine_dual, coarse_dual):
    Vf, Vc = fine_dual.function_space(), coarse_dual.function_space()
    t = get_transfer(Vc, Vf)
    coarse_dual.dat = t.restrict_fn(jnp.asarray(fine_dual.dat))
    return coarse_dual


def inject(fine, coarse):
    Vf, Vc = fine.function_space(), coarse.function_space()
    t = get_transfer(Vc, Vf)
    coarse.dat = t.inject_fn(jnp.asarray(fine.dat))
    return coarse


class TransferManager:
    """Reference: firedrake/mg/embedded.py TransferManager — transfers
    for spaces whose elements aren't nodal-Lagrange by EMBEDDING into an
    equivalent (vector) DG space: interpolate -> transfer -> project
    back.  Nodal spaces (CG/DG, vector/tensor) go straight through the
    tabulated kernels."""

    def _is_nodal(self, V):
        fam = V.scalar_element.family
        return fam in ("Lagrange", "Discontinuous Lagrange")

    def _embedding_space(self, V):
        from ..functionspace import VectorFunctionSpace
        deg = V.scalar_element.degree
        d = V.mesh_obj.geometric_dimension
        return VectorFunctionSpace(V.mesh_obj, "DG", deg, dim=d)

    def _via_embedding(self, op, src, dst):
        from ..function import Function
        from ..interpolation import interpolate_onto
        from ..projection import project
        Es = self._embedding_space(src.function_space())
        Ed = self._embedding_space(dst.function_space())
        gs = Function(Es)
        interpolate_onto(src, gs)
        gd = Function(Ed)
        op(gs, gd)
        project(gd, dst)
        return dst

    def prolong(self, coarse, fine):
        if self._is_nodal(coarse.function_space()):
            return prolong(coarse, fine)
        return self._via_embedding(prolong, coarse, fine)

    def inject(self, fine, coarse):
        if self._is_nodal(fine.function_space()):
            return inject(fine, coarse)
        return self._via_embedding(inject, fine, coarse)

    def restrict(self, fine_dual, coarse_dual):
        if self._is_nodal(fine_dual.function_space()):
            return restrict(fine_dual, coarse_dual)
        raise NotImplementedError("embedded restriction of duals: use "
                                  "nodal residual spaces")
