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


class LevelTransfer:
    """Transfer ops between Vc (coarse) and Vf (fine = refined mesh)."""

    def __init__(self, Vc: FunctionSpace, Vf: FunctionSpace):
        self.Vc, self.Vf = Vc, Vf
        mc, mf = Vc.mesh_obj, Vf.mesh_obj
        assert getattr(mf, "_coarse_mesh", None) is mc, \
            "fine mesh is not a refinement of the coarse mesh"
        elem = Vc.scalar_element
        assert elem == Vf.scalar_element
        cmaps = child_reference_maps(mc.cell.name)
        nchild = len(cmaps)
        nodes = elem.nodes                               # (nd, tdim)
        nd = elem.ndof
        # prolongation tables: P[k, i_fine, j_coarse]
        P = np.stack([elem.tabulate(nodes @ A.T + b, 0)[0]
                      for (A, b) in cmaps])              # (nchild, nd, nd)
        self.P = jnp.asarray(P)
        # injection tables: for each coarse node, owning child + basis vals
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
                raise RuntimeError("coarse node not found in any child")
        self.child_of = jnp.asarray(child_of)
        self.I = jnp.asarray(I)

        c2f = mf._c2f_cells                              # (ncoarse, nchild)
        self.c2f = c2f
        # dof maps (scalar node maps expanded by block size)
        bs = Vc.block_size
        self.bs = bs
        self.cmap = jnp.asarray(Vc.cell_dof_map)         # (ncoarse, nd*bs)
        fmap = Vf.cell_dof_map                           # (nfine, nd*bs)
        self.fmap = jnp.asarray(fmap[np.asarray(c2f)])   # (nco, nchild, nd*bs)
        # fine dof multiplicity (for the cellwise transpose in restrict)
        mult = np.zeros(Vf.dim)
        np.add.at(mult, fmap.reshape(-1), 1.0)
        self.fine_mult = jnp.asarray(np.where(mult > 0, mult, 1.0))
        self._jit()

    def _jit(self):
        P, I = self.P, self.I
        bs = self.bs
        cmap, fmap = self.cmap, self.fmap
        child_of = self.child_of
        nVf = self.Vf.dim
        nVc = self.Vc.dim
        mult = self.fine_mult
        nd = P.shape[1]

        def _blocked(dofs):
            # (..., nd*bs) -> (..., nd, bs)
            return dofs.reshape(dofs.shape[:-1] + (nd, bs))

        @jax.jit
        def prolong(cdat):
            cd = _blocked(cdat[cmap])                    # (nc, nd, bs)
            vals = jnp.einsum("kij,njb->nkib", P, cd)    # (nc, nchild, ndf, bs)
            out = jnp.zeros(nVf, dtype=cdat.dtype)
            out = out.at[fmap.reshape(-1)].set(vals.reshape(-1))
            return out

        @jax.jit
        def restrict_(fdual):
            fw = fdual / mult
            fd = _blocked(fw[fmap])                      # (nc, nchild, nd, bs)
            vals = jnp.einsum("kij,nkib->njb", P, fd)    # (nc, nd, bs)
            out = jnp.zeros(nVc, dtype=fdual.dtype)
            out = out.at[cmap.reshape(-1)].add(vals.reshape(-1))
            return out

        @jax.jit
        def inject(fdat):
            fd = _blocked(fdat[fmap])                    # (nc, nchild, nd, bs)
            sel = jnp.take(fd, child_of, axis=1)         # (nc, ndc, nd, bs)
            vals = jnp.einsum("njib,ji->njb", sel, I)    # (nc, ndc, bs)
            out = jnp.zeros(nVc, dtype=fdat.dtype)
            out = out.at[cmap.reshape(-1)].set(vals.reshape(-1))
            return out

        self.prolong_fn = prolong
        self.restrict_fn = restrict_
        self.inject_fn = inject


_transfer_cache = {}


def get_transfer(Vc, Vf) -> LevelTransfer:
    key = (id(Vc.mesh_obj), id(Vf.mesh_obj), hash(Vc.element))
    if key not in _transfer_cache:
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
