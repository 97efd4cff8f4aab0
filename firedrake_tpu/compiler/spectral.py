"""Sum-factorized (spectral) assembly for tensor-product cells.

The TSFC spectral/tensor-mode role (reference: tsfc/spectral.py:197
Integrals/flatten; tsfc/tensor.py:93 precomputed reference tensors):
on quadrilaterals and hexahedra the Q_k basis factors into 1D Lagrange
bases, so the local-tensor contraction

    A_ij = sum_q w(q) * v_ij(q)

need never materialize the (ni, nj, nq) array.  TPU-first shape of the
algorithm:

1. PROBE EXTRACTION.  Any bilinear integrand lowers to
       v_ij(q) = sum_{a,b} M_ab(q) * T^test_a(q, i) * T^trial_b(q, j)
   where a, b range over the reference value/derivative channels
   (scalar space: value, d/dxi_1 .. d/dxi_d) — the lowering is LINEAR in
   each argument's reference tables.  Evaluating the existing Lowerer
   with one-hot 1-slot probe tables recovers M_ab(q) exactly, reusing
   the whole geometry/coefficient machinery (so variable coefficients
   and non-affine cell geometry are fully supported).  (d+1)^2 probe
   evaluations of a 1x1-slot integrand per cell — negligible next to
   the contraction it replaces.
2. FACTORED CONTRACTION.  With per-dimension extended tables
   E_m[q_m, i_m, a] (= 1D derivative table when a == m+1, 1D value
   table otherwise), the basis channel factorizes as
       T_a(q, i) = prod_m E_m[q_m, i_m, a],
   and the whole batched local-tensor build is ONE einsum
       loc[c, i1..id, j1..jd] =
           M[c, a, b, q1..qd] * prod_m E_m[q_m, i_m, a]
                              * prod_m E_m[q_m, j_m, b]
   whose optimized contraction path is the classical sum-factorization
   chain: O((k+1)^{2d+1}) instead of O((k+1)^{3d}) per cell, as chains
   of batched GEMMs — exactly the MXU's shape.

The plan slots into FormAssembler's generic executor: it produces the
same (ncell, ni, nj) local tensors the vmapped direct kernel would,
in element slot order, and the standard accumulation takes over.
"""
from __future__ import annotations

import os
import numpy as np
import jax
import jax.numpy as jnp

from .lowering import CellContext, Lowerer

_TP_CELLS = ("quadrilateral", "hexahedron")


def _is_tp_scalar_lagrange(space):
    from ..elements.lagrange import Lagrange
    return (space is not None
            and space.block_size == 1
            and type(space.element).__name__ in ("Lagrange",
                                                 "DiscontinuousLagrange")
            and isinstance(space.element, Lagrange)
            and space.element.cell.name in _TP_CELLS)


def _lagrange_1d(k, pts, variant=None):
    """Nodal 1D Lagrange basis on the degree-k lattice (equispaced, or
    GLL for variant='spectral'; k=0: the single constant): values and
    derivatives at pts."""
    if k == 0:
        return (np.ones((len(pts), 1)), np.zeros((len(pts), 1)))
    from ..elements.lagrange import _lattice_1d
    nodes = _lattice_1d(k, variant)
    V = np.vander(nodes, k + 1, increasing=True)       # (k+1, k+1)
    C = np.linalg.inv(V)                               # mono -> nodal
    P = np.vander(np.asarray(pts), k + 1, increasing=True)
    dP = np.zeros_like(P)
    dP[:, 1:] = P[:, :-1] * np.arange(1, k + 1)
    return P @ C, dP @ C


def _slot_lattice(elem):
    """(nslot, d) lattice multi-index of each element dof slot (matched
    against the element's own 1D lattice, so GLL variants factor too)."""
    from ..elements.lagrange import _lattice_1d
    nodes = np.asarray(elem.nodes)                 # (nslot, d)
    if elem.degree == 0:
        # DG0: the single node is the centroid, not a lattice point —
        # it factors trivially as the constant slot in every axis
        return np.zeros((len(nodes), nodes.shape[1]), dtype=np.int64), 1
    g1 = _lattice_1d(elem.degree, getattr(elem, "variant", None))
    d2 = np.abs(nodes[:, :, None] - g1[None, None, :])
    mi = d2.argmin(axis=2).astype(np.int64)        # (nslot, d)
    assert np.take_along_axis(d2, mi[:, :, None], 2).max() < 1e-9, \
        "not a TP lattice"
    n1 = elem.degree + 1
    return mi, n1


class _ProbeLowerer(Lowerer):
    """Lowerer whose argument tables are one-hot reference probes:
    evaluating the integrand with probes (a, b) yields M_ab(q)."""

    def __init__(self, ctx, test, trial, coeffs, consts, pa, pb, tdim):
        super().__init__(ctx, test, trial, coeffs, consts)
        self._pa, self._pb = pa, pb
        self._ptdim = tdim

    def arg_table(self, arg, order, side):
        a = self._pa if arg.number == 0 else self._pb
        nq = self.ctx.num_q()
        if order == 0:
            return jnp.full((nq, 1), 1.0 if a == 0 else 0.0)
        if order == 1:
            t = jnp.zeros((nq, 1, self._ptdim))
            if a >= 1:
                t = t.at[:, :, a - 1].set(1.0)
            return t
        raise NotImplementedError("spectral probes: 2nd derivatives")


class SpectralPlan:
    """Per-integral sum-factorized cell executor."""

    def __init__(self, ci, test_space, trial_space):
        mesh = ci.mesh
        cellname = mesh.cell.name
        d = mesh.cell.dim
        self.ci = ci
        self.rank = (test_space is not None) + (trial_space is not None)
        # 1D factor of the shared cell rule (make_quadrature meshgrid
        # 'ij' order: flat q = q_1 * nq1^{d-1} + ... lexicographic)
        from ..elements.quadrature import make_quadrature
        q = make_quadrature(cellname, ci.degree)
        n1q = round(len(q.points) ** (1.0 / d))
        assert n1q ** d == len(q.points), "cell rule is not TP"
        pts1 = np.asarray(q.points[:n1q, -1])   # last axis varies fastest
        self.nq1, self.d = n1q, d
        self.tdim = d

        def etables(space):
            """Per-dim extended tables E_m (nq1, n1, d+1) plus the
            lattice position of each element slot (slot i of the local
            tensor gathers lattice flat index lat[i])."""
            elem = space.element
            V, D = _lagrange_1d(elem.degree, pts1,
                                getattr(elem, "variant", None))
            out = []
            for m in range(d):
                Em = np.repeat(V[:, :, None], d + 1, axis=2)
                Em[:, :, m + 1] = D
                out.append(jnp.asarray(Em))
            mi, n1 = _slot_lattice(elem)
            lat = np.ravel_multi_index(tuple(mi.T), (n1,) * d)
            return out, jnp.asarray(lat)

        self.Et = self.Eu = None
        self.rows_perm = self.cols_perm = None
        if test_space is not None:
            self.Et, self.rows_perm = etables(test_space)
        if trial_space is not None:
            self.Eu, self.cols_perm = etables(trial_space)
        self.nalpha = d + 1

        # validate trace once with abstract shapes (falls back on
        # NotImplementedError, e.g. 2nd-derivative integrands)
        C = 2
        g = mesh.geometric_dimension
        nvc = mesh.coordinates.function_space().cell_dof_map.shape[1] // g
        cfshapes = tuple(jax.ShapeDtypeStruct(
            (C, c.space.cell_dof_map.shape[1]), jnp.float64)
            for c in ci.coefficients)
        cvals = tuple(jax.ShapeDtypeStruct(
            np.asarray(c.values()).shape, jnp.float64)
            for c in ci.constants)
        jax.eval_shape(
            self.local_tensors,
            jax.ShapeDtypeStruct((C, nvc, g), jnp.float64),
            cfshapes, cvals)

    # ------------------------------------------------------------- probes
    def _probe_M(self, coords_e, ws, consts):
        """(nalpha[, nbeta], nq) kernel matrix incl. detJ*w scale for ONE
        cell's gathered inputs."""
        ci = self.ci
        ctx = CellContext(ci.mesh, ci.degree, coords_e)
        scale = ctx.scale()                               # (nq,)
        na = self.nalpha
        rows = []
        for a in range(na):
            if self.rank == 2:
                row = []
                for b in range(na):
                    low = _ProbeLowerer(
                        ctx, ci.test, ci.trial,
                        {c.count: w for c, w in zip(ci.coefficients, ws)},
                        {c.count: v for c, v in zip(ci.constants,
                                                    consts)},
                        a, b, self.tdim)
                    v = low.run(ci.integrand)             # (1, 1, nq)
                    row.append(v[0, 0] * scale)
                rows.append(jnp.stack(row))
            else:
                low = _ProbeLowerer(
                    ctx, ci.test, ci.trial,
                    {c.count: w for c, w in zip(ci.coefficients, ws)},
                    {c.count: v for c, v in zip(ci.constants, consts)},
                    a, 0, self.tdim)
                v = low.run(ci.integrand)
                rows.append(v[0, 0] * scale)
        return jnp.stack(rows)

    # -------------------------------------------------------- contraction
    def local_tensors(self, ce, coeffs, consts):
        """(ncell, ni[, nj]) local tensors in element slot order.
        ce: (ncell, nvc, g); coeffs: tuple of (ncell, nslot)."""
        M = jax.vmap(lambda c, *w: self._probe_M(c, w, consts))(
            ce, *coeffs)
        nq1, d = self.nq1, self.d
        C = M.shape[0]
        if self.rank == 2:
            M = M.reshape((C, self.nalpha, self.nalpha) + (nq1,) * d)
            if d == 2:
                loc = jnp.einsum("cabxy,xia,yka,xjb,ylb->cikjl",
                                 M, self.Et[0], self.Et[1],
                                 self.Eu[0], self.Eu[1],
                                 optimize=True)
                n_i = self.Et[0].shape[1] * self.Et[1].shape[1]
                n_j = self.Eu[0].shape[1] * self.Eu[1].shape[1]
            else:
                loc = jnp.einsum(
                    "cabxyz,xia,yka,zma,xjb,ylb,znb->cikmjln",
                    M, self.Et[0], self.Et[1], self.Et[2],
                    self.Eu[0], self.Eu[1], self.Eu[2],
                    optimize=True)
                n_i = (self.Et[0].shape[1] * self.Et[1].shape[1]
                       * self.Et[2].shape[1])
                n_j = (self.Eu[0].shape[1] * self.Eu[1].shape[1]
                       * self.Eu[2].shape[1])
            loc = loc.reshape(C, n_i, n_j)
            loc = jnp.take(loc, self.rows_perm, axis=1)
            loc = jnp.take(loc, self.cols_perm, axis=2)
            return loc
        M = M.reshape((C, self.nalpha) + (nq1,) * d)
        if d == 2:
            loc = jnp.einsum("caxy,xia,yka->cik", M,
                             self.Et[0], self.Et[1], optimize=True)
        else:
            loc = jnp.einsum("caxyz,xia,yka,zma->cikm", M,
                             self.Et[0], self.Et[1], self.Et[2],
                             optimize=True)
        loc = loc.reshape(C, -1)
        loc = jnp.take(loc, self.rows_perm, axis=1)
        return loc[:, :, None]      # executor expects (C, ni, 1)


def build_spectral_plan(ci, test, trial):
    """SpectralPlan for a cell integral on quad/hex with scalar
    tensor-product Lagrange argument spaces, else None.

    Selection: degree >= 2 arguments (probe overhead dominates at Q1)
    unless FDTPU_SPECTRAL=1 forces it on; FDTPU_SPECTRAL=0 disables."""
    flag = os.environ.get("FDTPU_SPECTRAL")
    if flag == "0":
        return None
    if ci.integral_type != "cell":
        return None
    if getattr(ci, "qrule", None) is not None:
        return None     # user rule: the sum-factored Gauss grid differs
    if ci.mesh.cell.name not in _TP_CELLS:
        return None
    spaces = [a.space for a in (test, trial) if a is not None]
    if not spaces or not all(_is_tp_scalar_lagrange(s) for s in spaces):
        return None
    if flag != "1" and max(s.element.degree for s in spaces) < 2:
        return None
    test_space = test.space if test is not None else None
    trial_space = trial.space if trial is not None else None
    if test_space is None:
        return None                     # rank-0 forms: generic path
    try:
        return SpectralPlan(ci, test_space, trial_space)
    except (NotImplementedError, AssertionError):
        # AssertionError: a coefficient/argument element whose nodes do
        # not factor as a TP lattice — fall back to the generic path
        return None
