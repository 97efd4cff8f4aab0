"""Slate: element-local dense linear algebra on assembled tensors.

Reference: firedrake/slate/slate.py (Tensor :862, AssembledVector, Inverse
:1075, Transpose :1117, Solve :1311, Block :600) compiled by slac through
GEM/loopy with LAPACK callables (pyop2/codegen/c/inverse.c).

TPU-native design: a Slate expression evaluates to a BATCH of per-cell
dense tensors (ncell, ni[, nj]) — exactly the shape the MXU wants.  Local
kernels are the same vmapped quadrature kernels the assembler uses;
inverse/solve are batched jnp.linalg calls; the final global assembly
scatters through the outer arguments' dof maps.  Everything is one jitted
program (the reference needs generated C + LAPACK for this).

Facet integrals (hybridization's trace coupling) are localized ONE-SIDED:
a dS integrand written in the restriction-symmetric hybridizable style
(jump/avg of broken fluxes against single-valued trace functions) splits
into per-cell contributions where '+' means "this cell".  Each interior
facet is then visited from both adjacent cells and the transformed
integrand is evaluated with the cell's own outward normal (the reference
does this with cell-facet loops inside generated kernels,
slate/slac/kernel_builder.py).

Genuinely two-sided DG couplings (jump*jump cross terms) go through the
assembler's TWO-SIDED facet-pair kernel instead: each interior facet
evaluates the integrand once with BOTH cells' dofs, producing a
(2ni, 2nj) block tensor whose diagonal blocks accumulate into the
per-cell dense tensors and whose cross blocks ride along as explicit
facet-pair couplings (``_Local.cross``).  Cross couplings compose
through every LINEAR Slate operation (Add, Negative, Transpose, Block,
global assembly); cell-local algebra (Inverse, Solve, Mul contraction)
on a cross-coupled tensor is mathematically not per-cell localizable
and raises with a rewrite hint.  NOTE this is STRICTER-than-reference
semantics: the reference *zeroes* negative restrictions at Tensor
construction (slate/slate.py:903 RemoveNegativeRestrictions), silently
dropping cross-cell blocks of two-sided forms; here the assembled
global tensor matches direct assembly exactly.

Mixed forms build BLOCKED local tensors: per-cell dof axes concatenate the
fields ([flux | scalar | trace]); ``A.blocks[i, j]`` slices fields (the
reference's Block :600), enabling static condensation:

    S = A.blocks[2, 2] - A.blocks[2, :2] * A.blocks[:2, :2].inv \
        * A.blocks[:2, 2]
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .language.measure import Form, Integral
from .language.core import (Argument, Coefficient, Restricted, Zero,
                            FacetNormal, Grad, Product, Division,
                            ScalarValue, Terminal)
from .language.tensor_algebra import Inner, Dot, Outer, Cross
from .language.calculus import reconstruct
from .function import Function, Cofunction


class TensorBase:
    """Base of the Slate expression DAG."""

    def __mul__(self, other):
        return Mul(self, other)

    def __add__(self, other):
        return Add(self, other)

    def __sub__(self, other):
        return Add(self, Negative(other))

    def __neg__(self):
        return Negative(self)

    @property
    def T(self):
        return Transpose(self)

    @property
    def inv(self):
        return Inverse(self)

    def solve(self, b, decomposition=None):
        return Solve(self, b, decomposition=decomposition)

    @property
    def blocks(self):
        return _BlockIndexer(self)

    # rank: number of argument axes (2 matrix, 1 vector)
    rank = None


class Tensor(TensorBase):
    """Element-local tensor of a bilinear/linear form (possibly mixed).

    ``axes`` optionally pins each argument axis to a (possibly mixed)
    function space: a form referencing only SOME fields of a mixed space
    still produces the full blocked local tensor, with zero blocks for the
    absent couplings (needed by hybridization's trace operator K, whose
    trial argument touches only the flux field)."""

    def __init__(self, form: Form, axes=None):
        self.form = form
        self.arguments = form.arguments()
        numbers = sorted({a.number for a in self.arguments})
        self.rank = len(numbers)
        # per-axis field structure: list of part-arguments, sorted by part
        self.axis_parts = []
        for i, n in enumerate(numbers):
            space = axes[i] if axes is not None else None
            if space is None:
                # a form over a mixed space may touch only SOME fields;
                # the local tensor must still carry the FULL block axis
                # (zero blocks for absent couplings) — recover the parent
                # mixed space from any part-argument
                for a in self.arguments:
                    if a.number == n and a.part is not None:
                        space = a.space.parent
                        break
            if space is not None:
                from .mixed import MixedFunctionSpace
                if isinstance(space, MixedFunctionSpace):
                    parts = [Argument(space.sub(k), n, part=k)
                             for k in range(space.num_sub_spaces)]
                else:
                    parts = [Argument(space, n)]
            else:
                parts = sorted(
                    (a for a in self.arguments if a.number == n),
                    key=lambda a: -1 if a.part is None else a.part)
            self.axis_parts.append(parts)

    def __repr__(self):
        return f"Tensor(rank={self.rank})"


class AssembledVector(TensorBase):
    """Per-cell view of a global Function/Cofunction (rank 1)."""

    rank = 1

    def __init__(self, f):
        self.f = f
        self.space = f.function_space()


class Transpose(TensorBase):
    def __init__(self, a):
        self.a = a
        self.rank = a.rank


class Negative(TensorBase):
    def __init__(self, a):
        self.a = a
        self.rank = a.rank


class Inverse(TensorBase):
    rank = 2

    def __init__(self, a):
        assert a.rank == 2
        self.a = a


class Add(TensorBase):
    def __init__(self, a, b):
        assert a.rank == b.rank
        self.a, self.b = a, b
        self.rank = a.rank


class Mul(TensorBase):
    def __init__(self, a, b):
        self.a, self.b = a, b
        self.rank = a.rank + b.rank - 2


class Solve(TensorBase):
    def __init__(self, A, b, decomposition=None):
        if decomposition is not None and not isinstance(A, Factorization):
            A = Factorization(A, decomposition)
        assert A.rank == 2
        self.A, self.b = A, b
        self.rank = b.rank


class Factorization(TensorBase):
    """Cached decomposition of a rank-2 tensor (reference slate.py:766).

    The reference names an Eigen decomposition class; on TPU every
    decomposition evaluates through the same batched LU-based
    `batched_solve` (XLA lowers linalg.solve to LU on all backends),
    so this node is a semantic marker: Solve(Factorization(A), b) ==
    Solve(A, b), and user code written `A.solve(b, decomposition=...)`
    ports unchanged."""

    _DECOMPS = frozenset([
        "PartialPivLU", "FullPivLU", "HouseholderQR",
        "ColPivHouseholderQR", "FullPivHouseholderQR", "LLT", "LDLT",
        "CompleteOrthogonalDecomposition", "BDCSVD", "JacobiSVD"])

    rank = 2

    def __init__(self, a, decomposition=None):
        decomposition = decomposition or "PartialPivLU"
        if decomposition not in self._DECOMPS:
            raise ValueError(
                f"Decomposition {decomposition!r} not supported")
        assert a.rank == 2, "can only decompose matrices"
        self.a = a
        self.decomposition = decomposition


class DiagonalTensor(TensorBase):
    """Diagonal of a square rank-2 tensor, as a rank-2 tensor
    (reference slate.py:1377)."""

    rank = 2

    def __init__(self, a):
        assert a.rank == 2, "the tensor must be rank 2"
        self.a = a


class Reciprocal(TensorBase):
    """Elementwise reciprocal of a rank-1 tensor (reference
    slate.py:1044) — with DiagonalTensor the building block of cheap
    diagonal-approximate inverses in hybridized solvers."""

    rank = 1

    def __init__(self, a):
        assert a.rank == 1, "the tensor must be rank 1"
        self.a = a


class _BlockIndexer:
    def __init__(self, tensor):
        self.tensor = tensor

    def __getitem__(self, idx):
        return Block(self.tensor, idx)

    def __call__(self, *args, **kwargs):   # legacy .blocks() call form
        return self


class Block(TensorBase):
    """Field sub-block of a mixed tensor (reference slate.py:600 Block).

    Indices are FIELD indices (ints or slices), one per axis."""

    def __init__(self, a, indices):
        self.a = a
        self.indices = indices if isinstance(indices, tuple) else (indices,)
        assert len(self.indices) == a.rank
        self.rank = a.rank


# ------------------------------------------------- one-sided localization
def _is_single_valued(t):
    """Is this terminal single-valued on a facet (same seen from both
    cells)?  Trace elements by construction; continuous Lagrange values."""
    space = getattr(t, "space", None)
    elem = getattr(space, "element", None)
    if elem is None:
        return False
    from .elements.trace import HDivTrace
    if isinstance(elem, HDivTrace):
        return True
    scalar = getattr(elem, "sub", elem)        # Vector/Tensor wrapper
    fam = getattr(scalar, "family", "")
    return fam in ("Lagrange", "Q") and getattr(scalar, "degree", 0) >= 1


def _restriction_sides(e):
    """Bottom-up set of restriction sides attached to cell-based (NOT
    single-valued) quantities; returns None as a poison value when a
    multiplicative node couples different sides (genuinely two-sided —
    routed to the facet-pair kernel instead of one-sided
    localization)."""
    if isinstance(e, Restricted):
        base = e.operands[0]
        cellbased = any(isinstance(t, (Argument, Coefficient))
                        and not _is_single_valued(t)
                        for t in base.traverse())
        return frozenset([e.side]) if cellbased else frozenset()
    subs = [_restriction_sides(o) for o in e.operands]
    if any(s is None for s in subs):
        return None
    if isinstance(e, (Product, Dot, Inner, Outer, Cross, Division)):
        nonempty = [s for s in subs if s]
        for i in range(len(nonempty)):
            for j in range(i + 1, len(nonempty)):
                if nonempty[i] != nonempty[j] or len(nonempty[i]) > 1:
                    return None
    out = frozenset()
    for s in subs:
        out |= s
    return out


def _is_two_sided(integrand):
    """True when the dS integrand couples '+' and '-' of cell-based
    quantities multiplicatively (cross-cell blocks exist)."""
    return _restriction_sides(integrand) is None


def _apply_side(e, side, under_grad=False):
    """Evaluate a restricted subtree one-sided: '+' == this cell."""
    if isinstance(e, FacetNormal):
        return e if side == "+" else Product(ScalarValue(-1.0), e)
    if isinstance(e, (Argument, Coefficient)):
        if side == "+" or (_is_single_valued(e) and not under_grad):
            return e
        return Zero(e.shape)
    if isinstance(e, Terminal):
        return e
    ug = under_grad or isinstance(e, Grad)
    ops = [_apply_side(o, side, ug) for o in e.operands]
    if all(a is b for a, b in zip(ops, e.operands)):
        return e
    return reconstruct(e, ops)


def _one_sided(e):
    """Strip restrictions for per-cell facet localization."""
    if isinstance(e, Restricted):
        return _apply_side(_one_sided_body(e.operands[0]), e.side)
    return _one_sided_body(e)


def _one_sided_body(e):
    if isinstance(e, Terminal):
        return e
    ops = [_one_sided(o) for o in e.operands]
    if all(a is b for a, b in zip(ops, e.operands)):
        return e
    return reconstruct(e, ops)


# ------------------------------------------------------- local evaluation
class _Local:
    """Per-cell dense local tensors plus optional cross-cell facet-pair
    couplings from genuinely two-sided dS integrals.

    cell:  (ncell, ni[, nj]) dense per-cell values.
    cross: tuple of (row_cells (nf,), col_cells (nf,), vals (nf, ni, nj))
           — the (+,-) / (-,+) blocks of interior-facet pair tensors,
           in the SAME (possibly blocked) local dof layout as `cell`.
    """

    __slots__ = ("cell", "cross")

    def __init__(self, cell, cross=()):
        self.cell = cell
        self.cross = tuple(cross)


def _no_cross(v, what):
    if v.cross:
        raise NotImplementedError(
            f"Slate {what} of a tensor with cross-cell (two-sided dS) "
            "couplings — cell-local algebra is not defined across cells. "
            "Condense on the cell-local part and keep jump-jump terms in "
            "a separate Tensor added AFTER the local algebra, or assemble "
            "the coupled operator globally with assemble(form).")
    return v.cell


def _gather_coeffs(ci, cells):
    """Per-entity coefficient arrays for the given owning cells (dof
    signs / matrix entity transforms applied: local = B @ canonical)."""
    ws = []
    for c in ci.coefficients:
        w = jnp.asarray(c.dat)[jnp.asarray(c.space.cell_dof_map[cells])]
        if getattr(c.space, "has_dof_signs", False):
            w = w * jnp.asarray(c.space.cell_dof_signs[cells])
        elif getattr(c.space, "has_dof_transforms", False):
            T = jnp.asarray(c.space.cell_dof_transforms[cells])
            w = jnp.einsum("cij,cj->ci", T, w)
        ws.append(w)
    return tuple(ws)


def _apply_arg_signs(loc, ci, cells, rank):
    """Map local tensors to CANONICAL dof indexing: diagonal signs or
    matrix entity transforms (A_can = B_r^T A_loc B_c, matching
    assemble.py's T_rows/T_cols path)."""
    if ci.test is not None:
        sp = ci.test.space
        if getattr(sp, "has_dof_signs", False):
            s = jnp.asarray(sp.cell_dof_signs[cells])
            loc = loc * (s[:, :, None] if rank == 2 else s)
        elif getattr(sp, "has_dof_transforms", False):
            T = jnp.asarray(sp.cell_dof_transforms[cells])
            loc = (jnp.einsum("cip,cij->cpj", T, loc) if rank == 2
                   else jnp.einsum("cip,ci->cp", T, loc))
    if ci.trial is not None:
        sp = ci.trial.space
        if getattr(sp, "has_dof_signs", False):
            s = jnp.asarray(sp.cell_dof_signs[cells])
            loc = loc * s[:, None, :]
        elif getattr(sp, "has_dof_transforms", False):
            T = jnp.asarray(sp.cell_dof_transforms[cells])
            loc = jnp.einsum("cpj,cjq->cpq", loc, T)
    return loc


def _local_form_tensor(form: Form):
    """Per-cell dense tensors of a NON-mixed form over ALL cells, as a
    ``_Local``: cell part (ncell, ni[, nj]) plus cross-cell facet-pair
    blocks for genuinely two-sided dS integrals.  Cell integrals vmap
    directly; one-sided-localizable facet integrals scatter-add into the
    owning cells; two-sided dS integrals evaluate the assembler's
    facet-pair kernel (compiler/kernels.py interior_facet_kernel) and
    split its (2ni, 2nj) block tensor into diagonal (per-cell) and
    cross contributions."""
    from .compiler.kernels import CompiledIntegral
    mesh = form.mesh()
    topo = mesh.topology
    args = form.arguments()
    test = next((a for a in args if a.number == 0), None)
    trial = next((a for a in args if a.number == 1), None)
    rank = len(args)
    ni = test.space.element.ndof if test is not None else 1
    nj = trial.space.element.ndof if trial is not None else 1
    coords = jnp.asarray(mesh.coordinates.dat)
    cmap3 = mesh.coordinates.function_space().cell_dof_map.reshape(
        topo.num_cells, -1, mesh.geometric_dimension)
    out = jnp.zeros((topo.num_cells, ni, nj))
    cross = []

    def _cat_arg_signs(loc, cp, cm):
        """Canonical dof indexing on BOTH side-blocks of a facet-pair
        tensor: signs/transforms of the plus cell on the first half of
        each axis, of the minus cell on the second (the block-diag
        T_rows/T_cols path of assemble.py's interior-facet statics)."""
        def cat_sg(sp):
            sg = sp.cell_dof_signs
            return jnp.asarray(np.hstack([sg[cp], sg[cm]]))

        def cat_T(sp):
            T = np.asarray(sp.cell_dof_transforms)
            Tp_, Tm_ = T[cp], T[cm]
            ne, nd = Tp_.shape[0], Tp_.shape[1]
            out2 = np.zeros((ne, 2 * nd, 2 * nd))
            out2[:, :nd, :nd] = Tp_
            out2[:, nd:, nd:] = Tm_
            return jnp.asarray(out2)

        if test is not None:
            sp = test.space
            if getattr(sp, "has_dof_signs", False):
                s = cat_sg(sp)
                loc = loc * (s[:, :, None] if rank == 2 else s[..., None])
            elif getattr(sp, "has_dof_transforms", False):
                loc = jnp.einsum("cip,cij->cpj", cat_T(sp), loc)
        if trial is not None:
            sp = trial.space
            if getattr(sp, "has_dof_signs", False):
                loc = loc * cat_sg(sp)[:, None, :]
            elif getattr(sp, "has_dof_transforms", False):
                loc = jnp.einsum("cpj,cjq->cpq", loc, cat_T(sp))
        return loc

    def run_two_sided(ci, facets):
        """Facet-pair evaluation: both cells' dofs in one kernel call."""
        nonlocal out
        from .assemble import _perm_index_map
        from .elements.reference_cell import by_name
        kern = ci.interior_facet_kernel()
        consts = tuple(jnp.asarray(c.values()) for c in ci.constants)
        cp = topo.facet_cells[facets, 0]
        cm = topo.facet_cells[facets, 1]
        lfp = topo.facet_local_id[facets, 0]
        lfm = topo.facet_local_id[facets, 1]
        if getattr(ci, "ftype", None) is not None:
            pidx, nfv = _perm_index_map(
                mesh.cell, by_name(ci.ftype).num_vertices)
        else:
            pidx, nfv = _perm_index_map(mesh.cell)
        cellfacets = mesh.cell.facets[:, :nfv]
        vp = topo.cell_vertices[cp[:, None], cellfacets[lfp]]
        vm = topo.cell_vertices[cm[:, None], cellfacets[lfm]]
        eqm = (vm[:, :, None] == vp[:, None, :])
        pos = np.argmax(eqm, axis=2)
        o_rel = np.array([pidx[tuple(row)] for row in pos],
                         dtype=np.int32)
        cpn = coords[jnp.asarray(cmap3[cp])]
        cmn = coords[jnp.asarray(cmap3[cm])]
        ws_p = _gather_coeffs(ci, cp)
        ws_m = _gather_coeffs(ci, cm)
        nco = len(ws_p)
        loc = jax.vmap(
            lambda a, b, lp, lm, o, *w: kern(a, b, lp, lm, o,
                                             w[:nco], w[nco:], consts)
        )(cpn, cmn, jnp.asarray(lfp), jnp.asarray(lfm),
          jnp.asarray(o_rel), *ws_p, *ws_m)
        loc = _cat_arg_signs(loc, cp, cm)
        cpj, cmj = jnp.asarray(cp), jnp.asarray(cm)
        if rank == 2:
            out = out.at[cpj].add(loc[:, :ni, :nj])
            out = out.at[cmj].add(loc[:, ni:, nj:])
            cross.append((cp, cm, loc[:, :ni, nj:]))
            cross.append((cm, cp, loc[:, ni:, :nj]))
        elif rank == 1:
            out = out.at[cpj].add(loc[:, :ni, :])
            out = out.at[cmj].add(loc[:, ni:, :])
        else:
            out = out.at[cpj].add(loc)

    def run_facets(ci, facets, sides):
        nonlocal out
        kern = ci.exterior_facet_kernel()
        consts = tuple(jnp.asarray(c.values()) for c in ci.constants)
        for side in sides:
            cells = topo.facet_cells[facets, side]
            lf = jnp.asarray(topo.facet_local_id[facets, side])
            ce = coords[jnp.asarray(cmap3[cells])]
            ws = _gather_coeffs(ci, cells)
            loc = jax.vmap(lambda c, l, *w: kern(c, l, w, consts))(
                ce, lf, *ws)
            loc = _apply_arg_signs(loc, ci, cells, 2)
            out = out.at[jnp.asarray(cells)].add(loc)

    def _facet_classes(facets):
        """[(ftype_or_None, facet subset)]: prisms mix triangle and
        quad facets, each class compiles its own kernel (the same split
        assemble.py:64-73 makes)."""
        if mesh.cell.facet_cell_name is not None:
            return [(None, facets)]
        ftypes = np.asarray(mesh.cell.facet_types)
        fcls = ftypes[topo.facet_local_id[facets, 0]]
        return [(ft, facets[fcls == ft])
                for ft in sorted(set(mesh.cell.facet_types))]

    for integral in form.integrals():
        itype = integral.integral_type
        if itype == "cell":
            ci = CompiledIntegral(integral, test, trial, mesh)
            kern = ci.cell_kernel()
            consts = tuple(jnp.asarray(c.values()) for c in ci.constants)
            cells = mesh.cell_subset(integral.subdomain_id)
            if len(cells) == 0:
                continue
            ce = coords[jnp.asarray(cmap3[cells])]
            ws = _gather_coeffs(ci, cells)
            loc = jax.vmap(lambda c, *w: kern(c, w, consts))(ce, *ws)
            loc = _apply_arg_signs(loc, ci, cells, 2)
            out = out.at[jnp.asarray(cells)].add(loc)
        elif itype == "exterior_facet":
            facets = mesh.boundary_facets(integral.subdomain_id)
            if len(facets) == 0:
                continue
            one = Integral(_one_sided(integral.integrand),
                           "exterior_facet", integral.subdomain_id,
                           integral.metadata, integral.domain)
            for ft, fsub in _facet_classes(facets):
                if len(fsub) == 0:
                    continue
                ci = CompiledIntegral(one, test, trial, mesh, ftype=ft)
                run_facets(ci, fsub, (0,))
        elif itype == "interior_facet":
            facets = topo.interior_facets
            if integral.subdomain_id not in ("everywhere", None):
                sd = integral.subdomain_id
                if isinstance(sd, (int, np.integer)):
                    sd = (int(sd),)
                facets = facets[np.isin(
                    mesh.facet_markers[facets], np.asarray(sd))]
            if len(facets) == 0:
                continue
            if _is_two_sided(integral.integrand):
                # genuinely two-sided coupling: facet-pair kernel
                for ft, fsub in _facet_classes(facets):
                    if len(fsub) == 0:
                        continue
                    ci = CompiledIntegral(integral, test, trial, mesh,
                                          ftype=ft)
                    run_two_sided(ci, fsub)
            else:
                one = Integral(_one_sided(integral.integrand),
                               "exterior_facet", "everywhere",
                               integral.metadata, integral.domain)
                for ft, fsub in _facet_classes(facets):
                    if len(fsub) == 0:
                        continue
                    ci = CompiledIntegral(one, test, trial, mesh,
                                          ftype=ft)
                    run_facets(ci, fsub, (0, 1))
        else:
            raise NotImplementedError(
                f"Slate local tensors over {itype!r} integrals")
    if rank == 1:
        out = out[:, :, 0]
    elif rank == 0:
        out = out[:, 0, 0]
    return _Local(out, cross)


def _axis_dims(parts):
    return [p.space.element.ndof for p in parts]


def _eval_local(expr, cache):
    """-> jnp array (ncell, ...) of per-cell dense values."""
    # identity-checked strong-ref memo: bare id() keys can be recycled
    # by CPython onto later temporaries (see compiler/lowering.py eval)
    key = id(expr)
    hit = cache.get(key)
    if hit is not None and hit[0] is expr:
        return hit[1]
    v = _eval_local_impl(expr, cache)
    cache[key] = (expr, v)
    return v


def _eval_local_impl(expr, cache):
    if isinstance(expr, Tensor):
        if all(len(parts) == 1 for parts in expr.axis_parts):
            return _local_form_tensor(expr.form)
        # mixed: pack per-field blocks into one dense local tensor
        from .mixed import extract_block
        dims = [_axis_dims(p) for p in expr.axis_parts]
        offs = [np.concatenate([[0], np.cumsum(d)]) for d in dims]
        mesh = expr.form.mesh()
        nc = mesh.topology.num_cells
        shape = (nc,) + tuple(int(o[-1]) for o in offs)
        out = jnp.zeros(shape)
        cross = []
        if expr.rank == 2:
            for i, ti in enumerate(expr.axis_parts[0]):
                for j, tj in enumerate(expr.axis_parts[1]):
                    blk = extract_block(expr.form, ti.part, tj.part)
                    if not blk.integrals():
                        continue
                    loc = _local_form_tensor(blk)
                    out = out.at[:, offs[0][i]:offs[0][i + 1],
                                 offs[1][j]:offs[1][j + 1]].set(loc.cell)
                    for (rc, cc, vals) in loc.cross:
                        # embed the sub-block at the blocked offsets
                        big = jnp.zeros((vals.shape[0],) + shape[1:])
                        big = big.at[:, offs[0][i]:offs[0][i + 1],
                                     offs[1][j]:offs[1][j + 1]].set(vals)
                        cross.append((rc, cc, big))
        else:
            for i, ti in enumerate(expr.axis_parts[0]):
                blk = extract_block(expr.form, ti.part, None)
                if not blk.integrals():
                    continue
                loc = _local_form_tensor(blk)
                out = out.at[:, offs[0][i]:offs[0][i + 1]].set(loc.cell)
        return _Local(out, cross)
    if isinstance(expr, AssembledVector):
        # NB: local tensors are CANONICAL-indexed (dof signs applied at
        # kernel level), so coefficient gathers here must stay UNSIGNED —
        # contractions then pair canonical coefficients with canonical
        # rows (a signed gather would cancel the tensor's signs, s^2=1)
        V = expr.space
        from .mixed import MixedFunctionSpace
        if isinstance(V, MixedFunctionSpace):
            parts = [jnp.asarray(sub.dat)[jnp.asarray(Vi.cell_dof_map)]
                     for sub, Vi in zip(expr.f.subfunctions,
                                        V.subspaces)]
            return _Local(jnp.concatenate(parts, axis=1))
        dat = jnp.asarray(expr.f.dat)
        return _Local(dat[jnp.asarray(V.cell_dof_map)])
    if isinstance(expr, Transpose):
        v = _eval_local(expr.a, cache)
        if expr.rank != 2:
            return v
        return _Local(jnp.swapaxes(v.cell, 1, 2),
                      [(cc, rc, jnp.swapaxes(vals, 1, 2))
                       for (rc, cc, vals) in v.cross])
    if isinstance(expr, Negative):
        v = _eval_local(expr.a, cache)
        return _Local(-v.cell,
                      [(rc, cc, -vals) for (rc, cc, vals) in v.cross])
    if isinstance(expr, Inverse):
        from .ops.batched_inverse import batched_inv
        return _Local(batched_inv(
            _no_cross(_eval_local(expr.a, cache), "Inverse")))
    if isinstance(expr, Add):
        a = _eval_local(expr.a, cache)
        b = _eval_local(expr.b, cache)
        return _Local(a.cell + b.cell, a.cross + b.cross)
    if isinstance(expr, Mul):
        a = _no_cross(_eval_local(expr.a, cache), "contraction (Mul)")
        b = _no_cross(_eval_local(expr.b, cache), "contraction (Mul)")
        if a.shape[-1] != b.shape[1]:
            raise ValueError(
                f"Slate contraction mismatch: {a.shape} x {b.shape} — "
                "check block slicing / Tensor axes")
        if expr.a.rank == 2 and expr.b.rank == 2:
            return _Local(jnp.einsum("cij,cjk->cik", a, b))
        if expr.a.rank == 2 and expr.b.rank == 1:
            return _Local(jnp.einsum("cij,cj->ci", a, b))
        if expr.a.rank == 1 and expr.b.rank == 2:
            return _Local(jnp.einsum("ci,cij->cj", a, b))
        raise NotImplementedError
    if isinstance(expr, Solve):
        from .ops.batched_inverse import batched_solve
        A = _no_cross(_eval_local(expr.A, cache), "Solve")
        b = _no_cross(_eval_local(expr.b, cache), "Solve")
        if A.shape[-1] != b.shape[1]:
            raise ValueError(
                f"Slate solve mismatch: {A.shape} x {b.shape}")
        return _Local(batched_solve(A, b))
    if isinstance(expr, Factorization):
        # XLA batches one LU for the whole cell axis either way; the
        # factorization is the (already batched-solve-shared) operand
        return _eval_local(expr.a, cache)
    if isinstance(expr, DiagonalTensor):
        v = _no_cross(_eval_local(expr.a, cache), "DiagonalTensor")
        n = v.shape[1]
        d = jnp.einsum("cii->ci", v)
        return _Local(jnp.eye(n)[None, :, :] * d[:, :, None])
    if isinstance(expr, Reciprocal):
        v = _no_cross(_eval_local(expr.a, cache), "Reciprocal")
        return _Local(jnp.where(v != 0,
                                1.0 / jnp.where(v == 0, 1.0, v), 0.0))
    if isinstance(expr, Block):
        v = _eval_local(expr.a, cache)
        sls = [slice(None)]
        for axis, idx in enumerate(expr.indices):
            parts = _axis_parts(expr.a)[axis]
            offs = np.concatenate([[0], np.cumsum(_axis_dims(parts))])
            if isinstance(idx, slice):
                rng = range(len(parts))[idx]
                sls.append(slice(int(offs[rng.start]),
                                 int(offs[rng.stop - 1 + 1])))
            else:
                sls.append(slice(int(offs[idx]), int(offs[idx + 1])))
        sls = tuple(sls)
        return _Local(v.cell[sls],
                      [(rc, cc, vals[sls]) for (rc, cc, vals) in v.cross])
    raise NotImplementedError(type(expr).__name__)


# --------------------------------------------- axis (argument) bookkeeping
class _SpaceAxis:
    """Pseudo-argument carrying just a space (AssembledVector axes)."""
    def __init__(self, space):
        self.space = space


def _axis_parts(expr):
    """Per remaining axis: the list of per-field part arguments."""
    if isinstance(expr, Tensor):
        return expr.axis_parts
    if isinstance(expr, AssembledVector):
        from .mixed import MixedFunctionSpace
        V = expr.space
        if isinstance(V, MixedFunctionSpace):
            return [[_SpaceAxis(V.sub(i)) for i in
                     range(V.num_sub_spaces)]]
        return [[_SpaceAxis(V)]]
    if isinstance(expr, (Transpose, Inverse)):
        return _axis_parts(expr.a)[::-1]
    if isinstance(expr, (Negative, Factorization, DiagonalTensor,
                         Reciprocal)):
        return _axis_parts(expr.a)
    if isinstance(expr, Add):
        return _axis_parts(expr.a)
    if isinstance(expr, Mul):
        a = _axis_parts(expr.a)
        b = _axis_parts(expr.b)
        return a[:-1] + b[1:]
    if isinstance(expr, Solve):
        A = _axis_parts(expr.A)[::-1]
        b = _axis_parts(expr.b)
        return A[:-1] + b[1:]
    if isinstance(expr, Block):
        out = []
        for axis, idx in enumerate(expr.indices):
            parts = _axis_parts(expr.a)[axis]
            out.append([parts[idx]] if isinstance(idx, int)
                       else list(np.asarray(parts, dtype=object)[idx]))
        return out
    raise NotImplementedError(type(expr).__name__)


def _axis_space(parts, what):
    if len(parts) != 1:
        raise NotImplementedError(
            f"global assembly of a Slate expression with a multi-field "
            f"{what} axis — slice to single fields with .blocks[i, j]")
    return parts[0].space


def assemble_slate(expr, bcs=None):
    """Assemble a Slate expression into a global scalar/vector/matrix."""
    from .assembly.sparsity import Sparsity
    from .assembly.matrix import Matrix
    cache = {}
    loc = _eval_local(expr, cache)
    local = loc.cell
    if expr.rank == 0:
        return float(jnp.sum(local))
    axes = _axis_parts(expr)
    V0 = _axis_space(axes[0], "row")
    rows = jnp.asarray(V0.cell_dof_map)
    # NOTE: dof signs are already applied inside the local tensors
    # (signed local basis == global basis restricted to the cell), so the
    # scatter is a plain add.
    if expr.rank == 1:
        out = jnp.zeros(V0.dim).at[rows.reshape(-1)].add(local.reshape(-1))
        f = Cofunction(V0)
        f.dat = np.asarray(out)
        return f
    V1 = _axis_space(axes[1], "column")
    cols = np.asarray(V1.cell_dof_map)
    rmap, cmap = np.asarray(V0.cell_dof_map), cols
    blocks = [(rmap, cmap)]
    # cross-cell facet-pair couplings (two-sided dS): extra COO blocks
    blocks += [(rmap[rc], cmap[cc]) for (rc, cc, _vals) in loc.cross]
    sp = Sparsity(V0.dim, V1.dim, blocks)
    data = jnp.zeros(sp.nnz).at[jnp.asarray(sp.block_positions[0])].add(
        local.reshape(-1))
    for (pos, (_rc, _cc, vals)) in zip(sp.block_positions[1:], loc.cross):
        data = data.at[jnp.asarray(pos)].add(vals.reshape(-1))
    A = Matrix(sp, data, V0, V1)
    if bcs:
        from .bcs import DirichletBC
        nodes = np.unique(np.concatenate(
            [bc.nodes for bc in bcs]))
        A = A.with_dirichlet(nodes)
    return A
