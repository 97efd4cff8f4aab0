"""Mixed function spaces and block assembly.

Reference: firedrake/functionspaceimpl.py:1030 MixedFunctionSpace,
firedrake/formmanipulation.py:270 split_form / ExtractSubBlock (block
extraction), pyop2 MixedDat/MixedMap/MatBlock.

Design (TPU-first): a mixed space is a *composition layer* — each block
(i,j) of a mixed form is extracted symbolically by zeroing all other
parts (exact by multilinearity + Zero folding, the same affinity trick as
lhs/rhs), then assembled with the ordinary single-space pipeline.  The
monolithic operator is a block matrix acting on one concatenated dof
vector; fieldsplit preconditioning composes per-block PCs.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .functionspace import FunctionSpace
from .language.core import Argument, Zero
from .language.measure import Form
from .language.calculus import map_expr


class IndexedFunctionSpace:
    """W.sub(i): view of component i of a mixed space.  Delegates all
    space queries to the underlying subspace; remembers (parent, index)
    for dof offsetting (reference: functionspaceimpl.py WithGeometry.sub)."""

    def __init__(self, parent: "MixedFunctionSpace", index: int):
        self.parent = parent
        self.index = index
        self._V = parent.subspaces[index]

    def __getattr__(self, name):
        return getattr(self._V, name)

    def mesh(self):
        return self._V.mesh_obj

    @property
    def offset(self):
        return self.parent.offsets[self.index]

    def __eq__(self, other):
        return (isinstance(other, IndexedFunctionSpace)
                and self.parent is other.parent
                and self.index == other.index)

    def __hash__(self):
        return hash((id(self.parent), self.index))

    def __repr__(self):
        return f"{self.parent!r}.sub({self.index})"


class MixedFunctionSpace:
    """Reference: functionspaceimpl.py:1030."""

    def __init__(self, spaces, name=None):
        flat = []
        for s in spaces:
            if isinstance(s, MixedFunctionSpace):
                flat.extend(s.subspaces)
            else:
                flat.append(s)
        self.subspaces = tuple(flat)
        self.mesh_obj = flat[0].mesh_obj
        assert all(V.mesh_obj is self.mesh_obj for V in flat), \
            "mixed space components must share a mesh"
        self.name = name or "Mixed(" + ",".join(V.name for V in flat) + ")"
        dims = [V.dim for V in flat]
        self.offsets = np.concatenate([[0], np.cumsum(dims)])[:-1]
        self.dim = int(sum(dims))
        self.value_shape = ()   # not directly evaluable
        self.block_size = 1

    @property
    def num_sub_spaces(self):
        return len(self.subspaces)

    def sub(self, i):
        return IndexedFunctionSpace(self, i)

    def split(self):
        return tuple(self.sub(i) for i in range(self.num_sub_spaces))

    def mesh(self):
        return self.mesh_obj

    @property
    def element(self):
        return tuple(V.element for V in self.subspaces)

    def __iter__(self):
        return iter(self.split())

    def __getitem__(self, i):
        return self.sub(i)

    def __len__(self):
        return self.num_sub_spaces

    def __mul__(self, other):
        if isinstance(other, (FunctionSpace, MixedFunctionSpace)):
            return MixedFunctionSpace([self, other])
        return NotImplemented

    def __repr__(self):
        return self.name


def mixed_arguments(W: MixedFunctionSpace, number: int):
    """The per-part Arguments for TestFunctions/TrialFunctions(W)."""
    return tuple(Argument(W.sub(i), number, part=i)
                 for i in range(W.num_sub_spaces))


def is_mixed(space):
    return isinstance(space, MixedFunctionSpace)


def split_mixed_terminals(form):
    """Rewrite UNSPLIT mixed-space terminals — Argument(W, n) on a
    MixedFunctionSpace, or a MixedFunction coefficient — into flat
    component vectors of their split parts, so `TestFunction(W)` and
    `inner(sol, test)` work without an explicit split() (ufl's
    mixed-element flat-component convention; the reference splits these
    in compute_form_data.  Exercised by the reference's
    tests/firedrake/regression/test_interior_facets.py
    test_interior_facet_solve).  Identity when nothing is unsplit."""
    from .language.tensor_algebra import as_vector
    from .language.calculus import replace
    from .language.core import Coefficient

    def flat_components(parts):
        comps = []
        for p in parts:
            vs = tuple(getattr(p, "shape", ()) or ())
            if vs == ():
                comps.append(p)
            elif len(vs) == 1:
                comps.extend(p[i] for i in range(vs[0]))
            else:
                raise NotImplementedError(
                    "unsplit mixed terminal with a tensor-valued part; "
                    "use split()")
        return as_vector(comps)

    mapping = {}
    for it in form.integrals():
        for t in it.integrand.traverse():
            if any(t is k for k in mapping):
                continue
            if isinstance(t, Argument) and is_mixed(t.space):
                mapping[t] = flat_components(
                    mixed_arguments(t.space, t.number))
            elif (isinstance(t, Coefficient)
                  and getattr(t, "parts", None) is not None):
                mapping[t] = flat_components(t.parts)
    return replace(form, mapping) if mapping else form


# --------------------------------------------------------- block extraction
def form_parts(form: Form, number: int):
    """All distinct part indices of arguments with the given number."""
    parts = set()
    for it in form.integrals():
        for t in it.integrand.traverse():
            if isinstance(t, Argument) and t.number == number:
                parts.add(t.part)
    return sorted(parts, key=lambda p: (-1 if p is None else p))


def extract_block(form: Form, test_part, trial_part):
    """Block (i,j): zero every argument belonging to other parts.
    Exact by multilinearity (reference: formmanipulation.py:29
    ExtractSubBlock)."""
    mapping = {}
    for it in form.integrals():
        for t in it.integrand.traverse():
            if isinstance(t, Argument):
                keep = ((t.number == 0 and t.part == test_part)
                        or (t.number == 1 and t.part == trial_part)
                        or t.number > 1)
                if not keep:
                    mapping[t] = Zero(t.shape)
    out = []
    for it in form.integrals():
        integrand = map_expr(it.integrand, mapping)
        if not integrand.is_zero():
            out.append(it.reconstruct(integrand))
    return Form(tuple(out))


# -------------------------------------------------------------- block matrix
class BlockMatrix:
    """(nfields x nfields) block operator on ONE concatenated vector."""

    def __init__(self, W_test, W_trial, blocks):
        self.W_test = W_test
        self.W_trial = W_trial
        self.blocks = blocks    # dict (i, j) -> Matrix
        self.row_offsets = W_test.offsets
        self.col_offsets = W_trial.offsets
        self.shape = (W_test.dim, W_trial.dim)

    @property
    def M(self):
        from .assembly.matrix import MatView

        def getblock(ij):
            B = self.blocks.get(tuple(ij))
            if B is None:
                i, j = ij
                import numpy as _np

                class _Zero:
                    def to_dense(inner):
                        return _np.zeros(
                            (self.W_test.subspaces[i].dim,
                             self.W_trial.subspaces[j].dim))
                return _Zero()
            return B
        return MatView(self, getblock)

    def matvec(self, x):
        outs = []
        for i, Vi in enumerate(self.W_test.subspaces):
            acc = jnp.zeros(Vi.dim, dtype=x.dtype)
            for j, Vj in enumerate(self.W_trial.subspaces):
                B = self.blocks.get((i, j))
                if B is None:
                    continue
                xj = jax.lax.dynamic_slice(x, (self.col_offsets[j],),
                                           (Vj.dim,))
                acc = acc + B.matvec(xj)
            outs.append(acc)
        return jnp.concatenate(outs)

    __matmul__ = matvec

    def diagonal(self):
        outs = []
        for i, Vi in enumerate(self.W_test.subspaces):
            B = self.blocks.get((i, i))
            outs.append(B.diagonal() if B is not None
                        else jnp.ones(Vi.dim))
        return jnp.concatenate(outs)

    def to_scipy(self):
        from scipy.sparse import bmat, csr_matrix
        n = self.W_test.num_sub_spaces
        m = self.W_trial.num_sub_spaces
        grid = [[None] * m for _ in range(n)]
        for i in range(n):
            for j in range(m):
                B = self.blocks.get((i, j))
                if B is not None:
                    grid[i][j] = B.to_scipy()
                elif i == j:
                    pass
        return bmat(grid, format="csr")

    def to_dense(self):
        return self.to_scipy().toarray()

    def with_dirichlet(self, bc_rows, symmetric=True):
        """Monolithic Dirichlet elimination given CONCATENATED dof rows."""
        bc_rows = np.asarray(bc_rows)
        new = {}
        for (i, j), B in self.blocks.items():
            ro, co = self.row_offsets[i], self.col_offsets[j]
            ri = bc_rows[(bc_rows >= ro)
                         & (bc_rows < ro + self.W_test.subspaces[i].dim)] \
                - ro
            cj = bc_rows[(bc_rows >= co)
                         & (bc_rows < co + self.W_trial.subspaces[j].dim)]\
                - co
            data = B.data
            s = B.sparsity
            rows, cols = jnp.asarray(s.coo_rows), jnp.asarray(s.coo_cols)
            rmask = jnp.zeros(s.nrows, dtype=bool)
            if len(ri):
                rmask = rmask.at[jnp.asarray(ri)].set(True)
            cmask = jnp.zeros(s.ncols, dtype=bool)
            if len(cj) and symmetric:
                cmask = cmask.at[jnp.asarray(cj)].set(True)
            keep = ~rmask[rows] & ~cmask[cols]
            data = jnp.where(keep, data, 0.0)
            if i == j and len(ri):
                dpos = jnp.asarray(s.diag_positions)[jnp.asarray(ri)]
                data = data.at[jnp.clip(dpos, 0)].set(
                    jnp.where(dpos >= 0, 1.0, data[jnp.clip(dpos, 0)]))
            from .assembly.matrix import Matrix
            new[(i, j)] = Matrix(s, data, B.row_space, B.col_space, B.bcs)
        # bc rows living in a field WITHOUT a diagonal block (e.g. a trace
        # multiplier with no self-coupling) need a synthesized identity
        from .assembly.sparsity import Sparsity as _Sp
        from .assembly.matrix import Matrix as _Mat
        import jax.numpy as _jnp
        for i, Vi in enumerate(self.W_test.subspaces):
            if (i, i) in new:
                continue
            ro = self.row_offsets[i]
            ri = bc_rows[(bc_rows >= ro) & (bc_rows < ro + Vi.dim)] - ro
            if len(ri) == 0:
                continue
            sp = _Sp(Vi.dim, Vi.dim, [(ri[:, None], ri[:, None])])
            data = _jnp.ones(sp.nnz)
            new[(i, i)] = _Mat(sp, data, Vi, Vi)
        return BlockMatrix(self.W_test, self.W_trial, new)
