"""Recursive solver composition from PETSc-style options trees.

Reference role: firedrake/dmhooks.py:1-40 + PETSc's options-prefix
machinery — the reference's "real superpower" (SURVEY §7): any
`solver_parameters` dict whose prefixed sub-dicts configure nested
solvers, e.g.::

    {"ksp_type": "fgmres",
     "pc_type": "fieldsplit",
     "pc_fieldsplit_type": "schur",
     "fieldsplit_0_ksp_type": "preonly",
     "fieldsplit_0_pc_type": "mg",
     "fieldsplit_0_mg_levels_ksp_type": "chebyshev",
     "fieldsplit_1_ksp_type": "gmres",
     "fieldsplit_1_pc_type": "python",
     "fieldsplit_1_pc_python_type": "firedrake.MassInvPC",
     "fieldsplit_1_Mp_ksp_type": "preonly",
     "fieldsplit_1_Mp_pc_type": "jacobi"}

TPU shape: every solver/PC built here is a *traceable callable* — inner
Krylov loops are `lax.while_loop`s nested inside the outer one, so the
entire composed solve is still ONE XLA program (no PETSc-style
callbacks between levels).
"""
from __future__ import annotations

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from .krylov import KSP_METHODS

__all__ = ["OpCtx", "build_ksp", "build_pc", "EllMatrix"]

# inner (prefixed) solves default to preonly; the outermost to gmres
_DENSE_LIMIT = 6000


class OpCtx:
    """Everything a nested solver needs to build itself.

    mat     assembled operator (Matrix / BlockMatrix / EllMatrix), BCs
            already applied; None for matrix-free contexts.
    matvec  traceable y = A @ x (defaults to mat.matvec).
    space   FunctionSpace of the (sub)problem — python PCs rebuild forms
            on it (MassInvPC etc.).
    form    the bilinear form, for re-discretization PCs (mg, pmg).
    bcs     DirichletBCs restricted to this space.
    appctx  user application context (viscosity, Reynolds, state, ...).
    """

    def __init__(self, *, mat=None, matvec=None, space=None, form=None,
                 bcs=(), appctx=None):
        self.mat = mat
        self.matvec = matvec if matvec is not None else (
            mat.matvec if mat is not None else None)
        self.space = space
        self.form = form
        self.bcs = tuple(bcs or ())
        self.appctx = appctx or {}
        self._cheb_bounds = None

    @property
    def dim(self):
        if self.mat is not None:
            return self.mat.shape[0]
        return self.space.dim

    def diagonal(self):
        if self.mat is None:
            raise ValueError(
                "this preconditioner needs an assembled operator; got a "
                "matrix-free context (use pc_type 'none', 'python' with "
                "an assembling PC, or mat_type 'aij')")
        return self.mat.diagonal()

    def cheb_bounds(self):
        """(emin, emax) estimate for D^-1 A by power iteration (the
        PETSc ksp_chebyshev_esteig role).  Runs as ONE jitted device
        program and returns DEVICE scalars: reading even one float back
        through the axon tunnel permanently degrades every later
        dispatch (PERF_NOTES round 2b), and the Chebyshev smoother is
        happy with traced bounds."""
        if self._cheb_bounds is None:
            d = self.diagonal()
            dinv = jnp.where(jnp.abs(d) > 0, 1.0 / d, 1.0)
            mv = self.matvec
            rng = np.random.default_rng(0)
            x0 = jnp.asarray(rng.standard_normal(self.dim))

            @jax.jit
            def power(x):
                def body(i, x):
                    y = dinv * mv(x)
                    return y / jnp.linalg.norm(y)
                x = jax.lax.fori_loop(0, 12, body, x)
                return jnp.linalg.norm(dinv * mv(x))

            lam = power(x0)
            self._cheb_bounds = (0.25 * lam, 1.05 * lam)
        return self._cheb_bounds


class EllMatrix:
    """Device ELL matrix built from a host scipy CSR (for derived
    operators like the selfp Schur approximation)."""

    def __init__(self, csr, row_space=None):
        csr = csr.tocsr()
        csr.sum_duplicates()
        self.shape = csr.shape
        nrows = csr.shape[0]
        counts = np.diff(csr.indptr)
        kmax = max(int(counts.max()), 1)
        cols = np.zeros((nrows, kmax), dtype=np.int64)
        data = np.zeros((nrows, kmax))
        # vectorized ELL fill (no per-row host loop)
        rows = np.repeat(np.arange(nrows), counts)
        within = np.arange(csr.nnz) - np.repeat(csr.indptr[:-1], counts)
        cols[rows, within] = csr.indices
        data[rows, within] = csr.data
        self._cols = jnp.asarray(cols)
        self._data = jnp.asarray(data)
        self._csr = csr
        self.row_space = row_space

    def matvec(self, x):
        return jnp.sum(self._data * jnp.asarray(x)[self._cols], axis=1)

    __matmul__ = matvec

    def diagonal(self):
        return jnp.asarray(self._csr.diagonal())

    def to_scipy(self):
        return self._csr

    def to_dense(self):
        return self._csr.toarray()


def opt(params, prefix, key, default=None):
    return params.get(prefix + key, default)


# --------------------------------------------------------------------- KSP
def build_ksp(ctx: OpCtx, params: dict, prefix: str = ""):
    """Return solve(b, x0=None) -> x, a traceable approximate inverse of
    ctx's operator, configured by `<prefix>ksp_*` / `<prefix>pc_*`.

    Inner (prefixed) KSPs default to preonly+<pc>, matching PETSc's
    sub-KSP defaults; tolerances default looser than the outer solve
    (rtol 1e-5, max_it 100)."""
    inner = bool(prefix)
    ksp_type = opt(params, prefix, "ksp_type",
                   "preonly" if inner else "gmres")
    pc = build_pc(ctx, params, prefix)
    if ksp_type == "preonly":
        return lambda b, x0=None: pc(b)
    kw = dict(rtol=float(opt(params, prefix, "ksp_rtol",
                             1e-5 if inner else 1e-7)),
              atol=float(opt(params, prefix, "ksp_atol", 1e-50)),
              max_it=int(opt(params, prefix, "ksp_max_it",
                             100 if inner else 10000)))
    if ksp_type in ("gmres", "fgmres"):
        kw["restart"] = int(opt(params, prefix, "ksp_gmres_restart", 30))
    if ksp_type == "chebyshev":
        pct = opt(params, prefix, "pc_type",
                  "jacobi" if ctx.mat is not None else "none")
        if pct == "jacobi":
            emin, emax = ctx.cheb_bounds()
        else:
            # estimate the spectrum of the ACTUAL preconditioned
            # operator (PETSc esteig semantics) — Jacobi-based bounds
            # on e.g. a patch-smoothed operator put the Chebyshev
            # interval wildly off (diverges on 3D vertex stars)
            emin, emax = _preconditioned_bounds(ctx, pc)
        kw["emin"], kw["emax"] = emin, emax
    if ksp_type == "richardson":
        kw["damping"] = float(opt(params, prefix,
                                  "ksp_richardson_scale", 1.0))
    meth = KSP_METHODS[ksp_type]
    op = ctx.matvec

    def solve(b, x0=None):
        return meth(op, b, x0=x0, pc=pc, **kw).x

    solve._ksp_type = ksp_type
    solve._full = lambda b, x0=None: meth(op, b, x0=x0, pc=pc, **kw)
    return solve


def _preconditioned_bounds(ctx, pc, iters=15):
    """(emin, emax) for M^-1 A by device power iteration (device
    scalars — no d2h; see OpCtx.cheb_bounds)."""
    mv = ctx.matvec
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(ctx.dim))

    @jax.jit
    def power(x):
        def body(i, x):
            y = pc(mv(x))
            return y / jnp.linalg.norm(y)
        x = jax.lax.fori_loop(0, iters, body, x)
        return jnp.linalg.norm(pc(mv(x)))

    lam = power(x0)
    return 0.25 * lam, 1.05 * lam


# ---------------------------------------------------------------------- PC
def build_pc(ctx: OpCtx, params: dict, prefix: str = ""):
    """Return pc(r) -> z (traceable) for `<prefix>pc_type`."""
    pc_type = opt(params, prefix, "pc_type",
                  "jacobi" if ctx.mat is not None else "none")
    builder = _PC_BUILDERS.get(pc_type)
    if builder is None:
        raise NotImplementedError(
            f"pc_type {pc_type!r} (prefix {prefix!r}); available: "
            f"{sorted(_PC_BUILDERS)}")
    return builder(ctx, params, prefix)


def _pc_none(ctx, params, prefix):
    return lambda r: r


def _pc_jacobi(ctx, params, prefix):
    d = ctx.diagonal()
    dinv = jnp.where(jnp.abs(d) > 0, 1.0 / d, 1.0)
    return lambda r: dinv * r


_warned_substitutions = set()


def _pc_jacobi_substitute(ctx, params, prefix):
    pc_type = opt(params, prefix, "pc_type")
    key = (pc_type, prefix)
    if key not in _warned_substitutions:
        _warned_substitutions.add(key)
        warnings.warn(
            f"pc_type {pc_type!r} has no TPU-native implementation; "
            "substituting point-Jacobi. Expect different convergence — "
            "consider 'jacobi', 'patch'/'vanka' smoothers, 'mg', or a "
            "python PC instead.", stacklevel=3)
    return _pc_jacobi(ctx, params, prefix)


def _pc_lu(ctx, params, prefix):
    """Exact inverse: dense on device when small, host sparse LU via
    pure_callback otherwise (correct everywhere; on TPU the callback
    round-trips — prefer an iterative inner solve at scale)."""
    n = ctx.dim
    limit = int(opt(params, prefix, "pc_factor_dense_limit", _DENSE_LIMIT))
    if ctx.mat is None:
        raise ValueError("pc_type 'lu' needs an assembled operator")
    if n <= limit:
        if jax.default_backend() == "tpu" and hasattr(ctx.mat,
                                                      "to_dense_device"):
            # device-side inverse: XLA:TPU has no f64 LU, but f32
            # jnp.linalg.inv lowers natively (the Pallas Gauss-Jordan
            # SIGABRTs the remote compile helper when nested inside
            # while-loop programs — PERF_NOTES round 3); one f64
            # iterative-refinement step restores coarse-solve accuracy;
            # a host round-trip would poison the tunnel (round 2b)
            dense32 = ctx.mat.to_dense_device().astype(jnp.float32)
            Ainv32 = jnp.linalg.inv(dense32)
            mv = ctx.mat.matvec

            def pc(r):
                x = (Ainv32 @ r.astype(jnp.float32)).astype(r.dtype)
                res = r - mv(x)
                return x + (Ainv32 @ res.astype(jnp.float32)
                            ).astype(r.dtype)
            return pc
        Ainv = jnp.asarray(np.linalg.inv(ctx.mat.to_dense()))
        return lambda r: Ainv @ r
    from scipy.sparse.linalg import splu
    lu = splu(ctx.mat.to_scipy().tocsc())

    def host_solve(r):
        return lu.solve(np.asarray(r, dtype=np.float64))

    def pc(r):
        return jax.pure_callback(
            host_solve, jax.ShapeDtypeStruct((n,), r.dtype), r,
            vmap_method="sequential")

    return pc


def _pc_ksp(ctx, params, prefix):
    """PCKSP: a full inner Krylov solve as the preconditioner."""
    solve = build_ksp(ctx, params, prefix + "ksp_")
    return lambda r: solve(r)


def _pc_mg(ctx, params, prefix):
    from ..mg.vcycle import GMGPreconditioner
    if ctx.form is None or ctx.space is None:
        raise ValueError("pc_type 'mg' needs the bilinear form + space "
                         "(re-discretization)")
    return GMGPreconditioner(ctx.form, ctx.bcs, ctx.space,
                             params=params, prefix=prefix,
                             appctx=ctx.appctx)


def _pc_pmg(ctx, params, prefix):
    from ..mg.pmg import PMGPC
    if ctx.form is None or ctx.space is None:
        raise ValueError("pc_type 'pmg' needs the bilinear form + space")
    return PMGPC(ctx.form, ctx.bcs, ctx.space, params=params,
                 prefix=prefix, appctx=ctx.appctx)


def _pc_patch(ctx, params, prefix):
    from .preconditioners import make_star_patch
    if ctx.mat is None or ctx.space is None:
        raise ValueError("patch pc needs an assembled matrix + space")
    return make_star_patch(ctx.mat, ctx.space)


def _pc_vanka(ctx, params, prefix):
    from .preconditioners import make_vanka_patch
    if ctx.mat is None or ctx.space is None:
        raise ValueError("vanka pc needs an assembled matrix + space")
    exclude = opt(params, prefix, "pc_vanka_exclude_field", None)
    return make_vanka_patch(ctx.mat, ctx.space, exclude_field=exclude)


def _pc_linesmooth(ctx, params, prefix):
    from .asm import ASMLinesmoothPC
    pc_obj = ASMLinesmoothPC()
    pc_obj.initialize_ctx(ctx, params, prefix)
    return pc_obj.apply


def _pc_extruded_star(ctx, params, prefix):
    from .asm import ASMExtrudedStarPC
    pc_obj = ASMExtrudedStarPC()
    pc_obj.initialize_ctx(ctx, params, prefix)
    return pc_obj.apply


def _pc_gridline(ctx, params, prefix):
    from .asm import ASMGridLinePC
    pc_obj = ASMGridLinePC()
    pc_obj.initialize_ctx(ctx, params, prefix)
    return pc_obj.apply


def _pc_python(ctx, params, prefix):
    name = opt(params, prefix, "pc_python_type", "")
    cls = _resolve_python_pc(name)
    pc_obj = cls()
    pc_obj.initialize_ctx(ctx, params, prefix)
    return pc_obj.apply


def _resolve_python_pc(name):
    from . import pcs as _pcs
    short = name.rsplit(".", 1)[-1]
    if hasattr(_pcs, short):
        return getattr(_pcs, short)
    # user-provided dotted path (AuxiliaryOperatorPC subclasses)
    if "." in name:
        import importlib
        mod, cls = name.rsplit(".", 1)
        try:
            return getattr(importlib.import_module(mod), cls)
        except (ImportError, AttributeError) as e:
            raise ImportError(f"cannot resolve pc_python_type {name!r}: "
                              f"{e}") from e
    raise NotImplementedError(f"pc_python_type {name!r}")


def _pc_composite(ctx, params, prefix):
    """PCCOMPOSITE: additive or multiplicative combination of sub-PCs
    configured under sub_0_, sub_1_, ... prefixes."""
    names = [s.strip() for s in
             opt(params, prefix, "pc_composite_pcs", "").split(",") if s]
    ctype = opt(params, prefix, "pc_composite_type", "additive")
    subs = []
    for i, nm in enumerate(names):
        sub_params = dict(params)
        sub_params[prefix + f"sub_{i}_pc_type"] = nm
        subs.append(build_pc(ctx, sub_params, prefix + f"sub_{i}_"))
    op = ctx.matvec

    def pc(r):
        if ctype == "additive":
            z = subs[0](r)
            for s in subs[1:]:
                z = z + s(r)
            return z
        z = subs[0](r)
        for s in subs[1:]:
            z = z + s(r - op(z))
        return z

    return pc


# --------------------------------------------------------------- fieldsplit
def _field_bcs(ctx, i):
    """Dirichlet BCs of mixed field i, re-rooted on the plain subspace
    (so re-discretization PCs like mg can rebuild them per level)."""
    from ..bcs import DirichletBC
    out = []
    for b in ctx.bcs:
        fs = getattr(b, "function_space_obj", None)
        if getattr(fs, "index", None) == i and \
                getattr(fs, "parent", None) is ctx.space:
            out.append(DirichletBC(fs._V, b.g, b.sub_domain,
                                   b.sub_component))
    return tuple(out)


def _field_ctx(ctx, i):
    """OpCtx of diagonal block i of a mixed operator."""
    W = ctx.space
    Vi = W.subspaces[i]
    Bi = ctx.mat.blocks.get((i, i)) if ctx.mat is not None else None
    return OpCtx(mat=Bi, space=Vi, form=_block_form(ctx, i, i),
                 bcs=_field_bcs(ctx, i), appctx=ctx.appctx)


def _block_form(ctx, i, j):
    """Bilinear form of block (i,j) with arguments re-rooted on the
    plain subspaces (for re-discretization PCs)."""
    form, W = ctx.form, ctx.space
    if form is None or W is None:
        return None
    try:
        from ..mixed import extract_block
        from ..language.core import Argument
        from ..language.calculus import map_expr
        from ..language.measure import Form
        blk = extract_block(form, i, j)
        mapping = {}
        for it in blk.integrals():
            for t in it.integrand.traverse():
                if isinstance(t, Argument) and t.part is not None:
                    V = W.subspaces[t.part]
                    mapping[t] = Argument(V, t.number, part=None)
        out = [it.reconstruct(map_expr(it.integrand, mapping))
               for it in blk.integrals()]
        return Form(tuple(out))
    except Exception:
        return None


def _pc_fieldsplit(ctx, params, prefix):
    W = ctx.space
    if W is None or not getattr(W, "num_sub_spaces", 0):
        raise ValueError("pc_type 'fieldsplit' needs a mixed space")
    A = ctx.mat
    if A is None:
        raise ValueError("fieldsplit needs an assembled block operator "
                         "(mat_type aij)")
    nf = W.num_sub_spaces
    fs_type = opt(params, prefix, "pc_fieldsplit_type", "additive")
    offsets = W.offsets
    dims = [V.dim for V in W.subspaces]

    def split(r):
        return [jax.lax.dynamic_slice(r, (offsets[i],), (dims[i],))
                for i in range(nf)]

    def inner_solver(i):
        fc = _field_ctx(ctx, i)
        if fc.mat is None:
            # zero diagonal block (e.g. Stokes pressure): identity
            return lambda b, x0=None: b
        return build_ksp(fc, params, prefix + f"fieldsplit_{i}_")

    if fs_type in ("additive", "multiplicative",
                   "symmetric_multiplicative"):
        inner = [inner_solver(i) for i in range(nf)]

        def sweep(rs, zs, order):
            """Block Gauss-Seidel: recompute field i's residual from all
            fields with corrections so far, then solve block (i,i)."""
            for i in order:
                ri = rs[i]
                for j in range(nf):
                    if j == i or zs[j] is None:
                        continue
                    B = A.blocks.get((i, j))
                    if B is not None:
                        ri = ri - B.matvec(zs[j])
                zs[i] = inner[i](ri)
            return zs

        def pc(r):
            rs = split(r)
            if fs_type == "additive":
                return jnp.concatenate([f(ri)
                                        for f, ri in zip(inner, rs)])
            zs = sweep(rs, [None] * nf, range(nf))
            if fs_type == "symmetric_multiplicative":
                zs = sweep(rs, zs, range(nf - 2, -1, -1))
            return jnp.concatenate(zs)

        return pc

    if fs_type != "schur":
        raise NotImplementedError(f"pc_fieldsplit_type {fs_type!r}")
    if nf != 2:
        raise ValueError("schur fieldsplit needs exactly 2 fields")
    return _schur_pc(ctx, params, prefix, split)


def _schur_pc(ctx, params, prefix, split):
    """Schur-complement fieldsplit: factorization full/diag/lower/upper,
    Schur preconditioned per pc_fieldsplit_schur_precondition
    (a11 | selfp | full)."""
    A = ctx.mat
    A00 = A.blocks.get((0, 0))
    A01 = A.blocks.get((0, 1))
    A10 = A.blocks.get((1, 0))
    A11 = A.blocks.get((1, 1))
    fact = opt(params, prefix, "pc_fieldsplit_schur_fact_type", "full")
    sp_kind = opt(params, prefix, "pc_fieldsplit_schur_precondition",
                  "a11")

    ctx0 = _field_ctx(ctx, 0)
    inv0 = build_ksp(ctx0, params, prefix + "fieldsplit_0_")

    # Schur operator S = A11 - A10 inv0 A01 (matrix-free, uses the
    # *preconditioner-quality* inv0, PETSc semantics when fieldsplit_0 is
    # preonly; with an inner KSP this is the "full" inner solve)
    def S_matvec(x1):
        y = A01.matvec(x1) if A01 is not None else jnp.zeros(
            ctx0.dim, dtype=x1.dtype)
        z = inv0(y)
        out = A11.matvec(x1) if A11 is not None else jnp.zeros_like(x1)
        return out - (A10.matvec(z) if A10 is not None else 0.0)

    # the matrix the Schur PC is built against
    W = ctx.space
    V1 = W.subspaces[1]
    if sp_kind == "selfp":
        # Sp = A11 - A10 diag(A00)^-1 A01, assembled on host
        import scipy.sparse as sp
        d0 = np.asarray(ctx0.diagonal())
        d0inv = sp.diags(np.where(np.abs(d0) > 0, 1.0 / d0, 1.0))
        Sp_sci = (-(A10.to_scipy() @ d0inv @ A01.to_scipy())).tocsr()
        if A11 is not None:
            Sp_sci = (A11.to_scipy() + Sp_sci).tocsr()
        Smat = EllMatrix(Sp_sci, row_space=V1)
    elif sp_kind in ("a11", "user"):
        Smat = A11
    elif sp_kind == "full":
        Smat = None   # matrix-free on S itself
    else:
        raise NotImplementedError(
            f"pc_fieldsplit_schur_precondition {sp_kind!r}")

    ctx1 = OpCtx(mat=Smat, matvec=S_matvec, space=V1,
                 form=_block_form(ctx, 1, 1),
                 bcs=_field_bcs(ctx, 1), appctx=ctx.appctx)
    p1 = params
    if Smat is None and opt(params, prefix + "fieldsplit_1_",
                            "pc_type") in (
            "jacobi", "bjacobi", "sor", "ilu", "icc", "lu", "cholesky"):
        # no Schur matrix to precondition with (zero A11 under a11):
        # drop to unpreconditioned, matching the round-1 behaviour
        p1 = dict(params)
        p1[prefix + "fieldsplit_1_pc_type"] = "none"
    inv1 = build_ksp(ctx1, p1, prefix + "fieldsplit_1_")

    def pc(r):
        r0, r1 = split(r)
        if fact == "diag":
            # PETSc convention: -S^{-1} on the (1,1) block (minres-safe)
            return jnp.concatenate([inv0(r0), -inv1(r1)])
        if fact == "lower":
            z0 = inv0(r0)
            z1 = inv1(r1 - (A10.matvec(z0) if A10 is not None else 0.0))
            return jnp.concatenate([z0, z1])
        if fact == "upper":
            z1 = inv1(r1)
            z0 = inv0(r0 - (A01.matvec(z1) if A01 is not None else 0.0))
            return jnp.concatenate([z0, z1])
        # full
        z0 = inv0(r0)
        s = r1 - (A10.matvec(z0) if A10 is not None else 0.0)
        z1 = inv1(s)
        c = A01.matvec(z1) if A01 is not None else 0.0
        z0 = z0 - inv0(c)
        return jnp.concatenate([z0, z1])

    return pc


def _pc_hypre(ctx, params, prefix):
    raise NotImplementedError(
        "pc_type 'hypre' (BoomerAMG) has no TPU analogue here; use "
        "'mg' (geometric, needs MeshHierarchy) or 'pmg'")


_PC_BUILDERS = {
    "none": _pc_none,
    "jacobi": _pc_jacobi,
    "bjacobi": _pc_jacobi_substitute,
    "sor": _pc_jacobi_substitute,
    "ilu": _pc_jacobi_substitute,
    "icc": _pc_jacobi_substitute,
    "lu": _pc_lu,
    "cholesky": _pc_lu,
    "ksp": _pc_ksp,
    "mg": _pc_mg,
    "gamg": _pc_mg,
    "pmg": _pc_pmg,
    "patch": _pc_patch,
    "asm": _pc_patch,
    "star": _pc_patch,
    "vanka": _pc_vanka,
    "linesmooth": _pc_linesmooth,
    "extruded_star": _pc_extruded_star,
    "gridline": _pc_gridline,
    "python": _pc_python,
    "composite": _pc_composite,
    "fieldsplit": _pc_fieldsplit,
    "hypre": _pc_hypre,
}
