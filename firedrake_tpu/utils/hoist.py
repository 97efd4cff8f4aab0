"""Constant-hoisting jit: compile closures without baking arrays in.

Large solver programs (GMG V-cycles, whole-KSP solves) are built as
Python closures over level operators, transfer tables, and boundary
masks.  Under plain `jax.jit` every closed-over concrete array is
lowered as an HLO literal *inside the module proto*: at the 16M-dof
north-star configuration the serialized program exceeds 100s of MB and
the axon remote-compile helper rejects it (HTTP 413 "length limit
exceeded"; PERF_NOTES round 5).  A 200k-element f64 constant alone is
~3.2 MB of stablehlo text; hoisted to a parameter the same module is
~700 bytes.

`hoisted_jit(f, *example_args)` traces `f` once with `make_jaxpr`,
splits the closure's constants out of the jaxpr, and returns a wrapped
callable whose compiled module takes every former constant as a runtime
parameter.  The constants live as ordinary device buffers (they already
did); only the *program* stops embedding them.

Role parity: PETSc's KSPSolve never serializes operator data into the
program text at all (operators are runtime objects); this restores that
property under XLA's trace-and-compile model.
"""
import jax
from jax import core as _core
from jax import tree_util as _tu


def hoisted_jit(f, *example_args, donate_consts=False):
    """jit(f) with all closed-over constants passed as arguments.

    Traces ``f`` at ``example_args`` (concrete or ShapeDtypeStruct
    pytrees), hoists the jaxpr's constvars into runtime parameters, and
    returns ``wrapped(*args)`` matching ``f``'s signature.  The trace
    is committed: ``f`` must be jit-stable at these shapes (same
    contract as jax.jit with static shapes).
    """
    flat_ex, in_tree = _tu.tree_flatten(example_args)

    def flat_f(*flat_args):
        args = _tu.tree_unflatten(in_tree, flat_args)
        return f(*args)

    closed, out_shape = jax.make_jaxpr(flat_f, return_shape=True)(*flat_ex)
    out_tree = _tu.tree_structure(out_shape)
    consts = list(closed.consts)
    jaxpr = closed.jaxpr

    @jax.jit
    def run(consts_in, flat_args):
        out = _core.eval_jaxpr(jaxpr, consts_in, *flat_args)
        return _tu.tree_unflatten(out_tree, out)

    def wrapped(*args):
        flat, tree = _tu.tree_flatten(args)
        if tree != in_tree:
            raise TypeError(
                f"hoisted_jit: argument structure {tree} does not match "
                f"the example structure {in_tree}")
        return run(consts, flat)

    wrapped.consts = consts
    wrapped._run = run
    return wrapped
