"""Adjoint/AD surface (reference: firedrake/adjoint/__init__.py:1-40 —
pyadjoint re-exports).  See tape.py for the TPU-native design."""
from .tape import (annotate_tape, continue_annotation, pause_annotation,
                   get_working_tape, set_working_tape, Tape, Control,
                   ReducedFunctional, compute_gradient, taylor_test,
                   AdjFloat, SolveBlock, FunctionalBlock)

__all__ = ["annotate_tape", "continue_annotation", "pause_annotation",
           "get_working_tape", "set_working_tape", "Tape", "Control",
           "ReducedFunctional", "compute_gradient", "taylor_test",
           "AdjFloat"]
