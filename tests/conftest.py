"""Test configuration: run on CPU with 8 virtual devices (the reference
tests distributed behavior with mpiexec -n N on localhost — SURVEY §4; we
use XLA's host-platform device simulation instead)."""
import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

# XLA:CPU compilation recurses deeply on nested while-loop programs
# (fgmres with an inner-Krylov preconditioner); under pytest's deeper
# Python frames the default 8MB stack segfaults the compiler.  The main
# thread's stack grows up to RLIMIT_STACK, so raise the soft limit.
import resource

_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY:
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))

import jax

# The axon sitecustomize pins the platform to the tunneled TPU; tests must
# run on (multi-)CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# XLA:CPU segfaults in backend_compile late in long suite runs (~100+
# compiled programs; crashes reproduce at different, individually-green
# tests).  Dropping compiled-executable caches periodically keeps the
# JIT's native state bounded and has not reproduced the crash since.
import pytest as _pytest

_test_count = [0]


@_pytest.fixture(autouse=True)
def _bounded_jax_jit_state():
    yield
    _test_count[0] += 1
    if _test_count[0] % 40 == 0:
        jax.clear_caches()
