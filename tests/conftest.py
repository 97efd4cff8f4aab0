"""Test configuration: run on CPU with 8 virtual devices (the reference
tests distributed behavior with mpiexec -n N on localhost — SURVEY §4; we
use XLA's host-platform device simulation instead)."""
import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax

# The axon sitecustomize pins the platform to the tunneled TPU; tests must
# run on (multi-)CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
