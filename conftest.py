"""Pytest bootstrap: force the CPU x64 backend with 8 virtual devices.

The container's ``sitecustomize`` imports jax at interpreter start and pins an
experimental single-chip TPU backend with no float64 support.  The test suite
needs the CPU backend with x64 enabled and 8 virtual devices (for mesh /
sharding tests without hardware, per SURVEY.md section 5).  Backends initialize
lazily, so switching via ``jax.config`` here — before any test module touches a
jax array — takes effect cleanly.
"""

import os

import jax

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
