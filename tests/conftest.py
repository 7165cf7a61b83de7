"""Test harness: run everything on an 8-device virtual CPU mesh.

The reference has no tests at all (SURVEY §4); we substitute a real suite.
Multi-device behavior is validated via XLA's host-platform device splitting,
the JAX-native fake-cluster substitute.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin can override JAX_PLATFORMS; pin explicitly.
jax.config.update("jax_platforms", "cpu")


import sys

sys.path.insert(0, os.path.dirname(__file__))
