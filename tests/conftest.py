"""Test harness: force an 8-virtual-device CPU platform before any backend
initialization so multi-chip sharding paths are exercised without TPU hardware.

Note: the TPU platform plugin in this environment ignores the JAX_PLATFORMS
env var, so we use jax.config.update instead (XLA_FLAGS must still be set
before the CPU backend initializes).
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
