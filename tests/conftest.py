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

# Persistent compile cache for the suite (VERDICT r3 #8): the heavy e2e
# smokes re-compile structurally identical tiny-engine programs from
# DIFFERENT jit instances — the in-memory jit cache can't dedupe those, but
# the on-disk cache keys by HLO, so both re-runs AND first runs get hits.
# CPU entries are keyed by XLA's target-feature string (utils/cache.py), so
# a cache directory carried across machines can't feed mismatched AOT code.
# Multi-process ranks (tests/test_multihost.py) self-gate in cli/train.py.
from custom_diffusion360_tpu.utils.cache import setup_compile_cache  # noqa: E402

setup_compile_cache(min_compile_secs=1.0)
