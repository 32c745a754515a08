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

import pytest  # noqa: E402

# Fast-lane marking (VERDICT r4 #6): `pytest -m "not slow"` gives a green
# signal in ~16 min measured on the 1-core build VM (round-5 session,
# 275 tests; a multi-core host is proportionally faster — the wall is
# serialized CPU jit compiles). Everything here is a multi-10s
# end-to-end/parity compile whose AREA is still covered by smaller tests
# in the fast lane; the full suite is unchanged. Names (not nodeids) so
# parametrized variants are caught too. Durations from the round-5
# `--durations=60` run.
_SLOW_TEST_NAMES = {
    "test_step_updates_only_trainable",          # 300 s
    "test_capture_view_sharded_matches",         # 124 s
    "test_capture_shapes",                       # 35 s
    "test_feeds_engine",                         # 94 s
    "test_tp_sampling_matches_and_partitions",   # 77 s
    "test_tp_training_loss_matches_replicated",  # 32 s
    "test_lr_schedule_applies",                  # 76 s
    "test_recon_and_samples",                    # 33 s
    "test_inception_matches_independent_torch",  # 60 s setup + 12 s
    "test_evaluate_cli_smoke",                   # 32 s
    "test_evaluate_cli_fid_from_files",          # 28 s
    "test_pose_block_parity",                    # 51 s
    "test_compact_refs_match_dense",             # 49 s
    "test_cfg3_render_dedupe_matches_full",      # 225 s
    "test_cfg3_render_dedupe_matches_full_chunked",  # 90 s
    "test_prefix_dedupe_matches_full",           # 78 s (x3 e2e still in lane via test_ip2p_guider_path)
    "test_dp_sampling_over_mesh",                # 47 s
    "test_unet_gradients_flow_only_through_target_stream",  # 29 s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in _SLOW_TEST_NAMES:
            item.add_marker(pytest.mark.slow)
