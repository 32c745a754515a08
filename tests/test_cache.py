"""Persistent compile-cache keying (utils/cache.py).

The CPU cache directory must be keyed by XLA's OWN target-feature string —
not /proc/cpuinfo flags — because XLA's AOT results embed LLVM tuning
features (``+prefer-no-gather`` …) chosen per CPU model; two hosts with
identical cpuinfo flag sets can still mismatch at ``cpu_aot_loader`` time
(round-3 dryrun tail spam). These tests prove the probe extracts that
string, the directory is keyed by it, and compiles actually land there.
"""
import os

import jax
import jax.numpy as jnp

from custom_diffusion360_tpu.utils import cache


def test_probe_extracts_target_features():
    fp = cache._xla_cpu_target_fingerprint()
    assert fp is not None and len(fp) == 12
    # memoized: a second call returns the identical value without re-probing
    assert cache._xla_cpu_target_fingerprint() == fp


def test_cache_dir_keyed_and_used(tmp_path):
    root = str(tmp_path / "jc")
    used = cache.setup_compile_cache(root, min_compile_secs=0.0)
    fp = cache._xla_cpu_target_fingerprint()
    assert used == os.path.join(root, f"cpu-xla-{fp}")
    jax.jit(lambda x: x @ x + 3.0)(jnp.ones((16, 16)))
    assert any(f.endswith("-cache") for f in os.listdir(used))


def test_benign_aot_filter_drops_only_the_false_positive():
    """The stderr filter must drop exactly the tuning-pseudo-feature loader
    line and pass real errors through (subprocess: the filter is process-
    global fd plumbing)."""
    import subprocess
    import sys

    code = r"""
import os, sys, time
sys.path.insert(0, %r)
from custom_diffusion360_tpu.utils.cache import install_benign_aot_log_filter
install_benign_aot_log_filter()
os.write(2, b"E0819 cpu_aot_loader.cc:210] Loading XLA:CPU AOT result. "
            b"Target machine feature +prefer-no-gather is not  supported "
            b"on the host machine.\n")
os.write(2, b"E0819 cpu_aot_loader.cc:210] Loading XLA:CPU AOT result. "
            b"Target machine feature +avx512bf16 is not  supported on the "
            b"host machine.\n")
os.write(2, b"ordinary stderr line\n")
time.sleep(0.3)  # let the pump thread drain
""" % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, timeout=60
    )
    err = r.stderr.decode()
    assert "prefer-no-gather" not in err
    assert "+avx512bf16" in err  # real feature mismatches must survive
    assert "ordinary stderr line" in err


def test_feature_regex_matches_real_string():
    s = (b"\x00junk+64bit,+adx,+aes,+avx,+avx2,+bmi,+bmi2,+cmov,+crc32,"
         b"+prefer-no-gather,-amx-complex,-avx10.1\x07more")
    m = cache._FEAT_RE.search(s)
    assert m is not None
    assert m.group(0).startswith(b"+64bit") and b"prefer-no-gather" in m.group(0)
    assert m.group(0).endswith(b"-avx10.1")
