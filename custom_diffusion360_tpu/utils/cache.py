"""Persistent XLA compile-cache setup, keyed by host ISA on CPU backends.

One shared entry point for bench.py / __graft_entry__.py / benchmarks so the
cache policy lives in one place. Why the ISA keying: CPU AOT executables
embed host-specific vector codegen; a ``.jax_cache`` directory shipped from
a machine with wider CPU features (AVX-512 etc.) can make ``cpu_aot_loader``
emit machine-feature-mismatch errors — or, worse, SIGILL — on a narrower
host. Scoping the CPU cache under a per-host fingerprint directory means a
foreign machine's entries are simply never seen (one cold compile instead of
a crash). TPU executables target the chip, not the host ISA, and libtpu
already versions its own cache keys, so the TPU cache stays shared.
"""
from __future__ import annotations

import hashlib
import os
import platform


def _host_fingerprint() -> str:
    """Stable-ish fingerprint of the host CPU's instruction-set features."""
    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        parts.append(platform.processor() or "unknown")
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]


def setup_compile_cache(root: str | None = None, min_compile_secs: float = 5.0):
    """Enable the on-disk XLA compile cache; returns the directory used.

    ``root`` defaults to ``$CD360_JAX_CACHE`` or ``<repo>/.jax_cache``. When
    the active JAX backend is CPU, entries go under a host-ISA-keyed
    subdirectory (see module docstring).
    """
    import jax

    if root is None:
        root = os.environ.get(
            "CD360_JAX_CACHE",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                ".jax_cache",
            ),
        )
    try:
        if jax.default_backend() == "cpu":
            root = os.path.join(root, f"cpu-{_host_fingerprint()}")
        jax.config.update("jax_compilation_cache_dir", root)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
        )
    except Exception:  # pragma: no cover - cache is best-effort
        pass
    return root
