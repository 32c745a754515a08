"""Persistent XLA compile-cache setup, keyed by XLA's own CPU target.

One shared entry point for bench.py / __graft_entry__.py / benchmarks so the
cache policy lives in one place. Why the keying: CPU AOT executables embed
host-specific vector codegen; a ``.jax_cache`` directory shipped from a
machine with a different CPU can make ``cpu_aot_loader`` emit
machine-feature-mismatch errors — or, worse, SIGILL — on the new host.
Scoping the CPU cache under a per-target fingerprint directory means a
foreign machine's entries are simply never seen (one cold compile instead
of a crash).

Round-3 lesson: hashing ``/proc/cpuinfo`` flags is NOT a sufficient key —
XLA's compile-time target string also carries LLVM *tuning* features
(``+prefer-no-gather`` etc.) chosen per CPU *model*, so two hosts with
identical cpuinfo flag sets can still mismatch at AOT load time. The only
authoritative key is the target-feature string XLA itself embeds in its
AOT results, so we obtain exactly that: compile a trivial jit into a
throwaway cache dir and lift the ``+64bit,+adx,...`` run out of the entry
(zstd/zlib-compressed CompilationResult proto). Falls back to the cpuinfo
hash if any step fails. TPU executables target the chip, not the host ISA,
and libtpu already versions its own cache keys, so the TPU cache stays
shared.
"""
from __future__ import annotations

import hashlib
import os
import platform
import re


def _host_fingerprint() -> str:
    """Stable-ish fingerprint of the host CPU's instruction-set features
    (fallback key only — see module docstring for why it's not sufficient)."""
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


_FEAT_RE = re.compile(rb"[+-][a-z0-9.\-]+(?:,[+-][a-z0-9.\-]+){8,}")


def _decompress(blob: bytes):
    try:
        import zstandard

        return zstandard.ZstdDecompressor().decompress(
            blob, max_output_size=1 << 26
        )
    except Exception:
        pass
    try:
        import zlib

        return zlib.decompress(blob)
    except Exception:
        return None


_BENIGN_AOT = re.compile(
    rb"cpu_aot_loader\.cc.*Target machine feature \+prefer-no-[a-z\-]+ is"
)
_FILTER_ON = False


def install_benign_aot_log_filter():
    """Drop the ONE known-false-positive XLA error line from stderr:
    ``cpu_aot_loader.cc: Target machine feature +prefer-no-<x> is not
    supported on the host machine``.

    Why this is safe to drop: XLA embeds LLVM *tuning* pseudo-features
    (``+prefer-no-gather``/``+prefer-no-scatter``, chosen per CPU model)
    in every CPU AOT result, but the loader's host check enumerates only
    real CPUID features — so the line fires on EVERY disk-cache hit, even
    for entries this very process wrote minutes earlier (verified: two
    back-to-back dryruns on one machine; the miss run is silent, the hit
    run warns). A REAL ISA mismatch can't reach this loader at all because
    the cache directory is keyed by the full XLA target-feature string
    (see module docstring) — a foreign cache lands in a different
    directory. Lines naming any real feature (``+avx512...``) are NOT
    matched and pass through untouched, as does everything else on stderr.

    Installed once per process (idempotent); forwards via a reader thread
    on a pipe dup2'd over fd 2.
    """
    global _FILTER_ON
    if _FILTER_ON:
        return
    import threading

    try:
        real_err = os.dup(2)
        r, w = os.pipe()
        os.dup2(w, 2)
        os.close(w)

        def pump():
            buf = b""
            while True:
                chunk = os.read(r, 65536)
                if not chunk:
                    break
                buf += chunk
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    if not _BENIGN_AOT.search(line):
                        os.write(real_err, line + b"\n")
            if buf:
                os.write(real_err, buf)

        threading.Thread(target=pump, daemon=True).start()
        _FILTER_ON = True
    except Exception:  # pragma: no cover - filter is best-effort
        pass


def _reset_cache_object():
    """Make a jax_compilation_cache_dir update take effect: JAX holds the
    cache instance in a module global, so without this reset later writes
    keep going to the previously-configured directory."""
    try:
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()
    except Exception:  # pragma: no cover - internal API, best-effort
        pass


_PROBED: list = []  # memo: [] = not probed yet, [fp_or_None] = probed


def _xla_cpu_target_fingerprint() -> str | None:
    """Hash of the exact target-feature string XLA compiles CPU AOT results
    with. Probe: one trivial jit into a throwaway cache dir (~0.1 s), then
    scan the entry for the comma-joined ±feature run. Memoized per process.
    Returns None if the probe fails for any reason (caller falls back to
    the cpuinfo hash)."""
    if _PROBED:
        return _PROBED[0]
    import glob
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    tmp = tempfile.mkdtemp(prefix="xla_feat_probe_")
    fp = None
    try:
        jax.config.update("jax_compilation_cache_dir", tmp)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _reset_cache_object()
        jax.jit(lambda x: x * 2.0 + 1.0)(jnp.ones((4,), jnp.float32))
        for f in glob.glob(os.path.join(tmp, "*-cache")):
            with open(f, "rb") as fh:
                out = _decompress(fh.read())
            if not out:
                continue
            m = _FEAT_RE.search(out)
            if m and b"64bit" in m.group(0):
                fp = hashlib.sha1(m.group(0)).hexdigest()[:12]
                break
    except Exception:  # pragma: no cover - probe is best-effort
        fp = None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    _PROBED.append(fp)
    return fp


def setup_compile_cache(root: str | None = None, min_compile_secs: float = 5.0):
    """Enable the on-disk XLA compile cache; returns the directory used.

    ``root`` defaults to ``$CD360_JAX_CACHE`` or ``<repo>/.jax_cache``. When
    the active JAX backend is CPU, entries go under a subdirectory keyed by
    XLA's own target-feature string (see module docstring), so a cache
    directory carried to a different host can never feed it mismatched AOT
    executables.
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
            fp = _xla_cpu_target_fingerprint()
            root = os.path.join(
                root,
                f"cpu-xla-{fp}" if fp else f"cpu-{_host_fingerprint()}",
            )
            # same-host cache HITS still trip a false-positive loader error
            # over XLA's tuning pseudo-features; drop exactly that line
            install_benign_aot_log_filter()
        jax.config.update("jax_compilation_cache_dir", root)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
        )
        _reset_cache_object()
    except Exception:  # pragma: no cover - cache is best-effort
        pass
    return root
