"""Regenerate the committed cross-round numerics goldens.

    python tools/make_goldens.py          # write tests/goldens/*
    python tools/make_goldens.py --check  # recompute and diff, write nothing

Run this ONLY when a numerics change is intentional and understood (e.g. a
deliberate algorithm change) — the whole point of the goldens is that
accidental drift fails CI (tests/test_goldens.py).
"""
import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args(argv)

    # the TP-sharded sampling golden needs a multi-device CPU mesh (the
    # pytest path gets 8 from tests/conftest.py)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    # the axon TPU plugin ignores JAX_PLATFORMS env; force via config
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tools.goldens_lib import (
        GOLDEN_DIR,
        GOLDEN_JSON,
        GOLDEN_NPZ,
        compute_goldens,
        sample_sha,
    )

    goldens = compute_goldens()
    meta = {
        "sample3_sha256_1e-3": sample_sha(goldens),
        "keys": {
            k: {
                "shape": list(v.shape),
                "mean": float(v.mean()),
                "std": float(v.std()),
            }
            for k, v in goldens.items()
        },
    }

    if args.check:
        old = np.load(GOLDEN_NPZ)
        bad = []
        for k, v in goldens.items():
            d = float(np.abs(old[k] - v).max()) if k in old else float("inf")
            status = "OK" if d < 1e-5 else "DIFF"
            print(f"{k}: max_abs_diff={d:.3e} {status}")
            if status != "OK":
                bad.append(k)
        print(f"sample3 sha: {meta['sample3_sha256_1e-3']}")
        return 1 if bad else 0

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    np.savez_compressed(GOLDEN_NPZ, **goldens)
    with open(GOLDEN_JSON, "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    size = os.path.getsize(GOLDEN_NPZ)
    print(
        f"wrote {GOLDEN_NPZ} ({size/1024:.0f} KiB, {len(goldens)} keys), "
        f"sample3 sha {meta['sample3_sha256_1e-3']}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
