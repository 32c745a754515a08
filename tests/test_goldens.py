"""Cross-round numerics anchor: recompute every module's fixed-seed output
and assert it matches the committed goldens (tests/goldens/goldens.npz).

Why: real SDXL weights are unavailable here (zero egress), so nothing else
prevents a refactor from silently drifting numerics between rounds. These
goldens stand in for the reference-fidelity target (sample.py:201-351)
until weights-day. If a change is INTENTIONAL, regenerate with
``python tools/make_goldens.py`` and say why in the commit message.
"""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from tools.goldens_lib import GOLDEN_JSON, GOLDEN_NPZ, compute_goldens, sample_sha

# CPU XLA is deterministic for a fixed version; the tolerance absorbs only
# minor cross-version instruction-scheduling drift, not algorithm changes.
ATOL = 1e-5


@pytest.mark.slow
def test_goldens_match():
    assert os.path.exists(GOLDEN_NPZ), (
        "goldens missing — run `python tools/make_goldens.py` and commit "
        "tests/goldens/"
    )
    fresh = compute_goldens()
    old = np.load(GOLDEN_NPZ)

    report = []
    for k in sorted(set(fresh) | set(old.files)):
        if k not in fresh:
            report.append(f"{k}: REMOVED (in goldens, not computed)")
            continue
        if k not in old.files:
            report.append(f"{k}: NEW (computed, not in goldens — regenerate)")
            continue
        a, b = old[k], fresh[k]
        if a.shape != b.shape:
            report.append(f"{k}: SHAPE {a.shape} -> {b.shape}")
            continue
        d = float(np.abs(a - b).max())
        rel = d / (float(np.abs(a).max()) + 1e-12)
        if d > ATOL and rel > 1e-4:
            report.append(
                f"{k}: max_abs_diff={d:.3e} rel={rel:.3e} "
                f"(golden mean={a.mean():.6f}, fresh mean={b.mean():.6f})"
            )
    assert not report, (
        "numerics drifted vs committed goldens:\n  " + "\n  ".join(report)
        + "\nIf intentional: python tools/make_goldens.py && git add tests/goldens"
    )

    with open(GOLDEN_JSON) as f:
        meta = json.load(f)
    assert sample_sha(fresh) == meta["sample3_sha256_1e-3"], (
        "3-step sample fingerprint SHA changed — end-to-end sampling "
        "numerics drifted"
    )
