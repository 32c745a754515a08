"""End-to-end CLI test on the REAL (non-smoke) data path.

Drives the production workflow from README on a synthetic on-disk CO3D
dataset and a tiny random-init config: Co3dDataset + prefetch DataLoader
-> 2 train steps -> reference-feature capture -> delta_last.npz +
cameras.npz -> sample CLI consuming both. This is the reference's
main.py -> sample.py pipeline (SURVEY §3.1/§3.2) without weights.
"""
import dataclasses
import os

import numpy as np
import pytest

from tests.test_data import make_synthetic_co3d


@pytest.mark.slow
def test_train_capture_sample_on_synthetic_co3d(tmp_path):
    import yaml

    from custom_diffusion360_tpu.cli.sample import main as sample_main
    from custom_diffusion360_tpu.cli.sample import make_tokenizers
    from custom_diffusion360_tpu.cli.train import main as train_main
    from custom_diffusion360_tpu.utils.config import config_to_dict
    from tests.test_engine import TINY_CFG

    root = make_synthetic_co3d(tmp_path / "co3d")

    # tiny config as a YAML --config file, with real tokenizer vocab sizes
    # so the <new1> id lands exactly on modifier row 0
    tok, _ = make_tokenizers(None, context_length=16)
    cfg = dataclasses.replace(TINY_CFG)
    d = config_to_dict(cfg)
    d["conditioner"]["clip_l"]["vocab_size"] = tok.base_vocab_size
    d["conditioner"]["open_clip"]["vocab_size"] = tok.base_vocab_size
    cfg_path = tmp_path / "tiny.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(d, f)

    out = tmp_path / "run"
    train_main([
        "--data_root", root, "--category", "car",
        "--config", str(cfg_path), "--output_dir", str(out),
        "--max_steps", "2", "--img_size", "64", "--num_images", "3",
        "--batch_size", "1", "--log_every", "1",
    ])

    delta = out / "delta_last.npz"
    cameras = out / "cameras.npz"
    assert delta.exists() and cameras.exists()
    with np.load(delta) as z:
        keys = list(z.keys())
    assert any("references" in k for k in keys), keys
    # V* token-embedding rows ship under "embed.N" (io/delta.py layout)
    assert any(k.startswith("embed.") for k in keys), keys

    # consume the delta + cameras through the sample CLI (tiny config via
    # the same overrides; --smoke selects TINY_CFG + random init)
    samples = tmp_path / "samples"
    sample_main([
        "--smoke", "--num_steps", "2", "--num_images", "1",
        "--resolution", "64", "--scale_im", "0", "--num_ref", "2",
        "--delta_ckpt", str(delta), "--cameras", str(cameras),
        "--output_dir", str(samples),
        "--override", f"conditioner.clip_l.vocab_size={tok.base_vocab_size}",
        "--override", f"conditioner.open_clip.vocab_size={tok.base_vocab_size}",
    ])
    pngs = [f for f in os.listdir(samples) if f.endswith(".png")]
    assert pngs, "sample CLI wrote no images"
