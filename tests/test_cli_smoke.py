"""End-to-end CLI smokes on the CPU mesh: train --smoke -> delta ->
sample --smoke. Mirrors the on-TPU verification surfaces so CI is
self-contained."""
import os

import pytest


@pytest.mark.slow
def test_train_then_sample_smoke(tmp_path):
    from custom_diffusion360_tpu.cli.sample import main as sample_main
    from custom_diffusion360_tpu.cli.train import main as train_main

    out = tmp_path / "run"
    train_main([
        "--smoke", "--output_dir", str(out),
        "--sample_every", "1", "--log_steps_increase",
    ])
    assert (out / "delta_last.npz").exists()
    assert (out / "config.json").exists()
    assert (out / "metrics.csv").exists()
    # --sample_every 1 (+ the power-of-two early schedule) wrote grids
    images = os.listdir(out / "images")
    assert any(f.startswith("samples_") for f in images)

    samples = tmp_path / "samples"
    sample_main([
        "--smoke", "--num_steps", "2", "--num_images", "1",
        "--resolution", "64", "--scale_im", "0",
        "--delta_ckpt", str(out / "delta_last.npz"),
        "--output_dir", str(samples),
    ])
    pngs = [f for f in os.listdir(samples) if f.endswith(".png")]
    assert pngs, "sample CLI wrote no images"

    # batched serving: 3 poses in chunks of 2 (ragged tail padded, not saved)
    batched = tmp_path / "samples_b2"
    sample_main([
        "--smoke", "--num_steps", "2", "--num_images", "3", "--batch", "2",
        "--resolution", "64", "--scale_im", "0",
        "--delta_ckpt", str(out / "delta_last.npz"),
        "--output_dir", str(batched),
    ])
    pngs = sorted(f for f in os.listdir(batched) if f.endswith(".png"))
    assert len(pngs) == 3, pngs
