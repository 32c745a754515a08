#!/usr/bin/env python
"""Input-pipeline benchmark: Co3dDataset + DataLoader rate vs the chip rate.

The training-step bench (bench.py --train) proves the chip sustains ~157
train img/min at 512^2; this proves (or disproves) that the REAL input
pipeline — JPEG decode, mask decode, bbox crop, native bicubic resize,
collate, host->device transfer — can feed that rate. Reference counterpart:
torch DataLoader(num_workers=4) over CO3Dv2 (data_co3d.py:636-737).

With no --data_root it synthesizes a CO3Dv2-shaped dataset on disk at
realistic source resolution (default 40 frames of 1200x900 JPEG — the CO3D
ballpark) and measures:

  * host items/s: dataset __getitem__ + numpy collate only (what the worker
    pool does; excludes device transfer),
  * end-to-end batches/s through the DataLoader (includes the jnp.asarray
    device puts in collate),

for each --workers value. Prints one JSON line per (workers, phase).

NOTE on axon-tunnel machines: host->device runs at ~30 MB/s through the
tunnel (NOTES.md), so the end-to-end figure is tunnel-bound there (~15
MB/batch at 512^2 b1). On a real TPU VM the same transfer is PCIe-speed;
the host items/s line is the machine-independent pipeline capability.
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_disk_dataset(root, frames, src_w, src_h, seed=0):
    """CO3Dv2-shaped synthetic dataset at realistic source resolution
    (same layout as tests/test_data.make_synthetic_co3d, sized for perf)."""
    import gzip
    import json as _json

    import numpy as np
    from PIL import Image

    cat = os.path.join(root, "car")
    seq = "seq0"
    os.makedirs(os.path.join(cat, "set_lists"), exist_ok=True)
    os.makedirs(os.path.join(cat, seq, "images"), exist_ok=True)
    os.makedirs(os.path.join(cat, seq, "masks"), exist_ok=True)

    rng = np.random.default_rng(seed)
    set_lists = {"train": []}
    frame_annos = []
    bboxes = {}
    # one random base image, rolled per frame: keeps synthesis fast but
    # every JPEG byte-distinct so decode cost is honest
    base = rng.integers(0, 255, (src_h, src_w, 3), dtype=np.uint8)
    for i in range(frames):
        img_rel = f"car/{seq}/images/frame{i:06d}.jpg"
        mask_rel = f"car/{seq}/masks/frame{i:06d}.png"
        img = np.roll(base, 13 * i, axis=1)
        Image.fromarray(img).save(os.path.join(root, img_rel), quality=90)
        m = np.zeros((src_h, src_w), np.uint8)
        m[src_h // 4 : 3 * src_h // 4, src_w // 4 : 3 * src_w // 4] = 255
        Image.fromarray(m).save(os.path.join(root, mask_rel))
        theta = 2 * np.pi * i / frames
        c, s = np.cos(theta), np.sin(theta)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)
        frame_annos.append(
            {
                "sequence_name": seq,
                "frame_number": i,
                "viewpoint": {
                    "R": R.tolist(),
                    "T": [0.0, 0.0, 3.0],
                    "focal_length": [2.0, 2.0],
                    "principal_point": [0.0, 0.0],
                },
            }
        )
        set_lists["train"].append([seq, i, img_rel])
        bboxes[mask_rel] = [
            src_w // 4, src_h // 4, 3 * src_w // 4, 3 * src_h // 4,
        ]

    with open(
        os.path.join(cat, "set_lists/set_lists_fewview_dev.json"), "w"
    ) as f:
        _json.dump(set_lists, f)
    with gzip.open(os.path.join(cat, "sequence_annotations.jgz"), "wt") as f:
        _json.dump(
            [{"sequence_name": seq, "viewpoint_quality_score": 0.9}], f
        )
    with gzip.open(os.path.join(cat, "frame_annotations.jgz"), "wt") as f:
        _json.dump(frame_annos, f)
    with gzip.open(os.path.join(cat, "car_bbox.jgz"), "wt") as f:
        _json.dump(bboxes, f)
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default=None,
                    help="real CO3D root (default: synthesize)")
    ap.add_argument("--category", default="car")
    ap.add_argument("--img_size", type=int, default=512)
    ap.add_argument("--num_images", type=int, default=5,
                    help="1 target + N-1 reference views per item")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--src", default="1200x900", help="synthetic source WxH")
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--batches", type=int, default=16,
                    help="timed batches per config")
    ap.add_argument("--workers", default="0,1,2,4,8")
    ap.add_argument("--chip_img_per_min", type=float, default=157.0,
                    help="bench.py --train step rate to compare against")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (measures the host pipeline "
                    "without tunnel/device-transfer effects; JAX_PLATFORMS "
                    "env is ignored by the axon TPU plugin)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from custom_diffusion360_tpu.cli.sample import make_tokenizers
    from custom_diffusion360_tpu.data.co3d import (
        Co3dConfig,
        Co3dDataset,
        DataLoader,
    )

    root = args.data_root
    tmp = None
    if root is None:
        w, h = (int(x) for x in args.src.split("x"))
        tmp = tempfile.mkdtemp(prefix="cd360_loader_bench_")
        t0 = time.time()
        root = make_disk_dataset(tmp, args.frames, w, h)
        print(f"# synthesized {args.frames} frames {w}x{h} in "
              f"{time.time()-t0:.1f}s at {root}", file=sys.stderr)

    dcfg = Co3dConfig(
        root=root, category=args.category,
        img_size=args.img_size, num_images=args.num_images,
    )
    ds = Co3dDataset(dcfg)
    tok_clip, tok_open = make_tokenizers(None)

    # phase 1: raw per-item host cost (decode + crop + native resize), the
    # work one loader thread does — no collate, no device. Measured COLD
    # (frame cache disabled) so the decode cost is honest.
    import dataclasses as _dc

    ds_cold = Co3dDataset(_dc.replace(dcfg, cache_frames=0))
    rng = np.random.default_rng(0)
    n_items = min(len(ds), 12)
    _ = ds_cold.__getitem__(0, rng=np.random.default_rng(1))  # warm (native build)
    t0 = time.time()
    for i in range(n_items):
        ds_cold.__getitem__(i % len(ds_cold), rng=rng)
    dt = time.time() - t0
    item_s = n_items / dt
    print(json.dumps({
        "metric": f"host items/s Co3dDataset {args.img_size}^2 "
                  f"x{args.num_images} views (decode+crop+resize, cold)",
        "value": round(item_s, 2),
        "unit": "items/s",
        "vs_baseline": None,
    }))
    print(f"# one item = 1 target + {args.num_images-1} refs; "
          f"{1e3*dt/n_items:.0f} ms/item single-thread", file=sys.stderr)

    # phase 1b: same items through the decoded-frame LRU (Co3dConfig.
    # cache_frames, default-on): after the first epoch touches the concept
    # set, an item is selection + mask math only.
    rng = np.random.default_rng(0)
    for i in range(n_items):  # populate
        ds.__getitem__(i % len(ds), rng=rng)
    rng = np.random.default_rng(0)
    t0 = time.time()
    for i in range(n_items):
        ds.__getitem__(i % len(ds), rng=rng)
    dt_w = time.time() - t0
    warm_s = n_items / dt_w
    print(json.dumps({
        "metric": f"host items/s Co3dDataset {args.img_size}^2 "
                  f"x{args.num_images} views (decoded-frame cache, warm)",
        "value": round(warm_s, 2),
        "unit": "items/s",
        "vs_baseline": round(warm_s / item_s, 2),
    }))
    print(f"# warm {1e3*dt_w/n_items:.1f} ms/item = {warm_s/item_s:.1f}x "
          f"cold", file=sys.stderr)

    # phase 2: DataLoader end-to-end (threads + collate + device put)
    need_batch_s = args.chip_img_per_min / 60.0 / args.batch_size
    for nw in (int(x) for x in args.workers.split(",")):
        loader = DataLoader(
            ds, args.batch_size, tok_clip, tok_open, num_workers=nw, seed=1,
        )

        def batches():
            while True:
                yield from loader

        it = batches()
        b = next(it)  # warm: thread pool spin-up + first device puts
        np.asarray(b["image"])
        t0 = time.time()
        done = 0
        for b in it:
            np.asarray(b["image"])  # consume (forces the device array)
            done += 1
            if done >= args.batches:
                break
        dt = time.time() - t0
        rate = done / dt
        img_min = rate * args.batch_size * 60.0
        print(json.dumps({
            "metric": f"DataLoader batches/s num_workers={nw} "
                      f"(b{args.batch_size} {args.img_size}^2 incl. "
                      f"device transfer)",
            "value": round(rate, 3),
            "unit": "batches/s",
            "vs_baseline": round(rate / need_batch_s, 3),
        }))
        print(f"# = {img_min:.0f} train img/min fed "
              f"(chip wants {args.chip_img_per_min:.0f})", file=sys.stderr)

    if tmp is not None:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
