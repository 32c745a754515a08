"""Training observability: metrics meter + image logging.

Reference: CUDACallback's epoch-time/peak-memory stats (main.py:565-585) and
ImageLogger's periodic sample grids (main.py:377-544, diffusion.py:474-557).
TPU equivalents: step-time / images-per-min meter with device HBM stats, CSV
metrics file, and a PNG grid writer for inputs/samples/volume-rendered RGB.
"""
from __future__ import annotations

import csv
import os
import time
from typing import Optional

import numpy as np


class MetricsLogger:
    """Rolling step-time + throughput meter; writes metrics.csv."""

    def __init__(self, out_dir: str, images_per_step: int, window: int = 50,
                 wandb_project: Optional[str] = None, run_name: str = ""):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.csv")
        self.images_per_step = images_per_step
        self.window = window
        self.times: list = []
        self._file = None
        self._writer = None
        self._last = None
        self._wandb = None
        if wandb_project:
            # optional mirror (reference WandbLogger, main.py:843-875);
            # wandb is not a hard dependency
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=wandb_project, name=run_name or None,
                           dir=out_dir)
            except ImportError as e:
                raise RuntimeError(
                    "--wandb requires the wandb package (pip install wandb)"
                ) from e

    def tic(self):
        self._last = time.time()

    def toc(self):
        if self._last is None:
            return 0.0
        dt = time.time() - self._last
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def images_per_min(self):
        if not self.times:
            return 0.0
        return 60.0 * self.images_per_step / (sum(self.times) / len(self.times))

    @staticmethod
    def device_memory_stats():
        """Per-device HBM stats (replaces torch.cuda.max_memory_allocated)."""
        import jax

        out = {}
        for d in jax.devices():
            try:
                s = d.memory_stats()
                out[str(d)] = {
                    "bytes_in_use": s.get("bytes_in_use"),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                }
            except Exception:
                out[str(d)] = {}
        return out

    def log(self, step: int, metrics: dict):
        row = {"step": step, "images_per_min": round(self.images_per_min, 2)}
        row.update({k: float(v) for k, v in metrics.items()})
        if self._writer is None or any(
            k not in self._writer.fieldnames for k in row
        ):
            # new metric keys (e.g. the val_* rows) or a resumed run:
            # rewrite the WHOLE file with one union header so earlier rows
            # keep a consistent column layout (no mid-file second header)
            fields = list(row) if self._writer is None else list(
                dict.fromkeys(list(self._writer.fieldnames) + list(row))
            )
            existing = []
            if self._file is not None:
                self._file.close()
            if os.path.exists(self.path) and os.path.getsize(self.path):
                with open(self.path, newline="") as f:
                    reader = csv.DictReader(f)
                    if reader.fieldnames:
                        fields = list(dict.fromkeys(
                            list(reader.fieldnames) + fields
                        ))
                        # skip stray header rows from pre-fix files
                        existing = [r for r in reader
                                    if r.get("step") != "step"]
            self._file = open(self.path, "w", newline="")
            self._writer = csv.DictWriter(
                self._file, fieldnames=fields, restval="", extrasaction="ignore"
            )
            self._writer.writeheader()
            for r in existing:
                self._writer.writerow(
                    {k: v for k, v in r.items() if k in fields and v}
                )
        self._writer.writerow(row)
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log(row, step=step)
        return row

    def log_images(self, step: int, name: str, path: str):
        """Mirror an already-written image grid to wandb."""
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(path)}, step=step)


def render_text_image(texts, size: int = 256):
    """Render conditioning prompts as an image row (the reference's
    log_txt_as_img, sgm/util.py:68-95). Returns (N, size, size, 3) in
    [-1, 1]."""
    from PIL import Image, ImageDraw

    out = []
    for txt in texts:
        img = Image.new("RGB", (size, size), "white")
        draw = ImageDraw.Draw(img)
        nc = max(int(size / 8), 1)
        lines = "\n".join(
            txt[i : i + nc] for i in range(0, len(txt), nc)
        )
        draw.text((4, 4), lines, fill="black")
        out.append(np.asarray(img, np.float32) / 127.5 - 1.0)
    return np.stack(out)


def save_image_grid(path: str, images, nrow: int = 4):
    """images: (N, H, W, 3) in [-1, 1] -> one PNG grid (ImageLogger's
    torchvision make_grid equivalent)."""
    from PIL import Image

    arr = np.asarray(images, np.float32)
    arr = np.clip((arr + 1.0) * 127.5, 0, 255).astype(np.uint8)
    n, h, w, c = arr.shape
    ncol = min(nrow, n)
    nrows = -(-n // ncol)
    grid = np.zeros((nrows * h, ncol * w, c), np.uint8)
    for i in range(n):
        r, cl = divmod(i, ncol)
        grid[r * h : (r + 1) * h, cl * w : (cl + 1) * w] = arr[i]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid).save(path)
    return path
