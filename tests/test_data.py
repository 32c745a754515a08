"""CO3D data pipeline tests against a synthetic on-disk dataset."""
import gzip
import json
import os
import os.path as osp

import numpy as np
import pytest

from custom_diffusion360_tpu.data.co3d import (
    Co3dConfig,
    Co3dDataset,
    DataLoader,
    collate,
    square_bbox,
    _dilate7,
)
from custom_diffusion360_tpu.data.tokenizer import make_test_tokenizer

N_FRAMES = 12
IMG_W, IMG_H = 80, 60


def make_synthetic_co3d(root):
    """Write a tiny CO3Dv2-shaped dataset (images, masks, jgz annotations,
    set lists, bboxes) under ``root``. Shared with the real-data CLI test."""
    from PIL import Image

    cat = root / "car"
    seq = "seq0"
    (cat / "set_lists").mkdir(parents=True)
    (cat / seq / "images").mkdir(parents=True)
    (cat / seq / "masks").mkdir(parents=True)

    rng = np.random.default_rng(0)
    set_lists = {"train": []}
    frame_annos = []
    bboxes = {}
    for i in range(N_FRAMES):
        img_rel = f"car/{seq}/images/frame{i:06d}.jpg"
        mask_rel = f"car/{seq}/masks/frame{i:06d}.png"
        img = (rng.uniform(0, 255, (IMG_H, IMG_W, 3))).astype(np.uint8)
        Image.fromarray(img).save(root / img_rel)
        m = np.zeros((IMG_H, IMG_W), np.uint8)
        m[20:40, 30:60] = 255
        Image.fromarray(m).save(root / mask_rel)
        theta = 2 * np.pi * i / N_FRAMES
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
        bboxes[mask_rel] = [30, 20, 60, 40]

    with open(cat / "set_lists/set_lists_fewview_dev.json", "w") as f:
        json.dump(set_lists, f)
    with gzip.open(cat / "sequence_annotations.jgz", "wt") as f:
        json.dump([{"sequence_name": seq, "viewpoint_quality_score": 0.9}], f)
    with gzip.open(cat / "frame_annotations.jgz", "wt") as f:
        json.dump(frame_annos, f)
    with gzip.open(cat / "car_bbox.jgz", "wt") as f:
        json.dump(bboxes, f)
    return str(root)


@pytest.fixture(scope="module")
def co3d_root(tmp_path_factory):
    return make_synthetic_co3d(tmp_path_factory.mktemp("co3d"))


def _cfg(co3d_root, **kw):
    kw.setdefault("root", co3d_root)
    kw.setdefault("img_size", 64)
    kw.setdefault("num_images", 3)
    kw.setdefault("repeat", 2)
    return Co3dConfig(**kw)


class TestHelpers:
    def test_square_bbox(self):
        b = square_bbox([10, 20, 30, 60])
        assert b[2] - b[0] == b[3] - b[1]
        np.testing.assert_allclose((b[:2] + b[2:]) / 2, [20, 40])

    def test_dilate(self):
        m = np.zeros((9, 9), np.float32)
        m[4, 4] = 1
        d = _dilate7(m)
        assert d[1, 1] == 1 and d[7, 7] == 1 and d[0, 0] == 0


class TestDataset:
    def test_init_and_len(self, co3d_root):
        ds = Co3dDataset(_cfg(co3d_root))
        assert len(ds.sequence_list) == 1
        assert ds.valid_ids == [0, 2, 4, 6, 8, 10]
        assert len(ds) == 6 * 2

    def test_item_shapes(self, co3d_root):
        ds = Co3dDataset(_cfg(co3d_root))
        it = ds.__getitem__(0, rng=np.random.default_rng(1))
        assert it["image"].shape == (64, 64, 3)
        assert it["image_ref"].shape == (2, 64, 64, 3)
        assert it["mask"].shape == (8, 8, 1)
        assert it["mask_ref"].shape == (2, 8, 8, 1)
        assert it["opacity"].shape == (8, 8, 1)
        assert it["cams"].R.shape == (3, 3, 3)
        assert -1.0 <= it["image"].min() and it["image"].max() <= 1.0
        assert "<new1>" in it["txt"] or it["txt"] == ""

    def test_target_id_deterministic(self, co3d_root):
        ds = Co3dDataset(_cfg(co3d_root))
        ids = ds.select_ids(3, np.random.default_rng(0))
        assert ids[0] == (3 * 2) % N_FRAMES
        assert len(set(ids)) == len(ids)
        # refs drawn from valid ids
        assert all(i in ds.valid_ids or i == ids[0] for i in ids)

    def test_frame_cache_transparent(self, co3d_root):
        """cache_frames (default-on LRU over decoded frames) must be
        invisible: identical items vs cache_frames=0, warm hits included,
        and no aliasing — mutating one item's arrays must not leak into a
        later item served from the cache."""
        import dataclasses

        cfg = _cfg(co3d_root, drop_ratio=0.0, drop_txt=0.0)
        ds = Co3dDataset(cfg)
        ds_off = Co3dDataset(dataclasses.replace(cfg, cache_frames=0))
        for idx in (0, 1, 0, 1):  # revisits hit the cache
            a = ds.__getitem__(idx, rng=np.random.default_rng(idx))
            b = ds_off.__getitem__(idx, rng=np.random.default_rng(idx))
            for k in ("image", "image_ref", "mask", "mask_ref", "opacity",
                      "original_size"):
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
            a["image"][:] = 99.0  # must not poison the cache
        assert len(ds._cache) > 0
        c = ds.__getitem__(0, rng=np.random.default_rng(0))
        assert float(c["image"].max()) <= 1.0

    def test_onlyref_order(self, co3d_root):
        ds = Co3dDataset(_cfg(co3d_root, onlyref=True, addlen=True, repeat=1,
                              drop_ratio=0.0, drop_txt=0.0))
        ids = ds.select_ids(1, np.random.default_rng(0))
        assert ids[-1] == 2  # target last in onlyref mode
        # last dataset item zeroes the image (the uncond capture row)
        it = ds.__getitem__(len(ds) - 1, rng=np.random.default_rng(1))
        np.testing.assert_allclose(it["image"], 0.0)

    def test_test_split_complement(self, co3d_root):
        ds = Co3dDataset(_cfg(co3d_root, split="test"))
        assert ds.valid_ids == [1, 3, 5, 7, 9, 11]

    def test_cameras_normalized(self, co3d_root):
        ds = Co3dDataset(_cfg(co3d_root))
        T = np.stack([a["T"] for a in ds.sequences["seq0"]])
        # normalization scales translations to max dist 1-ish
        assert np.isfinite(T).all()
        assert np.abs(T).max() < 10


class TestCollate:
    def test_batch_contract(self, co3d_root):
        ds = Co3dDataset(_cfg(co3d_root, drop_ratio=0.0, drop_txt=0.0))
        tok = make_test_tokenizer(
            ["photo", "of", "a", "car"],
            additional_special_tokens=("<new1>",),
            context_length=16,
        )
        dl = DataLoader(ds, batch_size=2, tokenizer_clip=tok, tokenizer_open=tok)
        batch = next(iter(dl))
        assert batch["image"].shape == (2, 64, 64, 3)
        assert batch["image_ref"].shape == (2, 2, 64, 64, 3)
        assert batch["cams"].R.shape == (2, 3, 3, 3)
        assert batch["tokens_clip"].shape == (2, 16)
        assert batch["tokens_clip_ref"].shape == (4, 16)
        assert batch["original_size_ref"].shape == (4, 2)
        assert batch["drop_im"].shape == (2,)

    def test_feeds_engine(self, co3d_root):
        """A real collated batch must run through Engine.training_loss."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from custom_diffusion360_tpu.engine import Engine
        from tests.test_engine import TINY_CFG

        ds = Co3dDataset(_cfg(co3d_root, num_images=3, drop_ratio=0.0))
        tok = make_test_tokenizer(
            ["photo", "of", "a", "car"],
            additional_special_tokens=("<new1>",),
            context_length=16,
        )
        # size the text towers' vocab to the tokenizer
        cond_cfg = dataclasses.replace(
            TINY_CFG.conditioner,
            clip_l=dataclasses.replace(
                TINY_CFG.conditioner.clip_l, vocab_size=tok.base_vocab_size
            ),
            open_clip=dataclasses.replace(
                TINY_CFG.conditioner.open_clip, vocab_size=tok.base_vocab_size
            ),
        )
        TINY = dataclasses.replace(TINY_CFG, conditioner=cond_cfg)
        dl = DataLoader(ds, batch_size=1, tokenizer_clip=tok, tokenizer_open=tok)
        batch = next(iter(dl))
        batch.pop("txt"), batch.pop("txt_ref")

        eng = Engine(TINY)
        params = eng.init_params(jax.random.PRNGKey(0))
        loss, metrics = eng.training_loss(params, batch, jax.random.PRNGKey(1), 1)
        assert np.isfinite(float(loss))


class TestPrefetchLoader:
    def test_workers_match_synchronous(self, co3d_root):
        """The threaded prefetch loader must produce the exact same batch
        stream as the synchronous path (per-item PRNGs are derived from
        (seed, epoch, position), not from worker scheduling)."""
        ds = Co3dDataset(_cfg(co3d_root))
        tok = make_test_tokenizer(
            ["photo", "of", "a", "car"],
            additional_special_tokens=("<new1>",),
            context_length=16,
        )

        def run(num_workers):
            dl = DataLoader(
                ds, batch_size=2, tokenizer_clip=tok, tokenizer_open=tok,
                seed=7, num_workers=num_workers,
            )
            return [b for _, b in zip(range(3), iter(dl))]

        sync = run(0)
        thr = run(3)
        assert len(sync) == len(thr)
        for a, b in zip(sync, thr):
            for k in ("image", "image_ref", "drop_im", "tokens_clip"):
                np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    def test_epochs_differ(self, co3d_root):
        ds = Co3dDataset(_cfg(co3d_root))
        dl = DataLoader(ds, batch_size=2, seed=7, num_workers=0)
        e1 = [b["image"] for b in dl]
        e2 = [b["image"] for b in dl]
        assert any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(e1, e2)
        )
