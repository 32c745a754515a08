"""Config override system + cameras npz I/O."""
import numpy as np
import pytest

from custom_diffusion360_tpu.engine import EngineConfig
from custom_diffusion360_tpu.geometry.cameras import Cameras
from custom_diffusion360_tpu.io.cameras_io import load_cameras_npz, save_cameras_npz
from custom_diffusion360_tpu.utils.config import (
    apply_overrides,
    config_to_dict,
    load_config,
)


class TestConfig:
    def test_dot_override(self):
        cfg = apply_overrides(EngineConfig(), ["unet.num_samples=16"])
        assert cfg.unet.num_samples == 16

    def test_tuple_coercion(self):
        cfg = apply_overrides(EngineConfig(), ["unet.channel_mult=[1, 2]"])
        assert cfg.unet.channel_mult == (1, 2)

    def test_unknown_field_raises(self):
        with pytest.raises(KeyError):
            apply_overrides(EngineConfig(), ["unet.nonexistent=3"])

    def test_yaml_roundtrip(self, tmp_path):
        import yaml

        p = tmp_path / "c.yaml"
        p.write_text(yaml.safe_dump({"unet": {"num_freqs": 8}, "num_sample_steps": 10}))
        cfg = load_config(EngineConfig(), str(p), ["loss.loss_fg_lambda=3.5"])
        assert cfg.unet.num_freqs == 8
        assert cfg.num_sample_steps == 10
        assert cfg.loss.loss_fg_lambda == 3.5

    def test_reference_yaml_loads(self):
        cfg = load_config(EngineConfig(), "configs/train_co3d_concept.yaml")
        assert cfg.unet.image_cross_blocks == (0, 2, 4, 6, 8, 10)
        assert cfg.loss.loss_rgb_lambda == 5.0

    def test_to_dict(self):
        d = config_to_dict(EngineConfig())
        assert d["unet"]["model_channels"] == 320
        assert isinstance(d["unet"]["channel_mult"], list)


class TestCamerasIO:
    def test_npz_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        cams = Cameras.create(
            R=rng.normal(size=(5, 3, 3)).astype(np.float32),
            T=rng.normal(size=(5, 3)).astype(np.float32),
            focal_length=2.0,
            principal_point=0.0,
        )
        p = str(tmp_path / "cams.npz")
        save_cameras_npz(p, train=cams, val=cams[:2])
        loaded = load_cameras_npz(p)
        np.testing.assert_allclose(np.asarray(loaded["train"].R), np.asarray(cams.R))
        assert loaded["val"].batch_shape == (2,)
