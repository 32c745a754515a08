"""EMA, LR schedules, orbax checkpoints, metrics/image logging."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.train import (
    EmaState,
    MetricsLogger,
    ema_init,
    ema_swap,
    ema_update,
    lambda_linear,
    lambda_warmup_cosine,
    lambda_warmup_cosine2,
    latest_checkpoint,
    restore_train_state,
    save_train_state,
    save_image_grid,
)
from custom_diffusion360_tpu.train.trainer import TrainState


class TestEma:
    def test_update_and_swap(self):
        params = {"a": jnp.zeros(3), "b": jnp.ones(2)}
        mask = {"a": True, "b": False}
        st = ema_init(params, mask)
        new_params = {"a": jnp.ones(3) * 10, "b": jnp.ones(2) * 5}
        st = ema_update(st, new_params, decay=0.5)
        # decay schedule min(0.5, 2/11) = 2/11 -> shadow = 0 - (1-2/11)*(0-10)
        expect = (1 - 2 / 11) * 10
        np.testing.assert_allclose(np.asarray(st.shadow["a"]), expect, rtol=1e-5)
        assert st.shadow["b"] is None
        merged = ema_swap(new_params, st)
        np.testing.assert_allclose(np.asarray(merged["a"]), expect, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(merged["b"]), 5.0)

    def test_init_survives_donated_params(self):
        # The train CLI donates the carried state into the jitted step
        # (train.py donate_argnums=(0,)), which deletes the original param
        # buffers. The shadow tree must be copies, not aliases, or the
        # first ema_update after step 0 sees dead arrays. Donation is a
        # no-op on CPU, so simulate the deletion directly.
        params = {"a": jnp.zeros(3), "b": jnp.ones(2)}
        st = ema_init(params, {"a": True, "b": False})
        params["a"].delete()
        new_params = {"a": jnp.ones(3), "b": jnp.ones(2)}
        st = ema_update(st, new_params, decay=0.5)  # must not raise
        assert np.isfinite(np.asarray(st.shadow["a"])).all()


class TestSchedules:
    def test_warmup_cosine(self):
        s = lambda_warmup_cosine(10, 0.0, 1.0, 0.1, 100)
        assert float(s(0)) == pytest.approx(0.1)
        assert float(s(10)) == pytest.approx(1.0, abs=1e-5)
        assert float(s(100)) == pytest.approx(0.0, abs=1e-5)
        assert float(s(55)) > float(s(90))

    def test_linear_cycles(self):
        s = lambda_linear([5, 5], [0.1, 0.1], [1.0, 1.0], [0.0, 0.0], [50, 50])
        assert float(s(0)) == pytest.approx(0.0)
        # at n == warmup the linear branch applies (lr_scheduler.py:92-96)
        assert float(s(5)) == pytest.approx(0.1 + 0.9 * 45 / 50, abs=1e-5)
        assert float(s(4)) == pytest.approx(0.8, abs=1e-5)  # warmup ramp
        # second cycle warms up again from f_start
        assert float(s(50)) == pytest.approx(0.0, abs=1e-5)
        assert float(s(54)) == pytest.approx(0.8, abs=1e-5)

    def test_warmup_cosine2(self):
        s = lambda_warmup_cosine2([5], [0.0], [1.0], [0.0], [100])
        assert float(s(5)) == pytest.approx(1.0, abs=1e-5)
        assert float(s(100)) == pytest.approx(0.0, abs=1e-3)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        state = TrainState(
            params={"w": jnp.arange(4.0)},
            opt_state={"m": jnp.ones(4)},
            step=jnp.asarray(7, jnp.int32),
        )
        d = str(tmp_path / "ckpts")
        p = save_train_state(d, state)
        assert latest_checkpoint(d) == p
        blank = TrainState(
            params={"w": jnp.zeros(4)},
            opt_state={"m": jnp.zeros(4)},
            step=jnp.asarray(0, jnp.int32),
        )
        restored = restore_train_state(p, blank)
        np.testing.assert_allclose(np.asarray(restored.params["w"]), np.arange(4.0))
        assert int(restored.step) == 7

    def test_latest_picks_max(self, tmp_path):
        state = TrainState({"w": jnp.zeros(1)}, {}, jnp.asarray(0, jnp.int32))
        save_train_state(str(tmp_path), state, step=5)
        save_train_state(str(tmp_path), state, step=20)
        assert latest_checkpoint(str(tmp_path)).endswith("step_00000020")


class TestLogging:
    def test_metrics_csv(self, tmp_path):
        m = MetricsLogger(str(tmp_path), images_per_step=4)
        m.tic()
        m.toc()
        row = m.log(0, {"loss": jnp.asarray(1.5)})
        assert row["loss"] == 1.5
        assert os.path.exists(m.path)
        stats = m.device_memory_stats()
        assert isinstance(stats, dict) and stats

    def test_metrics_csv_resume_and_schema_growth(self, tmp_path):
        """Resume + new metric keys keep ONE header and a consistent column
        layout (no mid-file second header)."""
        import csv

        m = MetricsLogger(str(tmp_path), images_per_step=1)
        m.tic(); m.toc()
        m.log(0, {"loss": 1.0})
        m.log(1, {"loss": 2.0, "val_loss": 0.5})  # schema grows
        m._file.close()

        m2 = MetricsLogger(str(tmp_path), images_per_step=1)  # resume
        m2.tic(); m2.toc()
        m2.log(2, {"loss": 3.0})
        m2._file.close()

        with open(m.path, newline="") as f:
            rows = list(csv.reader(f))
        headers = [r for r in rows if r and r[0] == "step"]
        assert len(headers) == 1, "duplicate header rows"
        with open(m.path, newline="") as f:
            data = list(csv.DictReader(f))
        assert [r["step"] for r in data] == ["0", "1", "2"]
        assert data[1]["val_loss"] == "0.5"
        assert data[0]["val_loss"] == "" and data[2]["val_loss"] == ""

    def test_image_grid(self, tmp_path):
        imgs = np.zeros((5, 8, 8, 3), np.float32)
        p = save_image_grid(str(tmp_path / "g.png"), imgs, nrow=2)
        from PIL import Image

        im = Image.open(p)
        assert im.size == (16, 24)  # 2 cols x 3 rows of 8px
