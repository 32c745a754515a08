"""LPIPS parity vs an inline torch re-derivation (random weights) + loss
wiring. Reference: sgm/modules/autoencoding/lpips/loss/lpips.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.models.lpips import (
    CHNS,
    VGG_SLICES,
    init_lpips_params,
    lpips_apply,
)

torch = pytest.importorskip("torch")


def torch_lpips(params, x, y):
    """Inline torch re-derivation of LPIPS.forward (lpips.py:46-65)."""
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(t):
        h = (t - shift) / scale
        out = []
        for si, slice_ids in enumerate(VGG_SLICES):
            if si > 0:
                h = F.max_pool2d(h, 2)
            for idx in slice_ids:
                w = torch.tensor(
                    np.transpose(np.asarray(params["vgg"][str(idx)]["w"]),
                                 (3, 2, 0, 1))
                )
                b = torch.tensor(np.asarray(params["vgg"][str(idx)]["b"]))
                h = F.relu(F.conv2d(h, w, b, padding=1))
            out.append(h)
        return out

    fx, fy = feats(x), feats(y)
    val = 0.0
    for k in range(5):
        nx = fx[k] / (fx[k].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        ny = fy[k] / (fy[k].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (nx - ny) ** 2
        head = torch.tensor(np.asarray(params["lins"][k])).view(1, -1, 1, 1)
        val = val + (d * head).sum(1, keepdim=True).mean([2, 3])
    return val.squeeze(1)


def test_lpips_matches_torch():
    params = init_lpips_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(lpips_apply(params, jnp.asarray(x), jnp.asarray(y)))
    ref = torch_lpips(
        params,
        torch.tensor(np.transpose(x, (0, 3, 1, 2))),
        torch.tensor(np.transpose(y, (0, 3, 1, 2))),
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)


def test_lpips_zero_for_identical():
    params = init_lpips_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
    assert float(lpips_apply(params, x, x)[0]) == pytest.approx(0.0, abs=1e-6)


def test_loss_type_lpips_wiring():
    from custom_diffusion360_tpu.diffusion.loss import (
        DiffusionLossConfig,
        compute_loss_terms,
    )

    params = init_lpips_params(jax.random.PRNGKey(0))
    cfg = DiffusionLossConfig(loss_type="lpips")
    out = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    w = jnp.ones((2, 1, 1, 1))
    terms = compute_loss_terms(
        out, [], [], [], tgt, tgt, w, None, jnp.ones((2, 32, 32, 1)),
        cfg=cfg, lpips_params=params,
    )
    assert terms["l2"].shape == (2,)
    assert np.isfinite(np.asarray(terms["l2"])).all()

    with pytest.raises(ValueError, match="lpips params"):
        compute_loss_terms(
            out, [], [], [], tgt, tgt, w, None, jnp.ones((2, 32, 32, 1)),
            cfg=cfg,
        )
    with pytest.raises(ValueError, match="3-channel"):
        compute_loss_terms(
            jnp.zeros((2, 8, 8, 4)), [], [], [], jnp.zeros((2, 8, 8, 4)),
            tgt, w, None, jnp.ones((2, 32, 32, 1)),
            cfg=cfg, lpips_params=params,
        )
