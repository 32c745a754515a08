"""PatchGAN discriminator / ActNorm / GAN-loss parity vs torch.

Reference: sgm/modules/autoencoding/lpips/model/model.py,
lpips/util.py:105-187, lpips/vqperceptual.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.models.discriminator import (
    actnorm_apply,
    actnorm_init_from_batch,
    discriminator_apply,
    hinge_d_loss,
    init_discriminator_params,
    load_discriminator_torch,
    vanilla_d_loss,
)

torch = pytest.importorskip("torch")


def _torch_discriminator(input_nc=3, ndf=64, n_layers=3):
    """Inline re-derivation of NLayerDiscriminator (model.py:17-88),
    BatchNorm flavor (use_bias=False on normed convs)."""
    import torch.nn as nn

    kw, padw = 4, 1
    seq = [nn.Conv2d(input_nc, ndf, kw, 2, padw), nn.LeakyReLU(0.2, True)]
    nf_mult_prev = 1
    for n in range(1, n_layers):
        nf_mult = min(2**n, 8)
        seq += [nn.Conv2d(ndf * nf_mult_prev, ndf * nf_mult, kw, 2, padw,
                          bias=False),
                nn.BatchNorm2d(ndf * nf_mult), nn.LeakyReLU(0.2, True)]
        nf_mult_prev = nf_mult
    nf_mult = min(2**n_layers, 8)
    seq += [nn.Conv2d(ndf * nf_mult_prev, ndf * nf_mult, kw, 1, padw,
                      bias=False),
            nn.BatchNorm2d(ndf * nf_mult), nn.LeakyReLU(0.2, True)]
    seq += [nn.Conv2d(ndf * nf_mult, 1, kw, 1, padw)]

    class D(nn.Module):
        def __init__(self):
            super().__init__()
            self.main = nn.Sequential(*seq)

        def forward(self, x):
            return self.main(x)

    return D()


def test_discriminator_matches_torch():
    torch.manual_seed(0)
    model = _torch_discriminator(ndf=8, n_layers=3).train()
    params = load_discriminator_torch(model.state_dict(), n_layers=3)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    ours = np.asarray(discriminator_apply(params, jnp.asarray(x)))
    with torch.no_grad():
        ref = model(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    # 32 -> conv_in s2 16 -> s2 8 -> s2 4 -> s1(4x4, p1) 3 -> head 2
    assert ours.shape == (2, 2, 2, 1) and ref.shape == (2, 1, 2, 2)
    np.testing.assert_allclose(
        ours[..., 0], ref[:, 0], rtol=1e-3, atol=1e-4
    )


def test_init_discriminator_shapes_match_torch_layout():
    """Random init produces the same pytree structure the importer yields."""
    torch.manual_seed(1)
    model = _torch_discriminator(ndf=8, n_layers=3)
    imported = load_discriminator_torch(model.state_dict(), n_layers=3)
    ours = init_discriminator_params(jax.random.PRNGKey(0), ndf=8, n_layers=3)
    assert jax.tree.structure(ours) == jax.tree.structure(imported)
    for a, b in zip(jax.tree.leaves(ours), jax.tree.leaves(imported)):
        assert a.shape == b.shape


def test_actnorm_init_and_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(3.0, 2.0, (4, 8, 8, 5)), jnp.float32)
    p = actnorm_init_from_batch(x)
    h = actnorm_apply(p, x)
    hn = np.asarray(h).reshape(-1, 5)
    np.testing.assert_allclose(hn.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(hn.std(0, ddof=1), 1.0, atol=1e-3)

    back = actnorm_apply(p, h, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-4,
                               atol=1e-5)

    h2, ld = actnorm_apply(p, x, logdet=True)
    np.testing.assert_array_equal(np.asarray(h2), np.asarray(h))
    want = 64 * np.sum(np.log(np.abs(np.asarray(p["scale"]))))
    np.testing.assert_allclose(np.asarray(ld), want, rtol=1e-5)


def test_gan_losses_match_torch():
    rng = np.random.default_rng(3)
    lr = rng.normal(size=(2, 4, 4, 1)).astype(np.float32)
    lf = rng.normal(size=(2, 4, 4, 1)).astype(np.float32)
    tr, tf = torch.tensor(lr), torch.tensor(lf)

    ref_h = 0.5 * (torch.relu(1.0 - tr).mean() + torch.relu(1.0 + tf).mean())
    assert np.allclose(float(hinge_d_loss(jnp.asarray(lr), jnp.asarray(lf))),
                       ref_h.item(), rtol=1e-6)
    ref_v = 0.5 * (torch.nn.functional.softplus(-tr).mean()
                   + torch.nn.functional.softplus(tf).mean())
    assert np.allclose(
        float(vanilla_d_loss(jnp.asarray(lr), jnp.asarray(lf))),
        ref_v.item(), rtol=1e-6,
    )
