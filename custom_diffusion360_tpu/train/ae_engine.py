"""AutoencodingEngine adversarial trainer: the two-optimizer (AE +
discriminator) training step of the reference's generic autoencoder.

Reference: ``sgm/models/autoencoder.py:182-269`` — ``AutoencodingEngine``
alternates two optimizers over the same batch (Lightning runs
``training_step`` once per ``optimizer_idx``): idx 0 updates
encoder+decoder+regularizer+loss-owned AE params against a reconstruction +
regularization + adversarial generator loss, idx 1 updates the
discriminator. The fork ships no concrete loss class (its ``loss_config``
path is dead upstream), so the loss here is the standard taming-transformers
``LPIPSWithDiscriminator`` recipe its ingredients imply —
``hinge_d_loss``/``vanilla_d_loss`` from
``sgm/modules/autoencoding/lpips/vqperceptual.py:5-19``, the PatchGAN
discriminator, LPIPS perceptual term, learnable ``logvar`` NLL scaling, and
the last-layer adaptive generator weight
(``d_weight = ||∂nll/∂w_last|| / (||∂g/∂w_last|| + 1e-4)``).

TPU-native design (not a Lightning port):

* one jitted functional step runs BOTH optimizer sub-steps — grads of the AE
  loss w.r.t. AE params (discriminator frozen via the loss closure) then
  grads of the d-loss w.r.t. disc params (reconstruction stop-gradiented) —
  equivalent to Lightning's per-batch optimizer_idx sweep without host
  round-trips;
* the adaptive weight's two last-layer gradients come from one decode
  forward plus two ``jax.vjp`` pullbacks that only depend on the final
  ``conv_out`` kernel, so XLA prunes the backward to that conv's transpose;
* ``disc_start`` gating is a ``jnp.where`` on the step counter, keeping the
  step shape-static and jit-stable across the gate;
* everything is pure pytree-in/pytree-out, so the step composes with
  ``jax.jit`` over a data-parallel ``Mesh`` exactly like the main trainer.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..models.discriminator import (
    discriminator_apply,
    hinge_d_loss,
    init_discriminator_params,
    vanilla_d_loss,
)
from ..models.lpips import init_lpips_params, lpips_apply
from ..models.regularizers import diagonal_gaussian_regularizer
from ..models.vae import VAEConfig, init_vae_params, vae_decode, vae_encode


@dataclasses.dataclass(frozen=True)
class AEEngineConfig:
    """Knobs of AutoencodingEngine + the taming loss it instantiates.

    ``lr``/``lr_g_factor`` mirror ``configure_optimizers``
    (autoencoder.py:254-269): the AE optimizer runs at
    ``lr_g_factor * lr``, the discriminator at ``lr``.
    """

    vae: VAEConfig = VAEConfig()
    lr: float = 4.5e-6
    lr_g_factor: float = 1.0
    # loss knobs (taming LPIPSWithDiscriminator defaults)
    kl_weight: float = 1e-6
    pixel_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_weight: float = 0.5
    disc_factor: float = 1.0
    disc_start: int = 0
    disc_loss: str = "hinge"  # or "vanilla"
    disc_n_layers: int = 3
    disc_ndf: int = 64
    use_actnorm: bool = False
    logvar_init: float = 0.0
    # LPIPS needs 3-channel inputs; disable for toy channel counts
    use_lpips: bool = True


def init_ae_engine(key, cfg: AEEngineConfig = AEEngineConfig()):
    """Build the full param tree: AE side (encoder/decoder/quant convs plus
    the loss-owned learnable ``logvar`` — ``get_trainable_autoencoder_params``
    includes loss-owned params, autoencoder.py:150-157) and the
    discriminator side (``get_trainable_parameters`` of the loss,
    autoencoder.py:159-161). LPIPS weights ride along frozen."""
    k_vae, k_disc, k_lpips = jax.random.split(key, 3)
    ae = dict(init_vae_params(k_vae, cfg.vae))
    ae["logvar"] = jnp.full((), cfg.logvar_init, jnp.float32)
    disc = init_discriminator_params(
        k_disc,
        input_nc=cfg.vae.out_ch,
        ndf=cfg.disc_ndf,
        n_layers=cfg.disc_n_layers,
        use_actnorm=cfg.use_actnorm,
    )
    lpips = init_lpips_params(k_lpips) if cfg.use_lpips else None
    return {"ae": ae, "disc": disc, "lpips": lpips}


def ae_forward(ae_params, x, key, cfg: AEEngineConfig):
    """``AutoencodingEngine.forward`` (autoencoder.py:177-180): encode →
    KL-regularize (posterior sample) → decode."""
    moments = vae_encode(ae_params, x, cfg.vae)
    z, reg_log = diagonal_gaussian_regularizer(moments, key=key, sample=True)
    xrec = vae_decode(ae_params, z, cfg.vae)
    return z, xrec, reg_log


def _rec_nll(ae_params, lpips_params, x, xrec, cfg: AEEngineConfig):
    """Pixel L1 + LPIPS, scaled by the learnable logvar (taming's
    ``nll_loss = rec / exp(logvar) + logvar``)."""
    rec = cfg.pixel_weight * jnp.abs(
        x.astype(jnp.float32) - xrec.astype(jnp.float32)
    )
    if cfg.use_lpips and cfg.perceptual_weight > 0 and lpips_params is not None:
        p = lpips_apply(lpips_params, xrec, x)
        rec = rec + cfg.perceptual_weight * p.reshape(p.shape[0], 1, 1, 1)
    logvar = ae_params["logvar"]
    nll = rec / jnp.exp(logvar) + logvar
    return jnp.mean(nll), jnp.mean(rec)

def _adaptive_weight(ae_params, lpips_params, z, x, key_dummy,
                     cfg: AEEngineConfig, disc_params):
    """Taming's ``calculate_adaptive_weight``: ratio of last-layer gradient
    norms of the NLL and generator losses, clipped to [0, 1e4], times
    ``disc_weight``. Both gradients flow only through the decoder's final
    ``conv_out`` kernel, so the two vjp pullbacks below reduce to that
    conv's transpose."""
    w_last = ae_params["decoder"]["conv_out"]["w"]

    def decode_of_w(w):
        p = dict(ae_params)
        dec = dict(p["decoder"])
        co = dict(dec["conv_out"])
        co["w"] = w
        dec["conv_out"] = co
        p["decoder"] = dec
        return vae_decode(p, z, cfg.vae)

    xrec, pullback = jax.vjp(decode_of_w, w_last)
    nll_cot = jax.grad(
        lambda xr: _rec_nll(ae_params, lpips_params, x, xr, cfg)[0]
    )(xrec)
    g_cot = jax.grad(
        lambda xr: -jnp.mean(
            discriminator_apply(
                disc_params, xr, n_layers=cfg.disc_n_layers,
                use_actnorm=cfg.use_actnorm,
            ).astype(jnp.float32)
        )
    )(xrec)
    (g_nll,) = pullback(nll_cot)
    (g_g,) = pullback(g_cot)
    d_weight = jnp.linalg.norm(g_nll.reshape(-1)) / (
        jnp.linalg.norm(g_g.reshape(-1)) + 1e-4
    )
    return jnp.clip(d_weight, 0.0, 1e4) * cfg.disc_weight


def ae_loss(ae_params, disc_params, lpips_params, x, key, step,
            cfg: AEEngineConfig):
    """optimizer_idx == 0 branch of ``training_step``
    (autoencoder.py:182-199): NLL + KL + adaptive-weight generator loss."""
    z, xrec, reg_log = ae_forward(ae_params, x, key, cfg)
    nll, rec = _rec_nll(ae_params, lpips_params, x, xrec, cfg)
    kl = reg_log["kl_loss"]
    logits_fake = discriminator_apply(
        disc_params, xrec, n_layers=cfg.disc_n_layers,
        use_actnorm=cfg.use_actnorm,
    )
    g_loss = -jnp.mean(logits_fake.astype(jnp.float32))
    d_weight = jax.lax.stop_gradient(
        _adaptive_weight(ae_params, lpips_params, z, x, key, cfg, disc_params)
    )
    disc_factor = jnp.where(step >= cfg.disc_start, cfg.disc_factor, 0.0)
    loss = nll + cfg.kl_weight * kl + d_weight * disc_factor * g_loss
    logs = {
        "train/total_loss": loss,
        "train/rec_loss": rec,
        "train/nll_loss": nll,
        "train/kl_loss": kl,
        "train/g_loss": g_loss,
        "train/d_weight": d_weight,
        "train/logvar": ae_params["logvar"],
    }
    return loss, (xrec, logs)


def disc_loss(disc_params, ae_params, x, xrec, step, cfg: AEEngineConfig):
    """optimizer_idx == 1 branch (autoencoder.py:201-216): hinge or vanilla
    d-loss on real vs stop-gradiented reconstructions
    (vqperceptual.py:5-19)."""
    logits_real = discriminator_apply(
        disc_params, x, n_layers=cfg.disc_n_layers, use_actnorm=cfg.use_actnorm
    ).astype(jnp.float32)
    logits_fake = discriminator_apply(
        disc_params, jax.lax.stop_gradient(xrec),
        n_layers=cfg.disc_n_layers, use_actnorm=cfg.use_actnorm,
    ).astype(jnp.float32)
    fn: Callable = hinge_d_loss if cfg.disc_loss == "hinge" else vanilla_d_loss
    disc_factor = jnp.where(step >= cfg.disc_start, cfg.disc_factor, 0.0)
    d = disc_factor * fn(logits_real, logits_fake)
    return d, {
        "train/disc_loss": d,
        "train/logits_real": jnp.mean(logits_real),
        "train/logits_fake": jnp.mean(logits_fake),
    }


@dataclasses.dataclass
class AEEngineState:
    params: Any
    opt_ae: Any
    opt_disc: Any
    step: Any


class AEEngine:
    """Functional two-optimizer trainer. ``train_step`` is pure — jit it
    (optionally with ``x`` sharded over a data mesh; grads reduce via the
    XLA-inserted psum like the main trainer)."""

    def __init__(self, cfg: AEEngineConfig = AEEngineConfig()):
        self.cfg = cfg
        # configure_optimizers (autoencoder.py:254-269): default Adam, AE lr
        # scaled by lr_g_factor.
        self.tx_ae = optax.adam(cfg.lr_g_factor * cfg.lr)
        self.tx_disc = optax.adam(cfg.lr)

    def init_state(self, key) -> AEEngineState:
        params = init_ae_engine(key, self.cfg)
        return AEEngineState(
            params=params,
            opt_ae=self.tx_ae.init(params["ae"]),
            opt_disc=self.tx_disc.init(params["disc"]),
            step=jnp.zeros((), jnp.int32),
        )

    def train_step(self, state: AEEngineState, x, key):
        """Both optimizer sub-steps on one batch (Lightning sweeps
        optimizer_idx 0 then 1 over the same batch)."""
        cfg = self.cfg
        params = state.params
        (loss_ae, (xrec, logs)), grads_ae = jax.value_and_grad(
            ae_loss, has_aux=True
        )(params["ae"], params["disc"], params["lpips"], x, key,
          state.step, cfg)
        upd_ae, opt_ae = self.tx_ae.update(grads_ae, state.opt_ae,
                                           params["ae"])
        new_ae = optax.apply_updates(params["ae"], upd_ae)

        (loss_d, logs_d), grads_d = jax.value_and_grad(
            disc_loss, has_aux=True
        )(params["disc"], new_ae, x, xrec, state.step, cfg)
        upd_d, opt_disc = self.tx_disc.update(grads_d, state.opt_disc,
                                              params["disc"])
        new_disc = optax.apply_updates(params["disc"], upd_d)

        logs = dict(logs)
        logs.update(logs_d)
        new_state = AEEngineState(
            params={"ae": new_ae, "disc": new_disc,
                    "lpips": params["lpips"]},
            opt_ae=opt_ae,
            opt_disc=opt_disc,
            step=state.step + 1,
        )
        return new_state, logs

    def validation_step(self, state: AEEngineState, x, key, postfix=""):
        """``_validation_step`` (autoencoder.py:225-243): both loss branches
        evaluated, no updates."""
        cfg = self.cfg
        params = state.params
        loss_ae, (xrec, logs) = ae_loss(
            params["ae"], params["disc"], params["lpips"], x, key,
            state.step, cfg,
        )
        _, logs_d = disc_loss(params["disc"], params["ae"], x, xrec,
                              state.step, cfg)
        out = {}
        for k, v in {**logs, **logs_d}.items():
            out[k.replace("train/", f"val{postfix}/")] = v
        return out


jax.tree_util.register_pytree_node(
    AEEngineState,
    lambda s: ((s.params, s.opt_ae, s.opt_disc, s.step), None),
    lambda _, c: AEEngineState(*c),
)
