"""Classifier-free-guidance guiders.

Reference: sgm/modules/diffusionmodules/guiders.py. Each guider is a frozen
config with two pure methods:

  prepare(x, sigma, c, uc) -> (x_batched, sigma_batched, cond_batched)
  combine(denoised_batched, sigma) -> denoised

``c``/``uc`` are dicts of arrays. For the ImgRef guiders the conditioner
contract applies: each of "crossattn"/"vector" has the B target rows first,
then the n_ref*B reference rows (encoders/modules.py:122-210); the split at
``x.shape[0]`` and re-interleave reproduces guiders.py:116-166.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

_COND_KEYS = ("vector", "crossattn", "concat")


def _append_dims(x, ndim):
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


@dataclasses.dataclass(frozen=True)
class identity_guider:
    def prepare(self, x, s, c, uc):
        return x, s, c

    def combine(self, x, sigma):
        return x

    @property
    def num_copies(self):
        return 1


@dataclasses.dataclass(frozen=True)
class vanilla_cfg:
    """[uc | c] doubling (guiders.py:24-43)."""

    scale: float = 7.5

    def prepare(self, x, s, c, uc):
        c_out = {}
        for k in c:
            if k in _COND_KEYS:
                c_out[k] = jnp.concatenate([uc[k], c[k]], axis=0)
            else:
                c_out[k] = c[k]
        return jnp.concatenate([x, x]), jnp.concatenate([s, s]), c_out

    def combine(self, x, sigma):
        x_u, x_c = jnp.split(x, 2)
        return x_u + self.scale * (x_c - x_u)

    @property
    def num_copies(self):
        return 2


@dataclasses.dataclass(frozen=True)
class vanilla_cfg_img_ref:
    """Target/ref-aware CFG doubling: [uc_tgt, c_tgt, uc_ref, c_ref]
    (VanillaCFGImgRef, guiders.py:136-166)."""

    scale: float = 7.5

    def prepare(self, x, s, c, uc):
        b = x.shape[0]
        c_out = {}
        for k in c:
            if k in _COND_KEYS:
                uc1, uc2 = uc[k][:b], uc[k][b:]
                c1, c2 = c[k][:b], c[k][b:]
                c_out[k] = jnp.concatenate([uc1, c1, uc2, c2], axis=0)
            else:
                c_out[k] = c[k]
        return jnp.concatenate([x, x]), jnp.concatenate([s, s]), c_out

    def combine(self, x, sigma):
        x_u, x_c = jnp.split(x, 2)
        return x_u + self.scale * (x_c - x_u)

    @property
    def num_copies(self):
        return 2


@dataclasses.dataclass(frozen=True)
class scheduled_cfg_img_text_ref:
    """InstructPix2Pix-style dual guidance: x_u + s_txt (x_c - x_ic)
    + s_im (x_ic - x_u); batch layout [uc1,uc1,c1 | uc2,c2,c2]
    (ScheduledCFGImgTextRef, guiders.py:102-133)."""

    scale: float = 7.5
    scale_im: float = 3.5

    def prepare(self, x, s, c, uc):
        b = x.shape[0]
        c_out = {}
        for k in c:
            if k in _COND_KEYS:
                uc1, uc2 = uc[k][:b], uc[k][b:]
                c1, c2 = c[k][:b], c[k][b:]
                c_out[k] = jnp.concatenate([uc1, uc1, c1, uc2, c2, c2], axis=0)
            else:
                c_out[k] = c[k]
        return (
            jnp.concatenate([x, x, x]),
            jnp.concatenate([s, s, s]),
            c_out,
        )

    def combine(self, x, sigma):
        x_u, x_ic, x_c = jnp.split(x, 3)
        return x_u + self.scale * (x_c - x_ic) + self.scale_im * (x_ic - x_u)

    @property
    def num_copies(self):
        return 3

    @property
    def prefix_copy_groups(self):
        """Copies 0/1 are identical until the first image-cross (pose)
        block BY CONSTRUCTION: ``prepare`` builds their text/vector rows
        from the same ``uc`` slices ([uc1, uc1, c1]) and tiles x/sigma, so
        every pre-pose-block op (conv_in, time/vector-emb resblocks) yields
        equal rows. The UNet may therefore compute that prefix on the 2
        unique copies and expand (models/unet.py prefix_dedupe; standalone
        prefix probe predicted 2.2 ms/step, step_bench --copies 3 A/B
        measured ~3 ms/step, round 5)."""
        return (0, 0, 1)


@dataclasses.dataclass(frozen=True)
class linear_prediction_guider:
    """Per-frame linearly ramped scale (guiders.py:59-103); video-style."""

    max_scale: float
    num_frames: int
    min_scale: float = 1.0

    def prepare(self, x, s, c, uc):
        c_out = {}
        for k in c:
            if k in _COND_KEYS:
                c_out[k] = jnp.concatenate([uc[k], c[k]], axis=0)
            else:
                c_out[k] = c[k]
        return jnp.concatenate([x, x]), jnp.concatenate([s, s]), c_out

    def combine(self, x, sigma):
        x_u, x_c = jnp.split(x, 2)
        t = self.num_frames
        b = x_u.shape[0] // t
        scale = jnp.linspace(self.min_scale, self.max_scale, t)
        scale = jnp.tile(scale, b)
        scale = _append_dims(scale, x_u.ndim)
        return x_u + scale * (x_c - x_u)

    @property
    def num_copies(self):
        return 2
