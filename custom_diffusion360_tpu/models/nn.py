"""Minimal functional layer library over param pytrees.

Every layer is (init, apply) pure-function pairs; params are nested dicts of
jnp arrays. Conventions:

* linear weights are stored (in, out) so application is ``x @ w`` (torch
  checkpoints transpose on import);
* convs use NHWC activations and HWIO kernels (TPU-native layout; torch OIHW
  kernels transpose on import);
* normalization statistics are computed in float32 regardless of activation
  dtype (reference: GroupNorm32, sgm/modules/diffusionmodules/util.py:309-311).
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------


def _kaiming_uniform(key, shape, fan_in):
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def linear_init(key, in_dim, out_dim, bias=True, zero=False, eye=False, std=None):
    if zero:
        w = jnp.zeros((in_dim, out_dim), jnp.float32)
    elif eye:
        w = jnp.eye(in_dim, out_dim, dtype=jnp.float32)
    elif std is not None:
        w = jax.random.normal(key, (in_dim, out_dim), jnp.float32) * std
    else:
        w = _kaiming_uniform(key, (in_dim, out_dim), in_dim)
    p = {"w": w}
    if bias:
        kb = jax.random.split(key)[1]
        p["b"] = (
            jnp.zeros((out_dim,), jnp.float32)
            if zero or eye
            else _kaiming_uniform(kb, (out_dim,), in_dim)
        )
    return p


def linear(p, x):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv2d_init(key, in_ch, out_ch, kernel=3, bias=True, zero=False):
    fan_in = in_ch * kernel * kernel
    if zero:
        w = jnp.zeros((kernel, kernel, in_ch, out_ch), jnp.float32)
    else:
        w = _kaiming_uniform(key, (kernel, kernel, in_ch, out_ch), fan_in)
    p = {"w": w}
    if bias:
        kb = jax.random.split(key)[1]
        p["b"] = (
            jnp.zeros((out_ch,), jnp.float32)
            if zero
            else _kaiming_uniform(kb, (out_ch,), fan_in)
        )
    return p


def conv2d(p, x, stride=1, padding="SAME"):
    """x: NHWC. kernel: HWIO."""
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def group_norm_init(channels):
    return {"scale": jnp.ones((channels,), jnp.float32),
            "bias": jnp.zeros((channels,), jnp.float32)}


def group_norm(p, x, num_groups=32, eps=1e-6):
    """x: (..., C) channels-last; stats over (spatial..., group-channels).

    Matches torch GroupNorm semantics (per-sample, per-group), computed fp32.
    Stays on the XLA lowering: the fused Pallas variant (ops/norms.py)
    measured slower in-graph — see that module's docstring.

    Implementation note: statistics are taken per channel and then folded
    across each group's channels, instead of reshaping to
    (N, HW, G, C/G) — that reshape puts C/G elements (4 for the VAE) on the
    128-lane axis and made GroupNorm ~80 ms of a 172 ms 1024^2 VAE decode.
    Every pass here runs on the full (.., C)-minor layout.
    """
    orig_dtype = x.dtype
    c = x.shape[-1]
    n = x.shape[0]
    cg = c // num_groups
    # barrier: without it XLA fuses the convert+square into the producer
    # conv's epilogue and materializes full-resolution f32 x and x*x pairs
    # (4x the write traffic; seen as 0.6-1.3 ms fusions in the step trace)
    xs = jax.lax.optimization_barrier(x).astype(jnp.float32).reshape(n, -1, c)
    # per-channel first+second moments in one pass, folded per group (tiny)
    s1 = jnp.sum(xs, axis=1)  # (N, C)
    s2 = jnp.sum(xs * xs, axis=1)
    cnt = xs.shape[1] * cg
    mean_g = jnp.sum(s1.reshape(n, num_groups, cg), axis=-1) / cnt  # (N, G)
    ex2_g = jnp.sum(s2.reshape(n, num_groups, cg), axis=-1) / cnt
    var_g = jnp.maximum(ex2_g - mean_g * mean_g, 0.0)
    mean_c = jnp.repeat(mean_g, cg, axis=-1)  # (N, C)
    inv_c = jnp.repeat(jax.lax.rsqrt(var_g + eps), cg, axis=-1)
    # single fused multiply-add in the ACTIVATION dtype: y = x*a + b with
    # per-(sample,channel) a/b folded from stats+affine. Stats stay f32;
    # applying the affine in orig_dtype only re-rounds what the output cast
    # rounds anyway, and halves the HBM traffic of the full-size broadcast
    # XLA materializes for (N,C) stats feeding conv-blocked fusions (the
    # (x-mean)*inv form emitted an f32 broadcast + layout-copy pair,
    # ~3.5 ms/step in the 1024^2 sampling trace).
    af = inv_c * p["scale"]  # (N, C) f32
    a = af.astype(orig_dtype)
    bsh = (p["bias"] - mean_c * af).astype(orig_dtype)
    y = x.reshape(n, -1, c) * a[:, None] + bsh[:, None]
    return y.reshape(x.shape)


def group_norm_silu(p, x, num_groups=32, eps=1e-6):
    """silu(group_norm(x)) — the ResBlock / out-head prologue (reference
    diffusionmodules/util.py:294-311 + SiLU); XLA fuses the pair."""
    return silu(group_norm(p, x, num_groups, eps))


def layer_norm_init(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(p, x, eps=1e-5):
    # NOTE: a fused Pallas LayerNorm (ops/norms.py) measured ~20 ms SLOWER
    # per 1024^2 sampling step than this XLA lowering — XLA overlaps the
    # stats/normalize fusions with neighboring matmuls, while 210 extra
    # custom calls serialize the schedule. Keep the XLA path.
    # barrier: stops XLA fusing the stats reduce into the producer matmul's
    # epilogue — that fusion forces a transposed ({1,2,0}) activation layout
    # and runs the dot ~8x off roofline (trace: 0.4 ms per block)
    xs = jax.lax.optimization_barrier(x).astype(jnp.float32)
    mean = xs.mean(-1, keepdims=True)
    var = xs.var(-1, keepdims=True)
    xf = x.astype(jnp.float32)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf * p["scale"] + p["bias"]).astype(x.dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# timestep embedding (reference: diffusionmodules/util.py:206-230)
# ---------------------------------------------------------------------------


def timestep_embedding(t, dim, max_period=10000.0):
    """t: (N,) possibly fractional -> (N, dim); layout [cos | sin]."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


# ---------------------------------------------------------------------------
# trunc_exp: exp with clipped-input backward (reference: attention.py:192-210)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------


def nearest_resize_tokens(x, src_res: int, dst_res: int):
    """(..., src*src, C) -> (..., dst*dst, C) nearest-neighbor (torch
    F.interpolate mode='nearest' semantics: floor(idx * src/dst))."""
    if src_res == dst_res:
        return x
    idx = jnp.floor(jnp.arange(dst_res) * (src_res / dst_res)).astype(jnp.int32)
    img = x.reshape(x.shape[:-2] + (src_res, src_res, x.shape[-1]))
    img = jnp.take(img, idx, axis=-3)
    img = jnp.take(img, idx, axis=-2)
    return img.reshape(x.shape[:-2] + (dst_res * dst_res, x.shape[-1]))


def upsample_nearest_2x(x):
    """NHWC nearest 2x upsample."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def upsample_conv2d(p, x):
    """``conv2d(p, upsample_nearest_2x(x))`` without materializing the 2x
    tensor (subpixel folding).

    Nearest-2x duplication makes each upsampled-grid 3x3 window read at
    most a 2x2 patch of the original grid, so the composition equals ONE
    3x3 SAME conv at the low resolution with 4 output groups (one per
    (di, dj) subpixel; tap weights re-aggregated below) followed by
    depth-to-space.

    MEASURED NEGATIVE on v5e — kept as a documented alternative, not
    dispatched: VAE 1024^2 decode 141.6 -> 164.5 ms, UNet cached step
    124.0 -> 123.2 ms (noise). XLA already fuses the broadcast-upsample
    into the consuming conv's input (no materialization), so the explicit
    depth-to-space transpose here only adds a full-resolution copy.
    """
    w = p["w"].astype(x.dtype)  # (3, 3, C, C')
    z = jnp.zeros_like(w[0])
    # per-dim tap aggregation over the duplicated grid:
    #   subpixel 0 reads offsets (-1, 0):  [w0, w1+w2, 0]
    #   subpixel 1 reads offsets (0, +1):  [0, w0+w1, w2]
    wy = (
        jnp.stack([w[0], w[1] + w[2], z], axis=0),
        jnp.stack([z, w[0] + w[1], w[2]], axis=0),
    )

    def col(wk):
        zc = jnp.zeros_like(wk[:, 0])
        return (
            jnp.stack([wk[:, 0], wk[:, 1] + wk[:, 2], zc], axis=1),
            jnp.stack([zc, wk[:, 0] + wk[:, 1], wk[:, 2]], axis=1),
        )

    w00, w01 = col(wy[0])
    w10, w11 = col(wy[1])
    wall = jnp.concatenate([w00, w01, w10, w11], axis=-1)  # (3,3,C,4C')
    y = jax.lax.conv_general_dilated(
        x, wall, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    n, h, wd, c4 = y.shape
    cp = c4 // 4
    y = y.reshape(n, h, wd, 2, 2, cp)  # (.., di, dj, C')
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(n, 2 * h, 2 * wd, cp)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y
