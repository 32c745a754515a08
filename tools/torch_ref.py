"""Independent torch re-derivations of the SDXL stack, consuming RAW
sgm-named state dicts (the same .safetensors / .ckpt keys the reference
loads). Used by tools/parity.py to validate both the weight conversion
(io/torch_convert.py) and our JAX forward semantics against torch ground
truth — a mapping or convention bug on our side cannot hide because this
path never touches our converters.

Everything is CPU torch (no CUDA / xformers / pytorch3d needed):
  * VAE encoder/decoder      (sgm/modules/diffusionmodules/model.py:368-748)
  * CLIP-L text tower        (HF CLIPTextModel keys; modules.py:432-516)
  * OpenCLIP bigG text tower (modules.py:622-771)
  * plain SDXL UNet          (openaimodel.py:525-1093, no-reference path)
  * FeatureNeRF encoding MLP (nerfsd_pytorch3d.py:53-161, from delta keys)
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def _t(sd, k):
    v = sd[k]
    if isinstance(v, np.ndarray):
        return torch.from_numpy(v).float()
    return v.detach().float()


def _gn(sd, p, x, eps):
    return F.group_norm(x, 32 if x.shape[1] >= 32 else min(32, x.shape[1]),
                        _t(sd, p + ".weight"), _t(sd, p + ".bias"), eps)


def _ln(sd, p, x, eps=1e-5):
    return F.layer_norm(x, (x.shape[-1],), _t(sd, p + ".weight"),
                        _t(sd, p + ".bias"), eps)


def _lin(sd, p, x):
    b = _t(sd, p + ".bias") if p + ".bias" in sd else None
    return F.linear(x, _t(sd, p + ".weight"), b)


def _conv(sd, p, x, stride=1, padding=1):
    b = _t(sd, p + ".bias") if p + ".bias" in sd else None
    return F.conv2d(x, _t(sd, p + ".weight"), b, stride, padding)


# ---------------------------------------------------------------------------
# VAE (model.py: ResnetBlock / AttnBlock / Encoder / Decoder)
# ---------------------------------------------------------------------------


def _vae_res(sd, p, x):
    h = _conv(sd, p + ".conv1", F.silu(_gn(sd, p + ".norm1", x, 1e-6)))
    h = _conv(sd, p + ".conv2", F.silu(_gn(sd, p + ".norm2", h, 1e-6)))
    if p + ".nin_shortcut.weight" in sd:
        x = _conv(sd, p + ".nin_shortcut", x, padding=0)
    return x + h


def _vae_attn(sd, p, x):
    h = _gn(sd, p + ".norm", x, 1e-6)
    q = _conv(sd, p + ".q", h, padding=0)
    k = _conv(sd, p + ".k", h, padding=0)
    v = _conv(sd, p + ".v", h, padding=0)
    b, c, hh, ww = q.shape
    q = q.reshape(b, 1, c, hh * ww).transpose(2, 3)
    k = k.reshape(b, 1, c, hh * ww).transpose(2, 3)
    v = v.reshape(b, 1, c, hh * ww).transpose(2, 3)
    o = F.scaled_dot_product_attention(q, k, v)
    o = o.transpose(2, 3).reshape(b, c, hh, ww)
    return x + _conv(sd, p + ".proj_out", o, padding=0)


def vae_encode(sd, x, ch_mult=(1, 2, 4, 4), num_res=2,
               prefix="first_stage_model."):
    """x: (B, 3, H, W) -> moments (B, 8, H/8, W/8) (post quant_conv)."""
    P = prefix + "encoder."
    h = _conv(sd, P + "conv_in", x)
    for i in range(len(ch_mult)):
        for j in range(num_res):
            h = _vae_res(sd, f"{P}down.{i}.block.{j}", h)
        if i != len(ch_mult) - 1:
            h = F.pad(h, (0, 1, 0, 1))
            h = _conv(sd, f"{P}down.{i}.downsample.conv", h, stride=2,
                      padding=0)
    h = _vae_res(sd, P + "mid.block_1", h)
    h = _vae_attn(sd, P + "mid.attn_1", h)
    h = _vae_res(sd, P + "mid.block_2", h)
    h = _conv(sd, P + "conv_out", F.silu(_gn(sd, P + "norm_out", h, 1e-6)))
    return _conv(sd, prefix + "quant_conv", h, padding=0)


def vae_decode(sd, z, ch_mult=(1, 2, 4, 4), num_res=2,
               prefix="first_stage_model."):
    """z: (B, 4, h, w) (pre post_quant_conv) -> (B, 3, 8h, 8w)."""
    P = prefix + "decoder."
    z = _conv(sd, prefix + "post_quant_conv", z, padding=0)
    h = _conv(sd, P + "conv_in", z)
    h = _vae_res(sd, P + "mid.block_1", h)
    h = _vae_attn(sd, P + "mid.attn_1", h)
    h = _vae_res(sd, P + "mid.block_2", h)
    for i in reversed(range(len(ch_mult))):
        for j in range(num_res + 1):
            h = _vae_res(sd, f"{P}up.{i}.block.{j}", h)
        if i != 0:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = _conv(sd, f"{P}up.{i}.upsample.conv", h)
    return _conv(sd, P + "conv_out", F.silu(_gn(sd, P + "norm_out", h, 1e-6)))


# ---------------------------------------------------------------------------
# text towers
# ---------------------------------------------------------------------------


def clip_l_tower(sd, tokens, layers=12, heads=12,
                 prefix="conditioner.embedders.0.transformer."):
    """tokens: (B, 77) int64 -> final-LN hidden states (B, 77, 768)
    (the fork's custom_forward behavior, modules.py:461-485)."""
    P = prefix + "text_model."
    table = _t(sd, P + "embeddings.token_embedding.weight")
    x = table[tokens] + _t(sd, P + "embeddings.position_embedding.weight")[
        : tokens.shape[1]
    ]
    for i in range(layers):
        lp = f"{P}encoder.layers.{i}."
        h = _ln(sd, lp + "layer_norm1", x)
        b, t, d = h.shape
        dh = d // heads

        def split(y):
            return y.reshape(b, t, heads, dh).transpose(1, 2)

        a = F.scaled_dot_product_attention(
            split(_lin(sd, lp + "self_attn.q_proj", h)),
            split(_lin(sd, lp + "self_attn.k_proj", h)),
            split(_lin(sd, lp + "self_attn.v_proj", h)),
            is_causal=True,
        ).transpose(1, 2).reshape(b, t, d)
        x = x + _lin(sd, lp + "self_attn.out_proj", a)
        h = _ln(sd, lp + "layer_norm2", x)
        h = _lin(sd, lp + "mlp.fc1", h)
        h = h * torch.sigmoid(1.702 * h)  # quick_gelu
        x = x + _lin(sd, lp + "mlp.fc2", h)
    return _ln(sd, P + "final_layer_norm", x)


def open_clip_tower(sd, tokens, layers=32, heads=20,
                    prefix="conditioner.embedders.1.model."):
    """tokens: (B, 77) -> (penultimate (B,77,1280), pooled (B,1280))."""
    P = prefix
    table = _t(sd, P + "token_embedding.weight")
    x = table[tokens] + _t(sd, P + "positional_embedding")[: tokens.shape[1]]
    penultimate = None
    for i in range(layers):
        lp = f"{P}transformer.resblocks.{i}."
        h = _ln(sd, lp + "ln_1", x)
        b, t, d = h.shape
        dh = d // heads
        qkv = F.linear(h, _t(sd, lp + "attn.in_proj_weight"),
                       _t(sd, lp + "attn.in_proj_bias"))
        q, k, v = qkv.chunk(3, dim=-1)

        def split(y):
            return y.reshape(b, t, heads, dh).transpose(1, 2)

        a = F.scaled_dot_product_attention(
            split(q), split(k), split(v), is_causal=True
        ).transpose(1, 2).reshape(b, t, d)
        x = x + _lin(sd, lp + "attn.out_proj", a)
        h = _ln(sd, lp + "ln_2", x)
        x = x + _lin(sd, lp + "mlp.c_proj", F.gelu(_lin(sd, lp + "mlp.c_fc", h)))
        if i == layers - 2:
            penultimate = x
    final = _ln(sd, P + "ln_final", x)
    eot = tokens.argmax(dim=-1)
    pooled = final[torch.arange(final.shape[0]), eot] @ _t(
        sd, P + "text_projection"
    )
    return penultimate, pooled


# ---------------------------------------------------------------------------
# plain SDXL UNet (no reference stream / NeRF)
# ---------------------------------------------------------------------------


def _timestep_embedding(t, dim, max_period=10000.0):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def _resblock(sd, p, x, emb):
    h = _conv(sd, p + ".in_layers.2", F.silu(_gn(sd, p + ".in_layers.0", x, 1e-5)))
    h = h + _lin(sd, p + ".emb_layers.1", F.silu(emb))[:, :, None, None]
    h = _conv(sd, p + ".out_layers.3", F.silu(_gn(sd, p + ".out_layers.0", h, 1e-5)))
    if p + ".skip_connection.weight" in sd:
        x = _conv(sd, p + ".skip_connection", x, padding=0)
    return x + h


def _sdpa(q, k, v, heads):
    b, n, d = q.shape
    dh = d // heads

    def split(y):
        return y.reshape(b, -1, heads, dh).transpose(1, 2)

    o = F.scaled_dot_product_attention(split(q), split(k), split(v))
    return o.transpose(1, 2).reshape(b, n, d)


def _basic_block(sd, p, x, context, heads):
    h = _ln(sd, p + ".norm1", x)
    x = x + _lin(sd, p + ".attn1.to_out.0", _sdpa(
        _lin(sd, p + ".attn1.to_q", h), _lin(sd, p + ".attn1.to_k", h),
        _lin(sd, p + ".attn1.to_v", h), heads))
    h = _ln(sd, p + ".norm2", x)
    x = x + _lin(sd, p + ".attn2.to_out.0", _sdpa(
        _lin(sd, p + ".attn2.to_q", h), _lin(sd, p + ".attn2.to_k", context),
        _lin(sd, p + ".attn2.to_v", context), heads))
    h = _ln(sd, p + ".norm3", x)
    h = _lin(sd, p + ".ff.net.0.proj", h)
    a, gate = h.chunk(2, dim=-1)
    return x + _lin(sd, p + ".ff.net.2", a * F.gelu(gate))


def _spatial_transformer(sd, p, x, context, depth, head_dim=64):
    b, c, hh, ww = x.shape
    heads = c // head_dim
    h = _gn(sd, p + ".norm", x, 1e-6)
    h = h.reshape(b, c, hh * ww).transpose(1, 2)
    h = _lin(sd, p + ".proj_in", h)
    for d in range(depth):
        h = _basic_block(sd, f"{p}.transformer_blocks.{d}", h, context, heads)
    h = _lin(sd, p + ".proj_out", h)
    return h.transpose(1, 2).reshape(b, c, hh, ww) + x


def unet_plain(sd, x, t, context, y, cfg, prefix="model.diffusion_model."):
    """Plain (no-reference) UNet forward from raw sgm keys.

    x: (B, Cin, H, W); t: (B,) c_noise; context: (B, 77, ctx); y: (B, adm).
    cfg: our UNetConfig (for the block spec topology).
    """
    from custom_diffusion360_tpu.models.unet import build_unet_spec

    P = prefix
    emb = _timestep_embedding(t, cfg.model_channels)
    emb = _lin(sd, P + "time_embed.2", F.silu(_lin(sd, P + "time_embed.0", emb)))
    if y is not None:
        emb = emb + _lin(
            sd, P + "label_emb.0.2", F.silu(_lin(sd, P + "label_emb.0.0", y))
        )

    inb, mid, outb, _ = build_unet_spec(cfg)

    def layer(spec, p, h):
        kind = spec[0]
        if kind == "conv_in":
            return _conv(sd, p, h)
        if kind == "res":
            return _resblock(sd, p, h, emb)
        if kind == "attn":
            return _spatial_transformer(
                sd, p, h, context, spec[2], cfg.num_head_channels
            )
        if kind == "down":
            return _conv(sd, p + ".op", h, stride=2, padding=1)
        if kind == "up":
            return _conv(
                sd, p + ".conv",
                F.interpolate(h, scale_factor=2.0, mode="nearest"),
            )
        raise ValueError(kind)

    h = x
    hs = []
    for i, block in enumerate(inb):
        for j, spec in enumerate(block):
            h = layer(spec, f"{P}input_blocks.{i}.{j}", h)
        hs.append(h)
    for j, spec in enumerate(mid):
        h = layer(spec, f"{P}middle_block.{j}", h)
    for i, block in enumerate(outb):
        h = torch.cat([h, hs.pop()], dim=1)
        for j, spec in enumerate(block):
            h = layer(spec, f"{P}output_blocks.{i}.{j}", h)
    h = F.silu(_gn(sd, P + "out.0", h, 1e-5))
    return _conv(sd, P + "out.2", h)


# ---------------------------------------------------------------------------
# FeatureNeRF encoding (from delta-checkpoint pose keys)
# ---------------------------------------------------------------------------


def nerf_encoding(sd, prefix, xref, grid, geo_mlp, geo_attn, average=False):
    """One FeatureNeRF encoding forward from raw pose weights.

    prefix: e.g. "model.diffusion_model.....pose_featurenerf.model"
    xref: (B, N, res, res, C) reference maps (already masked);
    grid: (B, N, hw*s, 2) NDC sample grid (sign-flipped, clipped — as
      produced by our geometry); geo_mlp: (B, N, hw, S, 99+99) the
      [pe_pts_view, pts_view, pe_cam_inview, cam_dir] features;
    geo_attn: (B, N, hw, S, 99+99) the [pe_pts_tgt, pts_tgt, cam_tgt,
      pe_cam_tgt] features. Returns (out (B,hw,S,C+1[+3]), attn).
    Mirrors FeatureNeRFEncoding.forward (nerfsd_pytorch3d.py:53-161).
    """
    b, n, res, _, c = xref.shape
    hw, s = geo_mlp.shape[2], geo_mlp.shape[3]
    fm = xref.permute(0, 1, 4, 2, 3).reshape(b * n, c, res, res)
    g = grid.reshape(b * n, 1, -1, 2)
    plane = F.grid_sample(fm, g, mode="bilinear", padding_mode="zeros",
                          align_corners=True)
    plane = plane.reshape(b, n, c, hw, s).permute(0, 1, 3, 4, 2)

    mlp_in = torch.cat([plane, geo_mlp], dim=-1)
    h = _lin(sd, prefix + ".plane_coefs.0", mlp_in)
    h = F.silu(h)
    h = _lin(sd, prefix + ".plane_coefs.2", h)
    if average:
        pooled = h.mean(dim=1)
        attn = None
    else:
        attn_in = torch.cat([plane, geo_attn], dim=-1)
        attn = torch.softmax(_lin(sd, prefix + ".nviews", attn_in), dim=1)
        pooled = (h * attn).sum(dim=1)
    out = _lin(sd, prefix + ".decoder", pooled)
    return torch.cat([pooled, out], dim=-1), attn


def _attn_layer(sd, p, x, context, heads):
    return _lin(sd, p + ".to_out.0", _sdpa(
        _lin(sd, p + ".to_q", x), _lin(sd, p + ".to_k", context),
        _lin(sd, p + ".to_v", context), heads))


def _volume_render(feats, sigma, dists, rgb=None):
    """Alpha compositing with exclusive-cumsum transmittance (VolRender,
    nerfsd_pytorch3d.py:170-231). feats (..., S, C); sigma/dists (..., S, 1)."""
    dd = dists * sigma
    alphas = 1.0 - torch.exp(-dd)
    trans = torch.exp(-(torch.cumsum(dd, dim=-2) - dd))
    weights = torch.nan_to_num(alphas * trans)
    out = (weights * feats).sum(dim=-2)
    rgb_out = (weights * rgb).sum(dim=-2) if rgb is not None else None
    return out, weights.sum(dim=-2), rgb_out


def pose_spatial_transformer(
    sd, p, x, xr, context, context_ref, depth, heads,
    grid, geo_mlp, geo_attn, dists, rgb_predict=True,
):
    """Dual-stream SpatialTransformer with the d=0 FeatureNeRF pose block
    (SpatialTransformer dual path + BasicTransformerBlock.reference_attn,
    attention.py:571-886), from raw sgm/delta key names.

    x: (B, C, H, W) target; xr: (B*N, C, H, W) reference stream;
    grid/geo_mlp/geo_attn: NeRF geometry (see parity._nerf_geometry),
    dists: (B, hw, S, 1). LoRA ships zero-initialized in deltas (up-proj
    zeros, main.py:616-623), so its contribution is exactly zero and it is
    omitted here. No importance chain (real ds2 blocks: depth 2 < interval
    4, attention.py:781).
    """
    b, c, hh, ww = x.shape
    n = xr.shape[0] // b
    x_in, xr_in = x, xr

    def tokens(t):
        return _lin(sd, p + ".proj_in",
                    _gn(sd, p + ".norm", t, 1e-6)
                    .reshape(t.shape[0], c, hh * ww).transpose(1, 2))

    h, hr = tokens(x), tokens(xr)
    for d in range(depth):
        bp = f"{p}.transformer_blocks.{d}"
        hr = _basic_block(sd, bp, hr, context_ref, heads)
        if d == 0:
            h = h + _attn_layer(sd, bp + ".attn1", _ln(sd, bp + ".norm1", h),
                                _ln(sd, bp + ".norm1", h), heads)
            h = h + _attn_layer(sd, bp + ".attn2", _ln(sd, bp + ".norm2", h),
                                context, heads)
            # reference_attn: NeRF encode -> per-point text attn -> render
            xref = hr.reshape(b, n, hh * ww, c)
            nerf_p = bp + ".pose_featurenerf.model"
            out, _ = nerf_encoding(sd, nerf_p, xref.reshape(b, n, hh, ww, c),
                                   grid, geo_mlp, geo_attn)
            s = geo_mlp.shape[3]
            sigma = out[..., -1:]
            feats = out[..., :-1]
            rgb = None
            if rgb_predict:
                rgb = torch.sigmoid(feats[..., -3:])
                feats = feats[..., :-3]
            fl = feats.reshape(b, hh * ww * s, c)
            fl = fl + _attn_layer(sd, bp + ".attn2", _ln(sd, bp + ".norm2", fl),
                                  context, heads)
            feats = fl.reshape(b, hh * ww, s, c)
            # trunc_exp: plain exp forward (clamp is backward-only,
            # nerfsd truncexp semantics)
            rendered, _, _ = _volume_render(feats, torch.exp(sigma), dists, rgb)
            h = _lin(sd, bp + ".pose_emb_layers",
                     torch.cat([h, rendered], dim=-1))
            hf = _ln(sd, bp + ".norm3", h)
            hf = _lin(sd, bp + ".ff.net.0.proj", hf)
            a, gate = hf.chunk(2, dim=-1)
            h = h + _lin(sd, bp + ".ff.net.2", a * F.gelu(gate))
        else:
            h = _basic_block(sd, bp, h, context, heads)

    def unproj(t, t_in):
        return (_lin(sd, p + ".proj_out", t)
                .transpose(1, 2).reshape(t_in.shape) + t_in)

    return unproj(h, x_in), unproj(hr, xr_in)
