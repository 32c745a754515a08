"""Weight import / delta checkpoint tests.

Strategy: build a torch-style state dict *from* our randomly initialized
pytrees by inverting the documented key mapping, convert it back through the
importer, and require exact tree/shape/value equality. This pins the full
key-naming and transpose contract without needing real SDXL weights.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from custom_diffusion360_tpu.io.delta import (
    apply_delta_state_dict,
    extract_delta,
    iter_pose_blocks,
    load_delta_npz,
    save_delta_npz,
)
from custom_diffusion360_tpu.io.torch_convert import (
    convert_clip_l_state_dict,
    convert_open_clip_state_dict,
    convert_unet_state_dict,
    convert_vae_state_dict,
)
from custom_diffusion360_tpu.models.clip import (
    ClipTextConfig,
    init_clip_text_params,
)
from custom_diffusion360_tpu.models.unet import (
    UNetConfig,
    build_unet_spec,
    init_unet_params,
)
from custom_diffusion360_tpu.models.vae import VAEConfig, init_vae_params

TINY_UNET = UNetConfig(
    model_channels=32,
    channel_mult=(1, 2),
    transformer_depth=(1, 2),
    attention_resolutions=(2,),
    context_dim=64,
    adm_in_channels=32,
    num_head_channels=16,
    image_cross_blocks=(0, 1),
    poscontrol_interval=1,
    num_samples=4,
    num_freqs=2,
)
TINY_VAE = VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1)


def _to_sd(tree, prefix, sd, kind_map):
    """Recursively serialize our pytree into torch-style keys via kind_map
    rules applied at leaf-dict level."""
    raise NotImplementedError


# -- inverse serializers (mirror torch_convert mappings) ---------------------


def _lin_sd(sd, prefix, p):
    sd[prefix + ".weight"] = np.asarray(p["w"]).T
    if "b" in p:
        sd[prefix + ".bias"] = np.asarray(p["b"])


def _conv_sd(sd, prefix, p):
    sd[prefix + ".weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
    if "b" in p:
        sd[prefix + ".bias"] = np.asarray(p["b"])


def _norm_sd(sd, prefix, p):
    sd[prefix + ".weight"] = np.asarray(p["scale"])
    sd[prefix + ".bias"] = np.asarray(p["bias"])


def _attn_sd(sd, prefix, p):
    _lin_sd(sd, prefix + ".to_q", p["to_q"])
    _lin_sd(sd, prefix + ".to_k", p["to_k"])
    _lin_sd(sd, prefix + ".to_v", p["to_v"])
    _lin_sd(sd, prefix + ".to_out.0", p["to_out"])


def _block_sd(sd, prefix, p):
    _attn_sd(sd, prefix + ".attn1", p["attn1"])
    _attn_sd(sd, prefix + ".attn2", p["attn2"])
    _lin_sd(sd, prefix + ".ff.net.0.proj", p["ff"]["proj"])
    _lin_sd(sd, prefix + ".ff.net.2", p["ff"]["out"])
    for n in ("norm1", "norm2", "norm3"):
        _norm_sd(sd, f"{prefix}.{n}", p[n])
    if "pose_emb_layers" in p:
        _lin_sd(sd, prefix + ".pose_emb_layers", p["pose_emb_layers"])
        np_ = prefix + ".pose_featurenerf.model"
        _lin_sd(sd, np_ + ".plane_coefs.0", p["pose_featurenerf"]["plane_coefs"]["l1"])
        _lin_sd(sd, np_ + ".plane_coefs.2", p["pose_featurenerf"]["plane_coefs"]["l2"])
        _lin_sd(sd, np_ + ".decoder", p["pose_featurenerf"]["decoder"])
        if "nviews" in p["pose_featurenerf"]:
            _lin_sd(sd, np_ + ".nviews", p["pose_featurenerf"]["nviews"])


def _spatial_sd(sd, prefix, p):
    _norm_sd(sd, prefix + ".norm", p["norm"])
    _lin_sd(sd, prefix + ".proj_in", p["proj_in"])
    _lin_sd(sd, prefix + ".proj_out", p["proj_out"])
    for d, bp in enumerate(p["blocks"]):
        _block_sd(sd, f"{prefix}.transformer_blocks.{d}", bp)


def _res_sd(sd, prefix, p):
    _norm_sd(sd, prefix + ".in_layers.0", p["norm_in"])
    _conv_sd(sd, prefix + ".in_layers.2", p["conv_in"])
    _lin_sd(sd, prefix + ".emb_layers.1", p["emb"])
    _norm_sd(sd, prefix + ".out_layers.0", p["norm_out"])
    _conv_sd(sd, prefix + ".out_layers.3", p["conv_out"])
    if "skip" in p:
        _conv_sd(sd, prefix + ".skip_connection", p["skip"])


def make_unet_sd(params, cfg):
    sd = {}
    P = "model.diffusion_model."
    _lin_sd(sd, P + "time_embed.0", params["time_embed"]["l1"])
    _lin_sd(sd, P + "time_embed.2", params["time_embed"]["l2"])
    _lin_sd(sd, P + "label_emb.0.0", params["label_emb"]["l1"])
    _lin_sd(sd, P + "label_emb.0.2", params["label_emb"]["l2"])
    _norm_sd(sd, P + "out.0", params["out_norm"])
    _conv_sd(sd, P + "out.2", params["out_conv"])
    inb, mid, outb, _ = build_unet_spec(cfg)

    def ser(spec, prefix, p):
        kind = spec[0]
        if kind == "conv_in":
            _conv_sd(sd, prefix, p)
        elif kind == "res":
            _res_sd(sd, prefix, p)
        elif kind == "attn":
            _spatial_sd(sd, prefix, p)
        elif kind == "down":
            _conv_sd(sd, prefix + ".op", p)
        elif kind == "up":
            _conv_sd(sd, prefix + ".conv", p)

    for i, (block, pb) in enumerate(zip(inb, params["input_blocks"])):
        for j, (spec, p) in enumerate(zip(block, pb)):
            ser(spec, f"{P}input_blocks.{i}.{j}", p)
    for j, (spec, p) in enumerate(zip(mid, params["middle_block"])):
        ser(spec, f"{P}middle_block.{j}", p)
    for i, (block, pb) in enumerate(zip(outb, params["output_blocks"])):
        for j, (spec, p) in enumerate(zip(block, pb)):
            ser(spec, f"{P}output_blocks.{i}.{j}", p)
    return sd


def assert_trees_equal(a, b):
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb, f"treedefs differ:\n{ta}\n{tb}"
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


class TestUNetImport:
    def test_roundtrip(self):
        params = init_unet_params(jax.random.PRNGKey(0), TINY_UNET)
        sd = make_unet_sd(params, TINY_UNET)
        got = convert_unet_state_dict(sd, TINY_UNET)
        assert_trees_equal(got, params)

    def test_full_sdxl_key_count(self):
        """The full SDXL config must produce the expected module census:
        11 spatial transformers, 12 FeatureNeRF blocks (SURVEY §2.2)."""
        cfg = UNetConfig()
        blocks = list(iter_pose_blocks(cfg))
        assert len(blocks) == 12
        attn_ids = {b[2] for b in blocks}
        assert attn_ids == {0, 2, 4, 6, 8, 10}


class TestVAEImport:
    def test_roundtrip(self):
        params = init_vae_params(jax.random.PRNGKey(0), TINY_VAE)
        sd = {}
        P = "first_stage_model."

        def res(prefix, p):
            _norm_sd(sd, prefix + ".norm1", p["norm1"])
            _conv_sd(sd, prefix + ".conv1", p["conv1"])
            _norm_sd(sd, prefix + ".norm2", p["norm2"])
            _conv_sd(sd, prefix + ".conv2", p["conv2"])
            if "nin_shortcut" in p:
                _conv_sd(sd, prefix + ".nin_shortcut", p["nin_shortcut"])

        def attn(prefix, p):
            _norm_sd(sd, prefix + ".norm", p["norm"])
            for n in ("q", "k", "v", "proj_out"):
                _conv_sd(sd, f"{prefix}.{n}", p[n])

        enc = params["encoder"]
        _conv_sd(sd, P + "encoder.conv_in", enc["conv_in"])
        for i in range(2):
            for j, bp in enumerate(enc[f"down_{i}"]["block"]):
                res(f"{P}encoder.down.{i}.block.{j}", bp)
            if "downsample" in enc[f"down_{i}"]:
                _conv_sd(sd, f"{P}encoder.down.{i}.downsample.conv", enc[f"down_{i}"]["downsample"])
        res(P + "encoder.mid.block_1", enc["mid"]["block_1"])
        attn(P + "encoder.mid.attn_1", enc["mid"]["attn_1"])
        res(P + "encoder.mid.block_2", enc["mid"]["block_2"])
        _norm_sd(sd, P + "encoder.norm_out", enc["norm_out"])
        _conv_sd(sd, P + "encoder.conv_out", enc["conv_out"])

        dec = params["decoder"]
        _conv_sd(sd, P + "decoder.conv_in", dec["conv_in"])
        res(P + "decoder.mid.block_1", dec["mid"]["block_1"])
        attn(P + "decoder.mid.attn_1", dec["mid"]["attn_1"])
        res(P + "decoder.mid.block_2", dec["mid"]["block_2"])
        for i in range(2):
            for j, bp in enumerate(dec[f"up_{i}"]["block"]):
                res(f"{P}decoder.up.{i}.block.{j}", bp)
            if "upsample" in dec[f"up_{i}"]:
                _conv_sd(sd, f"{P}decoder.up.{i}.upsample.conv", dec[f"up_{i}"]["upsample"])
        _norm_sd(sd, P + "decoder.norm_out", dec["norm_out"])
        _conv_sd(sd, P + "decoder.conv_out", dec["conv_out"])
        _conv_sd(sd, P + "quant_conv", params["quant_conv"])
        _conv_sd(sd, P + "post_quant_conv", params["post_quant_conv"])

        got = convert_vae_state_dict(sd, TINY_VAE)
        assert_trees_equal(got, params)


class TestClipImport:
    CFG = ClipTextConfig(vocab_size=32, width=16, layers=2, heads=2, context_length=8)

    def test_clip_l_roundtrip(self):
        params = init_clip_text_params(jax.random.PRNGKey(0), self.CFG)
        sd = {}
        P = "conditioner.embedders.0.transformer.text_model."
        # append a modifier row to the table like sgm does
        table = np.concatenate(
            [np.asarray(params["token_embedding"]), np.asarray(params["modifier_rows"])]
        )
        sd[P + "embeddings.token_embedding.weight"] = table
        sd[P + "embeddings.position_embedding.weight"] = np.asarray(
            params["positional_embedding"]
        )
        _norm_sd(sd, P + "final_layer_norm", params["ln_final"])
        for i in range(self.CFG.layers):
            bp = jax.tree.map(lambda x: x[i], params["blocks"])
            lp = f"{P}encoder.layers.{i}."
            _norm_sd(sd, lp + "layer_norm1", bp["ln1"])
            _norm_sd(sd, lp + "layer_norm2", bp["ln2"])
            for ours, theirs in (
                ("q", "self_attn.q_proj"), ("k", "self_attn.k_proj"),
                ("v", "self_attn.v_proj"), ("o", "self_attn.out_proj"),
                ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2"),
            ):
                _lin_sd(sd, lp + theirs, bp[ours])
        got = convert_clip_l_state_dict(sd, self.CFG)
        assert_trees_equal(got, params)

    def test_open_clip_roundtrip(self):
        cfg = ClipTextConfig(
            vocab_size=32, width=16, layers=2, heads=2, context_length=8,
            act="gelu", text_projection=True,
        )
        params = init_clip_text_params(jax.random.PRNGKey(1), cfg)
        sd = {}
        P = "conditioner.embedders.1.model."
        sd[P + "token_embedding.weight"] = np.concatenate(
            [np.asarray(params["token_embedding"]), np.asarray(params["modifier_rows"])]
        )
        sd[P + "positional_embedding"] = np.asarray(params["positional_embedding"])
        _norm_sd(sd, P + "ln_final", params["ln_final"])
        sd[P + "text_projection"] = np.asarray(params["text_projection"]["w"])
        for i in range(cfg.layers):
            bp = jax.tree.map(lambda x: x[i], params["blocks"])
            lp = f"{P}transformer.resblocks.{i}."
            _norm_sd(sd, lp + "ln_1", bp["ln1"])
            _norm_sd(sd, lp + "ln_2", bp["ln2"])
            sd[lp + "attn.in_proj_weight"] = np.concatenate(
                [np.asarray(bp[k]["w"]).T for k in ("q", "k", "v")]
            )
            sd[lp + "attn.in_proj_bias"] = np.concatenate(
                [np.asarray(bp[k]["b"]) for k in ("q", "k", "v")]
            )
            _lin_sd(sd, lp + "attn.out_proj", bp["o"])
            _lin_sd(sd, lp + "mlp.c_fc", bp["fc1"])
            _lin_sd(sd, lp + "mlp.c_proj", bp["fc2"])
        got = convert_open_clip_state_dict(sd, cfg)
        assert_trees_equal(got, params)


class TestDelta:
    def _full_params(self):
        unet = init_unet_params(jax.random.PRNGKey(0), TINY_UNET)
        cfg_l = ClipTextConfig(vocab_size=32, width=16, layers=1, heads=2)
        cfg_g = ClipTextConfig(
            vocab_size=32, width=24, layers=1, heads=2, text_projection=True
        )
        return {
            "unet": unet,
            "conditioner": {
                "clip_l": init_clip_text_params(jax.random.PRNGKey(1), cfg_l),
                "open_clip": init_clip_text_params(jax.random.PRNGKey(2), cfg_g),
            },
        }

    def test_extract_apply_roundtrip(self, tmp_path):
        params = self._full_params()
        refs = {}
        for _, _, attn_id, d in iter_pose_blocks(TINY_UNET):
            refs.setdefault(attn_id, {})[d] = jnp.ones((3, 16, 8)) * (attn_id + d)
        delta = extract_delta(params, refs, TINY_UNET)
        assert "embed" in delta
        assert any(".references" in k for k in delta)
        assert any("pose_emb_layers" in k for k in delta)

        # mutate a fresh init, then apply the delta and compare pose leaves
        params2 = self._full_params()
        params2["unet"] = jax.tree.map(
            lambda x: x * 0.0, init_unet_params(jax.random.PRNGKey(9), TINY_UNET)
        )
        params2, refs2 = apply_delta_state_dict(params2, delta, TINY_UNET)
        for prefix, path, attn_id, d in iter_pose_blocks(TINY_UNET):
            from custom_diffusion360_tpu.io.delta import _get_block

            b1 = _get_block(params["unet"], path, d)
            b2 = _get_block(params2["unet"], path, d)
            np.testing.assert_allclose(
                np.asarray(b1["pose_emb_layers"]["w"]),
                np.asarray(b2["pose_emb_layers"]["w"]),
                atol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(refs[attn_id][d]), np.asarray(refs2[attn_id][d])
            )
        np.testing.assert_allclose(
            np.asarray(params["conditioner"]["clip_l"]["modifier_rows"]),
            np.asarray(params2["conditioner"]["clip_l"]["modifier_rows"]),
        )

    def test_npz_roundtrip(self, tmp_path):
        params = self._full_params()
        delta = extract_delta(params, None, TINY_UNET)
        path = str(tmp_path / "delta.npz")
        save_delta_npz(path, delta)
        loaded = load_delta_npz(path)
        assert set(loaded.keys()) == set(delta.keys())
        for k in delta:
            if k == "embed":
                for a, b in zip(delta[k], loaded[k]):
                    np.testing.assert_allclose(a, b)
            else:
                np.testing.assert_allclose(delta[k], loaded[k])

    def test_torch_ckpt_interop(self, tmp_path):
        """Write a torch .ckpt in the reference's format and load it back."""
        import torch

        from custom_diffusion360_tpu.io.delta import load_delta_torch

        params = self._full_params()
        delta = extract_delta(params, None, TINY_UNET)
        torch_delta = {
            k: ([torch.from_numpy(np.asarray(x)) for x in v] if k == "embed"
                else torch.from_numpy(np.asarray(v)))
            for k, v in delta.items()
        }
        path = str(tmp_path / "delta.ckpt")
        torch.save({"delta_state_dict": torch_delta}, path)
        loaded = load_delta_torch(path)
        assert set(loaded) == set(delta)
        np.testing.assert_allclose(loaded["embed"][0], delta["embed"][0])
