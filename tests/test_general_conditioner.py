"""GeneralConditioner machine vs the specialized SDXL conditioner + routing
semantics. Reference: sgm/modules/encoders/modules.py:73-230."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.models.clip import ClipTextConfig, clip_text_apply
from custom_diffusion360_tpu.models.conditioner import (
    ConditionerConfig,
    apply_conditioner,
    embed_size_tuple,
    get_unconditional_conditioning,
    init_conditioner_params,
)
from custom_diffusion360_tpu.models.general_conditioner import (
    EmbedderSpec,
    general_conditioner_apply,
    general_get_unconditional_conditioning,
    possibly_apply_legacy_ucg,
)

TINY_L = ClipTextConfig(vocab_size=64, width=32, layers=2, heads=4,
                        context_length=8)
TINY_G = ClipTextConfig(vocab_size=64, width=48, layers=2, heads=4,
                        context_length=8, act="gelu", text_projection=True)
CFG = ConditionerConfig(clip_l=TINY_L, open_clip=TINY_G, size_outdim=16)


def _sdxl_specs():
    def clip_l(p, t):
        return clip_text_apply(p, t, TINY_L)["final"]

    def open_clip(p, t):
        out = clip_text_apply(p, t, TINY_G)
        return out["penultimate"], out["pooled"]

    def size(_, x):
        return embed_size_tuple(x, CFG.size_outdim)

    return [
        EmbedderSpec("clip_l", clip_l,
                     input_keys=("tokens_clip", "tokens_clip_ref")),
        EmbedderSpec("open_clip", open_clip,
                     input_keys=("tokens_open", "tokens_open_ref")),
        EmbedderSpec("size_orig", size,
                     input_keys=("original_size", "original_size_ref")),
        EmbedderSpec("size_crop", size,
                     input_keys=("crop_coords", "crop_coords_ref")),
        EmbedderSpec("size_tgt", size,
                     input_keys=("target_size", "target_size_ref")),
    ]


def _batch(b=2, n=3):
    rng = np.random.default_rng(0)
    mk_t = lambda rows: jnp.asarray(rng.integers(0, 60, (rows, 8)), jnp.int32)
    mk_s = lambda rows: jnp.asarray(rng.uniform(256, 1024, (rows, 2)),
                                    jnp.float32)
    return {
        "tokens_clip": mk_t(b), "tokens_clip_ref": mk_t(b * n),
        "tokens_open": mk_t(b), "tokens_open_ref": mk_t(b * n),
        "original_size": mk_s(b), "original_size_ref": mk_s(b * n),
        "crop_coords": mk_s(b), "crop_coords_ref": mk_s(b * n),
        "target_size": mk_s(b), "target_size_ref": mk_s(b * n),
    }


@pytest.fixture(scope="module")
def cond_params():
    return init_conditioner_params(jax.random.PRNGKey(0), CFG)


def test_general_matches_specialized_sdxl_stack(cond_params):
    batch = _batch()
    want = apply_conditioner(cond_params, batch, CFG)
    got = general_conditioner_apply(cond_params, _sdxl_specs(), batch)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-5, atol=1e-6)


def test_general_force_ref_zero_matches_ref_false(cond_params):
    batch = _batch()
    want = apply_conditioner(cond_params, batch, CFG, ref=False)
    got = general_conditioner_apply(cond_params, _sdxl_specs(), batch,
                                    force_ref_zero_embeddings=True)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-5, atol=1e-6)


def test_general_uc_pair_matches_specialized(cond_params):
    batch = _batch()
    want_c, want_uc = get_unconditional_conditioning(
        cond_params, batch, cfg=CFG, ref=False
    )
    got_c, got_uc = general_get_unconditional_conditioning(
        cond_params, _sdxl_specs(), batch,
        force_uc_zero_embeddings=["tokens_clip", "tokens_open"],
        force_ref_zero_embeddings=True,
    )
    for k in want_c:
        np.testing.assert_allclose(np.asarray(got_c[k]),
                                   np.asarray(want_c[k]), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_uc[k]),
                                   np.asarray(want_uc[k]), rtol=1e-5,
                                   atol=1e-6)


def test_rank_routing_and_concat_key():
    """4-dim outputs route to "concat" (OUTPUT_DIM2KEYS, modules.py:74)."""
    specs = [
        EmbedderSpec("img", lambda _, x: x, input_key="lowres"),
        EmbedderSpec("vec", lambda _, x: x, input_key="cls"),
    ]
    rng = np.random.default_rng(1)
    batch = {
        "lowres": jnp.asarray(rng.normal(size=(2, 4, 4, 3)), jnp.float32),
        "cls": jnp.asarray(rng.normal(size=(2, 8)), jnp.float32),
    }
    out = general_conditioner_apply({}, specs, batch)
    assert out["concat"].shape == (2, 4, 4, 3)
    assert out["vector"].shape == (2, 8)


def test_ucg_dropout_and_force_zero():
    specs = [EmbedderSpec("e", lambda _, x: x, input_key="v", ucg_rate=0.5)]
    x = jnp.ones((64, 4))
    out = general_conditioner_apply({}, specs, {"v": x},
                                    key=jax.random.PRNGKey(0))
    rows = np.asarray(out["vector"])
    zeroed = np.all(rows == 0, axis=-1)
    kept = np.all(rows == 1, axis=-1)
    assert zeroed.any() and kept.any() and (zeroed | kept).all()

    # ucg without a key is an error (silent non-dropout would corrupt runs)
    with pytest.raises(ValueError):
        general_conditioner_apply({}, specs, {"v": x})

    out = general_conditioner_apply(
        {}, [dataclasses.replace(specs[0], ucg_rate=0.0)], {"v": x},
        force_zero_embeddings=["v"],
    )
    assert (np.asarray(out["vector"]) == 0).all()


def test_legacy_ucg_val_host_side():
    spec = EmbedderSpec("e", lambda _, x: x, input_key="txt", ucg_rate=1.0,
                        legacy_ucg_val="")
    batch = {"txt": ["a", "b", "c"]}
    out = possibly_apply_legacy_ucg(spec, batch, np.random.default_rng(0))
    assert out["txt"] == ["", "", ""]
    assert batch["txt"] == ["a", "b", "c"]  # original untouched

    spec0 = dataclasses.replace(spec, ucg_rate=0.0)
    assert possibly_apply_legacy_ucg(spec0, batch,
                                     np.random.default_rng(0))["txt"] == (
        ["a", "b", "c"])


def test_spec_validation():
    with pytest.raises(ValueError):
        EmbedderSpec("bad", lambda _, x: x)
    with pytest.raises(ValueError):
        EmbedderSpec("bad", lambda _, x: x, input_key="a",
                     input_keys=("a", "b"))
