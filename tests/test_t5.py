"""T5 encoder parity vs HuggingFace T5EncoderModel (random weights).

Reference embedders: FrozenT5Embedder / FrozenByT5Embedder
(sgm/modules/encoders/modules.py:295-374).
"""
import numpy as np
import pytest

from custom_diffusion360_tpu.models.t5 import (
    T5Config,
    byt5_tokenize,
    init_t5_params,
    load_t5_torch,
    t5_encode,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _hf_encoder(gated: bool, vocab=99, d_model=32, d_kv=8, d_ff=64,
                num_layers=3, num_heads=4):
    cfg = transformers.T5Config(
        vocab_size=vocab,
        d_model=d_model,
        d_kv=d_kv,
        d_ff=d_ff,
        num_layers=num_layers,
        num_heads=num_heads,
        feed_forward_proj="gated-gelu" if gated else "relu",
        dropout_rate=0.0,
        # keep the bucket geometry small enough to exercise the log branch
        relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
    )
    torch.manual_seed(0)
    model = transformers.T5EncoderModel(cfg).eval()
    ours_cfg = T5Config(
        vocab_size=vocab, d_model=d_model, d_kv=d_kv, d_ff=d_ff,
        num_layers=num_layers, num_heads=num_heads, gated_ff=gated,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
    )
    return model, ours_cfg


@pytest.mark.parametrize("gated", [True, False])
def test_t5_encoder_matches_hf(gated):
    model, cfg = _hf_encoder(gated)
    params = load_t5_torch(model.state_dict(), cfg)

    rng = np.random.default_rng(1)
    # long enough that relative positions hit the clamped log-bucket branch
    tokens = rng.integers(0, cfg.vocab_size, (2, 33)).astype(np.int32)
    ours = np.asarray(t5_encode(params, tokens, cfg))
    with torch.no_grad():
        # like the reference (modules.py:325-328): input_ids only, no mask
        ref = model(input_ids=torch.tensor(tokens, dtype=torch.long))
    np.testing.assert_allclose(
        ours, ref.last_hidden_state.numpy(), rtol=2e-2, atol=2e-4
    )


def test_t5_encoder_masked_matches_hf():
    model, cfg = _hf_encoder(True)
    params = load_t5_torch(model.state_dict(), cfg)
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, cfg.vocab_size, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    mask[0, 7:] = 0
    ours = np.asarray(t5_encode(params, tokens, cfg, mask=mask))
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(tokens, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()
    # compare unpadded positions only (padded rows differ by design)
    np.testing.assert_allclose(ours[0, :7], ref[0, :7], rtol=2e-2, atol=2e-4)
    np.testing.assert_allclose(ours[1], ref[1], rtol=2e-2, atol=2e-4)


def test_init_t5_params_shapes_roundtrip():
    cfg = T5Config(vocab_size=50, d_model=16, d_kv=4, d_ff=32, num_layers=2,
                   num_heads=4)
    params = init_t5_params(__import__("jax").random.PRNGKey(0), cfg)
    tokens = np.zeros((1, 5), np.int32)
    out = t5_encode(params, tokens, cfg)
    assert out.shape == (1, 5, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_byt5_tokenizer_matches_hf():
    try:
        hf_tok = transformers.ByT5Tokenizer()
    except Exception:
        pytest.skip("ByT5Tokenizer unavailable offline")
    texts = ["a photo of a <new1> car", "héllo ⚡"]
    ids, mask = byt5_tokenize(texts, max_length=24)
    enc = hf_tok(
        texts, truncation=True, max_length=24, padding="max_length",
        return_tensors="np",
    )
    np.testing.assert_array_equal(ids, enc["input_ids"].astype(np.int32))
    np.testing.assert_array_equal(mask, enc["attention_mask"].astype(np.int32))
