"""Eval subsystem tests: InceptionV3 vs an INDEPENDENT torch re-derivation,
Frechet distance vs scipy/closed form, CLIP score sanity.

The torch executor below is hand-transcribed from torchvision's Inception3
(torchvision/models/inception.py) with pytorch_fid's three FID patches
(FIDInceptionA/C/E_1 use count_include_pad=False avg-pools, FIDInceptionE_2
uses a max pool branch). It deliberately shares NOTHING with
eval/inception.py's declarative BLOCKS spec — no imported tables, no spec
walking — so a transcription error in the spec itself (wrong branch wiring,
padding, stride, or channel count) fails parity here instead of passing
self-referentially."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.eval.fid import (
    FeatureStats,
    fid_from_stats,
    frechet_distance,
)
from custom_diffusion360_tpu.eval.inception import (
    BLOCKS,
    _STEM,
    _TORCH_NAMES,
    inception_pool3_features,
    init_inception_params,
    load_inception_torch,
)

torch = pytest.importorskip("torch")


# --- independent torch executor (hand-coded FID-Inception topology) --------
# Conv weight shapes (out, in, kh, kw) per qualified torch name, transcribed
# from torchvision Inception3.__init__ channel math — NOT from our spec.

def _conv_shapes():
    shapes = {
        "Conv2d_1a_3x3": (32, 3, 3, 3),
        "Conv2d_2a_3x3": (32, 32, 3, 3),
        "Conv2d_2b_3x3": (64, 32, 3, 3),
        "Conv2d_3b_1x1": (80, 64, 1, 1),
        "Conv2d_4a_3x3": (192, 80, 3, 3),
    }
    # InceptionA(in_channels, pool_features)
    for pre, cin, pf in (("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64),
                         ("Mixed_5d", 288, 64)):
        shapes.update({
            f"{pre}.branch1x1": (64, cin, 1, 1),
            f"{pre}.branch5x5_1": (48, cin, 1, 1),
            f"{pre}.branch5x5_2": (64, 48, 5, 5),
            f"{pre}.branch3x3dbl_1": (64, cin, 1, 1),
            f"{pre}.branch3x3dbl_2": (96, 64, 3, 3),
            f"{pre}.branch3x3dbl_3": (96, 96, 3, 3),
            f"{pre}.branch_pool": (pf, cin, 1, 1),
        })
    # InceptionB(288)
    shapes.update({
        "Mixed_6a.branch3x3": (384, 288, 3, 3),
        "Mixed_6a.branch3x3dbl_1": (64, 288, 1, 1),
        "Mixed_6a.branch3x3dbl_2": (96, 64, 3, 3),
        "Mixed_6a.branch3x3dbl_3": (96, 96, 3, 3),
    })
    # InceptionC(768, channels_7x7)
    for pre, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160),
                    ("Mixed_6e", 192)):
        shapes.update({
            f"{pre}.branch1x1": (192, 768, 1, 1),
            f"{pre}.branch7x7_1": (c7, 768, 1, 1),
            f"{pre}.branch7x7_2": (c7, c7, 1, 7),
            f"{pre}.branch7x7_3": (192, c7, 7, 1),
            f"{pre}.branch7x7dbl_1": (c7, 768, 1, 1),
            f"{pre}.branch7x7dbl_2": (c7, c7, 7, 1),
            f"{pre}.branch7x7dbl_3": (c7, c7, 1, 7),
            f"{pre}.branch7x7dbl_4": (c7, c7, 7, 1),
            f"{pre}.branch7x7dbl_5": (192, c7, 1, 7),
            f"{pre}.branch_pool": (192, 768, 1, 1),
        })
    # InceptionD(768)
    shapes.update({
        "Mixed_7a.branch3x3_1": (192, 768, 1, 1),
        "Mixed_7a.branch3x3_2": (320, 192, 3, 3),
        "Mixed_7a.branch7x7x3_1": (192, 768, 1, 1),
        "Mixed_7a.branch7x7x3_2": (192, 192, 1, 7),
        "Mixed_7a.branch7x7x3_3": (192, 192, 7, 1),
        "Mixed_7a.branch7x7x3_4": (192, 192, 3, 3),
    })
    # InceptionE(1280) then InceptionE(2048)
    for pre, cin in (("Mixed_7b", 1280), ("Mixed_7c", 2048)):
        shapes.update({
            f"{pre}.branch1x1": (320, cin, 1, 1),
            f"{pre}.branch3x3_1": (384, cin, 1, 1),
            f"{pre}.branch3x3_2a": (384, 384, 1, 3),
            f"{pre}.branch3x3_2b": (384, 384, 3, 1),
            f"{pre}.branch3x3dbl_1": (448, cin, 1, 1),
            f"{pre}.branch3x3dbl_2": (384, 448, 3, 3),
            f"{pre}.branch3x3dbl_3a": (384, 384, 1, 3),
            f"{pre}.branch3x3dbl_3b": (384, 384, 3, 1),
            f"{pre}.branch_pool": (192, cin, 1, 1),
        })
    return shapes


def _make_torch_state_dict(seed=0):
    """Random torch-format FID-Inception checkpoint, shapes hard-coded."""
    rng = np.random.default_rng(seed)
    sd = {}
    for name, (co, ci, kh, kw) in _conv_shapes().items():
        fan = ci * kh * kw
        sd[f"{name}.conv.weight"] = torch.tensor(
            rng.normal(0, fan ** -0.5, (co, ci, kh, kw)).astype(np.float32))
        sd[f"{name}.bn.weight"] = torch.tensor(
            rng.uniform(0.5, 1.5, co).astype(np.float32))
        sd[f"{name}.bn.bias"] = torch.tensor(
            rng.normal(0, 0.1, co).astype(np.float32))
        sd[f"{name}.bn.running_mean"] = torch.tensor(
            rng.normal(0, 0.1, co).astype(np.float32))
        sd[f"{name}.bn.running_var"] = torch.tensor(
            rng.uniform(0.5, 1.5, co).astype(np.float32))
    return sd


def _indep_forward(sd, x):
    """Hand-coded pytorch_fid InceptionV3 dataflow (pool3 features)."""
    F = torch.nn.functional

    def bc(name, x, stride=1, pad=0):
        y = F.conv2d(x, sd[f"{name}.conv.weight"], None, stride=stride,
                     padding=pad)
        y = F.batch_norm(
            y, sd[f"{name}.bn.running_mean"], sd[f"{name}.bn.running_var"],
            sd[f"{name}.bn.weight"], sd[f"{name}.bn.bias"],
            training=False, eps=1e-3)
        return torch.relu(y)

    avg = lambda t: F.avg_pool2d(t, 3, 1, 1, count_include_pad=False)
    x = bc("Conv2d_1a_3x3", x, stride=2)
    x = bc("Conv2d_2a_3x3", x)
    x = bc("Conv2d_2b_3x3", x, pad=1)
    x = F.max_pool2d(x, 3, 2)
    x = bc("Conv2d_3b_1x1", x)
    x = bc("Conv2d_4a_3x3", x)
    x = F.max_pool2d(x, 3, 2)

    def inception_a(pre, x):  # FIDInceptionA
        b1 = bc(f"{pre}.branch1x1", x)
        b5 = bc(f"{pre}.branch5x5_2", bc(f"{pre}.branch5x5_1", x), pad=2)
        bd = bc(f"{pre}.branch3x3dbl_1", x)
        bd = bc(f"{pre}.branch3x3dbl_2", bd, pad=1)
        bd = bc(f"{pre}.branch3x3dbl_3", bd, pad=1)
        bp = bc(f"{pre}.branch_pool", avg(x))
        return torch.cat([b1, b5, bd, bp], 1)

    for pre in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = inception_a(pre, x)
    # InceptionB
    b3 = bc("Mixed_6a.branch3x3", x, stride=2)
    bd = bc("Mixed_6a.branch3x3dbl_1", x)
    bd = bc("Mixed_6a.branch3x3dbl_2", bd, pad=1)
    bd = bc("Mixed_6a.branch3x3dbl_3", bd, stride=2)
    x = torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)

    def inception_c(pre, x):  # FIDInceptionC
        b1 = bc(f"{pre}.branch1x1", x)
        b7 = bc(f"{pre}.branch7x7_1", x)
        b7 = bc(f"{pre}.branch7x7_2", b7, pad=(0, 3))
        b7 = bc(f"{pre}.branch7x7_3", b7, pad=(3, 0))
        bd = bc(f"{pre}.branch7x7dbl_1", x)
        bd = bc(f"{pre}.branch7x7dbl_2", bd, pad=(3, 0))
        bd = bc(f"{pre}.branch7x7dbl_3", bd, pad=(0, 3))
        bd = bc(f"{pre}.branch7x7dbl_4", bd, pad=(3, 0))
        bd = bc(f"{pre}.branch7x7dbl_5", bd, pad=(0, 3))
        bp = bc(f"{pre}.branch_pool", avg(x))
        return torch.cat([b1, b7, bd, bp], 1)

    for pre in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = inception_c(pre, x)
    # InceptionD
    b3 = bc("Mixed_7a.branch3x3_2", bc("Mixed_7a.branch3x3_1", x), stride=2)
    b7 = bc("Mixed_7a.branch7x7x3_1", x)
    b7 = bc("Mixed_7a.branch7x7x3_2", b7, pad=(0, 3))
    b7 = bc("Mixed_7a.branch7x7x3_3", b7, pad=(3, 0))
    b7 = bc("Mixed_7a.branch7x7x3_4", b7, stride=2)
    x = torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)

    def inception_e(pre, x, pool):  # FIDInceptionE_1 (avg) / E_2 (max)
        b1 = bc(f"{pre}.branch1x1", x)
        b3 = bc(f"{pre}.branch3x3_1", x)
        b3 = torch.cat([bc(f"{pre}.branch3x3_2a", b3, pad=(0, 1)),
                        bc(f"{pre}.branch3x3_2b", b3, pad=(1, 0))], 1)
        bd = bc(f"{pre}.branch3x3dbl_2",
                bc(f"{pre}.branch3x3dbl_1", x), pad=1)
        bd = torch.cat([bc(f"{pre}.branch3x3dbl_3a", bd, pad=(0, 1)),
                        bc(f"{pre}.branch3x3dbl_3b", bd, pad=(1, 0))], 1)
        bp = bc(f"{pre}.branch_pool", pool(x))
        return torch.cat([b1, b3, bd, bp], 1)

    x = inception_e("Mixed_7b", x, avg)
    x = inception_e("Mixed_7c", x, lambda t: F.max_pool2d(t, 3, 1, 1))
    return x.mean(dim=(2, 3))


@pytest.fixture(scope="module")
def inception_params():
    return init_inception_params(jax.random.PRNGKey(0))


def test_inception_matches_independent_torch(inception_params):
    """End-to-end parity against the hand-coded executor on the full 299^2
    graph, from a torch-format state dict: catches both op-semantics bugs
    (conv padding, BN eps, excl-avg/max pools, concat order) and
    transcription errors in eval/inception.py's declarative spec itself."""
    del inception_params  # independent path: params come from the state dict
    sd = _make_torch_state_dict(seed=0)
    params = load_inception_torch(
        {k: v.numpy() for k, v in sd.items()})
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 299, 299, 3)).astype(np.float32)
    ours = np.asarray(
        inception_pool3_features(params, jnp.asarray(img),
                                 resize_input=False)
    )
    with torch.no_grad():
        ref = _indep_forward(sd, torch.tensor(np.transpose(img,
                                                           (0, 3, 1, 2))))
    assert ours.shape == (1, 2048)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=5e-2, atol=5e-4)


def test_inception_importer_roundtrip(inception_params):
    """Synthesizes a torch-named state dict and reloads it exactly."""
    sd = {}
    for spec in _STEM:
        name = spec[0]
        p = inception_params[name]
        sd[f"{name}.conv.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        sd[f"{name}.bn.weight"] = np.asarray(p["bn_scale"])
        sd[f"{name}.bn.bias"] = np.asarray(p["bn_bias"])
        sd[f"{name}.bn.running_mean"] = np.asarray(p["bn_mean"])
        sd[f"{name}.bn.running_var"] = np.asarray(p["bn_var"])
    for bname, kind, spec in BLOCKS:
        for branch in spec:
            for tname in _TORCH_NAMES[kind][branch]:
                p = inception_params[bname][tname]
                pre = f"{bname}.{tname}"
                sd[f"{pre}.conv.weight"] = np.asarray(p["w"]).transpose(
                    3, 2, 0, 1)
                sd[f"{pre}.bn.weight"] = np.asarray(p["bn_scale"])
                sd[f"{pre}.bn.bias"] = np.asarray(p["bn_bias"])
                sd[f"{pre}.bn.running_mean"] = np.asarray(p["bn_mean"])
                sd[f"{pre}.bn.running_var"] = np.asarray(p["bn_var"])
    loaded = load_inception_torch(sd)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        inception_params, loaded,
    )


def test_inception_resize_and_normalize(inception_params):
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    out = inception_pool3_features(inception_params, jnp.asarray(img),
                                   resize_input=True, normalize_input=True)
    assert out.shape == (2, 2048)
    assert np.isfinite(np.asarray(out)).all()


# --- FID math ---------------------------------------------------------------


def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(8, 8))
    cov = a @ a.T + np.eye(8)
    mu = rng.normal(size=8)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6


def test_frechet_distance_matches_scipy():
    scipy_linalg = pytest.importorskip("scipy.linalg")
    rng = np.random.default_rng(3)
    a = rng.normal(size=(6, 6))
    b = rng.normal(size=(6, 6))
    cov1 = a @ a.T + 0.5 * np.eye(6)
    cov2 = b @ b.T + 0.5 * np.eye(6)
    mu1, mu2 = rng.normal(size=6), rng.normal(size=6)
    ours = frechet_distance(mu1, cov1, mu2, cov2)
    covmean = scipy_linalg.sqrtm(cov1 @ cov2)
    ref = (np.sum((mu1 - mu2) ** 2) + np.trace(cov1) + np.trace(cov2)
           - 2 * np.trace(covmean.real))
    assert np.allclose(ours, ref, rtol=1e-6)


def test_feature_stats_single_sample_errors():
    stats = FeatureStats().update(np.zeros((1, 4)))
    with pytest.raises(ValueError, match="at least 2"):
        _ = stats.cov


def test_feature_stats_streaming_matches_numpy():
    rng = np.random.default_rng(4)
    feats = rng.normal(size=(100, 5))
    stats = FeatureStats()
    for chunk in np.split(feats, 4):
        stats.update(chunk)
    np.testing.assert_allclose(stats.mean, feats.mean(0), rtol=1e-10)
    np.testing.assert_allclose(stats.cov, np.cov(feats, rowvar=False),
                               rtol=1e-8)
    other = FeatureStats().update(rng.normal(size=(80, 5)) + 1.0)
    fid = fid_from_stats(stats, other)
    assert fid > 0


# --- CLIP score -------------------------------------------------------------


def test_evaluate_cli_smoke():
    from custom_diffusion360_tpu.cli.evaluate import main

    metrics = main(["--smoke"])
    assert set(metrics) == {"fid", "clip_t", "clip_i"}
    assert all(np.isfinite(v) for v in metrics.values())


def test_evaluate_cli_fid_from_files(tmp_path, inception_params):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from custom_diffusion360_tpu.cli.evaluate import main

    rng = np.random.default_rng(7)
    for d, shift in (("gen", 0), ("real", 60)):
        (tmp_path / d).mkdir()
        for i in range(3):
            arr = rng.integers(shift, 196 + shift, (16, 16, 3)).astype(
                np.uint8)
            Image.fromarray(arr).save(tmp_path / d / f"{i}.png")

    # synthesize a torch-format inception checkpoint
    sd = {}
    for spec in _STEM:
        name = spec[0]
        p = inception_params[name]
        sd[f"{name}.conv.weight"] = torch.tensor(
            np.asarray(p["w"]).transpose(3, 2, 0, 1))
        sd[f"{name}.bn.weight"] = torch.tensor(np.asarray(p["bn_scale"]))
        sd[f"{name}.bn.bias"] = torch.tensor(np.asarray(p["bn_bias"]))
        sd[f"{name}.bn.running_mean"] = torch.tensor(np.asarray(p["bn_mean"]))
        sd[f"{name}.bn.running_var"] = torch.tensor(np.asarray(p["bn_var"]))
    for bname, kind, spec in BLOCKS:
        for branch in spec:
            for tname in _TORCH_NAMES[kind][branch]:
                p = inception_params[bname][tname]
                pre = f"{bname}.{tname}"
                sd[f"{pre}.conv.weight"] = torch.tensor(
                    np.asarray(p["w"]).transpose(3, 2, 0, 1))
                sd[f"{pre}.bn.weight"] = torch.tensor(
                    np.asarray(p["bn_scale"]))
                sd[f"{pre}.bn.bias"] = torch.tensor(np.asarray(p["bn_bias"]))
                sd[f"{pre}.bn.running_mean"] = torch.tensor(
                    np.asarray(p["bn_mean"]))
                sd[f"{pre}.bn.running_var"] = torch.tensor(
                    np.asarray(p["bn_var"]))
    ckpt = tmp_path / "inception.pth"
    torch.save(sd, ckpt)

    metrics = main([
        "--generated", str(tmp_path / "gen"),
        "--real", str(tmp_path / "real"),
        "--inception_ckpt", str(ckpt),
        "--output", str(tmp_path / "metrics.json"),
    ])
    same = main([
        "--generated", str(tmp_path / "gen"),
        "--real", str(tmp_path / "gen"),
        "--inception_ckpt", str(ckpt),
    ])
    # 3-sample, 2048-d stats are rank-deficient: allow numerical slack, but
    # distinct dirs must measure farther than the dir against itself (~0)
    assert np.isfinite(metrics["fid"])
    assert abs(same["fid"]) < 1e-3
    assert metrics["fid"] > same["fid"] - 1e-6
    import json

    assert "fid" in json.load(open(tmp_path / "metrics.json"))


def test_clip_scores():
    from custom_diffusion360_tpu.eval.clip_score import (
        clip_image_similarity,
        clip_score,
    )
    from custom_diffusion360_tpu.models.clip import (
        ClipTextConfig,
        ClipVisionConfig,
        init_clip_text_params,
        init_clip_vision_params,
    )

    vcfg = ClipVisionConfig(image_size=16, patch_size=8, width=32, layers=2,
                            heads=4, embed_dim=12)
    tcfg = ClipTextConfig(vocab_size=64, width=32, layers=2, heads=4,
                          context_length=8, text_projection=True)
    # match projection dims for the similarity
    vcfg = ClipVisionConfig(**{**vcfg.__dict__, "embed_dim": 32})
    vp = init_clip_vision_params(jax.random.PRNGKey(0), vcfg)
    tp = init_clip_text_params(jax.random.PRNGKey(1), tcfg)
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(-1, 1, (2, 20, 20, 3)), jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 60, (2, 8)), jnp.int32)

    s = np.asarray(clip_score(vp, tp, img, tokens, vcfg, tcfg))
    assert s.shape == (2,) and (np.abs(s) <= 1 + 1e-5).all()

    sim = np.asarray(clip_image_similarity(vp, img, img, vcfg))
    np.testing.assert_allclose(sim, 1.0, atol=1e-5)
