"""Eval subsystem tests: InceptionV3 vs an inline torch re-derivation,
Frechet distance vs scipy/closed form, CLIP score sanity."""
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
    BN_EPS,
    _STEM,
    _TORCH_NAMES,
    inception_pool3_features,
    init_inception_params,
    load_inception_torch,
)

torch = pytest.importorskip("torch")


# --- torch executor over the same declarative spec ------------------------


def _t_bc(p, x, spec):
    _, _, _, _, stride, (ph, pw) = spec
    w = torch.tensor(np.asarray(p["w"]).transpose(3, 2, 0, 1))
    y = torch.nn.functional.conv2d(x, w, None, stride=stride,
                                   padding=(ph, pw))
    y = torch.nn.functional.batch_norm(
        y,
        torch.tensor(np.asarray(p["bn_mean"])),
        torch.tensor(np.asarray(p["bn_var"])),
        torch.tensor(np.asarray(p["bn_scale"])),
        torch.tensor(np.asarray(p["bn_bias"])),
        training=False, eps=BN_EPS,
    )
    return torch.relu(y)


def _t_chain(bp, names, x, convs):
    for name, c in zip(names, convs):
        x = _t_bc(bp[name], x, (name,) + c)
    return x


def _t_block(bp, kind, spec, x):
    def run(branch):
        return _t_chain(bp, _TORCH_NAMES[kind][branch], x, spec[branch])

    F = torch.nn.functional
    avg = lambda t: F.avg_pool2d(t, 3, 1, 1, count_include_pad=False)
    if kind == "A":
        pool = _t_chain(bp, _TORCH_NAMES[kind]["branch_pool"], avg(x),
                        spec["branch_pool"])
        return torch.cat([run("branch1x1"), run("branch5x5"),
                          run("branch3x3dbl"), pool], 1)
    if kind == "B":
        return torch.cat([run("branch3x3"), run("branch3x3dbl"),
                          F.max_pool2d(x, 3, 2)], 1)
    if kind == "C":
        pool = _t_chain(bp, _TORCH_NAMES[kind]["branch_pool"], avg(x),
                        spec["branch_pool"])
        return torch.cat([run("branch1x1"), run("branch7x7"),
                          run("branch7x7dbl"), pool], 1)
    if kind == "D":
        return torch.cat([run("branch3x3"), run("branch7x7x3"),
                          F.max_pool2d(x, 3, 2)], 1)
    b3 = run("branch3x3")
    b3 = torch.cat([
        _t_chain(bp, _TORCH_NAMES[kind]["branch3x3_a"], b3,
                 spec["branch3x3_a"]),
        _t_chain(bp, _TORCH_NAMES[kind]["branch3x3_b"], b3,
                 spec["branch3x3_b"]),
    ], 1)
    bd = run("branch3x3dbl")
    bd = torch.cat([
        _t_chain(bp, _TORCH_NAMES[kind]["branch3x3dbl_a"], bd,
                 spec["branch3x3dbl_a"]),
        _t_chain(bp, _TORCH_NAMES[kind]["branch3x3dbl_b"], bd,
                 spec["branch3x3dbl_b"]),
    ], 1)
    pooled_in = F.max_pool2d(x, 3, 1, 1) if kind == "E2" else avg(x)
    pool = _t_chain(bp, _TORCH_NAMES[kind]["branch_pool"], pooled_in,
                    spec["branch_pool"])
    return torch.cat([run("branch1x1"), b3, bd, pool], 1)


def _t_forward(params, x):
    F = torch.nn.functional
    for i, spec in enumerate(_STEM):
        x = _t_bc(params[spec[0]], x, spec)
        if i in (2, 4):
            x = F.max_pool2d(x, 3, 2)
    for bname, kind, spec in BLOCKS:
        x = _t_block(params[bname], kind, spec, x)
    return x.mean(dim=(2, 3))


@pytest.fixture(scope="module")
def inception_params():
    return init_inception_params(jax.random.PRNGKey(0))


def test_inception_matches_torch_rederivation(inception_params):
    """Pins the JAX op semantics (conv padding, BN eps, excl-avg/max pools,
    branch concat order) against torch on the full 299^2 graph."""
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 299, 299, 3)).astype(np.float32)
    ours = np.asarray(
        inception_pool3_features(inception_params, jnp.asarray(img),
                                 resize_input=False)
    )
    with torch.no_grad():
        ref = _t_forward(inception_params,
                         torch.tensor(np.transpose(img, (0, 3, 1, 2))))
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
