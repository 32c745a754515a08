"""Functional InceptionV3 pool3 feature extractor (FID variant).

Reference: the repo wraps pytorch_fid's InceptionV3
(sgm/modules/encoders/modules.py:233-250), which is torchvision's Inception3
with three bug-compatibility patches for the original TF-FID weights:
avg-pools use count_include_pad=False (FIDInceptionA/C/E_1) and Mixed_7c's
pool branch uses a MAX pool (FIDInceptionE_2). This module re-implements the
network functionally in NHWC; parameters are keyed by the torch module names
so pytorch_fid's ``pt_inception-2015-12-05`` checkpoint imports directly via
``load_inception_torch``.

Numerical parity of every op (conv padding, BN eps=1e-3, both pool flavors)
is CI-pinned against an inline torch re-derivation driven by the same
declarative block spec (tests/test_eval.py); end-to-end parity against the
published weights needs the weights file (zero-egress environment).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# (name, cin, cout, (kh, kw), stride, (ph, pw)) per conv of each block.
_STEM = [
    ("Conv2d_1a_3x3", 3, 32, (3, 3), 2, (0, 0)),
    ("Conv2d_2a_3x3", 32, 32, (3, 3), 1, (0, 0)),
    ("Conv2d_2b_3x3", 32, 64, (3, 3), 1, (1, 1)),
    # maxpool1 3x3 s2 sits here
    ("Conv2d_3b_1x1", 64, 80, (1, 1), 1, (0, 0)),
    ("Conv2d_4a_3x3", 80, 192, (3, 3), 1, (0, 0)),
    # maxpool2 3x3 s2 sits here
]


def _inception_a(cin, pool_features):
    return {
        "branch1x1": [(cin, 64, (1, 1), 1, (0, 0))],
        "branch5x5": [(cin, 48, (1, 1), 1, (0, 0)),
                      (48, 64, (5, 5), 1, (2, 2))],
        "branch3x3dbl": [(cin, 64, (1, 1), 1, (0, 0)),
                         (64, 96, (3, 3), 1, (1, 1)),
                         (96, 96, (3, 3), 1, (1, 1))],
        "branch_pool": [(cin, pool_features, (1, 1), 1, (0, 0))],
    }


def _inception_b(cin):
    return {
        "branch3x3": [(cin, 384, (3, 3), 2, (0, 0))],
        "branch3x3dbl": [(cin, 64, (1, 1), 1, (0, 0)),
                         (64, 96, (3, 3), 1, (1, 1)),
                         (96, 96, (3, 3), 2, (0, 0))],
    }


def _inception_c(cin, c7):
    return {
        "branch1x1": [(cin, 192, (1, 1), 1, (0, 0))],
        "branch7x7": [(cin, c7, (1, 1), 1, (0, 0)),
                      (c7, c7, (1, 7), 1, (0, 3)),
                      (c7, 192, (7, 1), 1, (3, 0))],
        "branch7x7dbl": [(cin, c7, (1, 1), 1, (0, 0)),
                         (c7, c7, (7, 1), 1, (3, 0)),
                         (c7, c7, (1, 7), 1, (0, 3)),
                         (c7, c7, (7, 1), 1, (3, 0)),
                         (c7, 192, (1, 7), 1, (0, 3))],
        "branch_pool": [(cin, 192, (1, 1), 1, (0, 0))],
    }


def _inception_d(cin):
    return {
        "branch3x3": [(cin, 192, (1, 1), 1, (0, 0)),
                      (192, 320, (3, 3), 2, (0, 0))],
        "branch7x7x3": [(cin, 192, (1, 1), 1, (0, 0)),
                        (192, 192, (1, 7), 1, (0, 3)),
                        (192, 192, (7, 1), 1, (3, 0)),
                        (192, 192, (3, 3), 2, (0, 0))],
    }


def _inception_e(cin):
    return {
        "branch1x1": [(cin, 320, (1, 1), 1, (0, 0))],
        "branch3x3": [(cin, 384, (1, 1), 1, (0, 0))],
        "branch3x3_a": [(384, 384, (1, 3), 1, (0, 1))],
        "branch3x3_b": [(384, 384, (3, 1), 1, (1, 0))],
        "branch3x3dbl": [(cin, 448, (1, 1), 1, (0, 0)),
                         (448, 384, (3, 3), 1, (1, 1))],
        "branch3x3dbl_a": [(384, 384, (1, 3), 1, (0, 1))],
        "branch3x3dbl_b": [(384, 384, (3, 1), 1, (1, 0))],
        "branch_pool": [(cin, 192, (1, 1), 1, (0, 0))],
    }


# block name -> (kind, spec); kinds drive both apply() and the test's torch
# re-derivation.
BLOCKS = [
    ("Mixed_5b", "A", _inception_a(192, 32)),
    ("Mixed_5c", "A", _inception_a(256, 64)),
    ("Mixed_5d", "A", _inception_a(288, 64)),
    ("Mixed_6a", "B", _inception_b(288)),
    ("Mixed_6b", "C", _inception_c(768, 128)),
    ("Mixed_6c", "C", _inception_c(768, 160)),
    ("Mixed_6d", "C", _inception_c(768, 160)),
    ("Mixed_6e", "C", _inception_c(768, 192)),
    ("Mixed_7a", "D", _inception_d(768)),
    ("Mixed_7b", "E", _inception_e(1280)),
    ("Mixed_7c", "E2", _inception_e(2048)),
]

# torch child-module names per conv in each branch list (for the importer)
_TORCH_NAMES = {
    "A": {"branch1x1": ["branch1x1"],
          "branch5x5": ["branch5x5_1", "branch5x5_2"],
          "branch3x3dbl": ["branch3x3dbl_1", "branch3x3dbl_2",
                           "branch3x3dbl_3"],
          "branch_pool": ["branch_pool"]},
    "B": {"branch3x3": ["branch3x3"],
          "branch3x3dbl": ["branch3x3dbl_1", "branch3x3dbl_2",
                           "branch3x3dbl_3"]},
    "C": {"branch1x1": ["branch1x1"],
          "branch7x7": ["branch7x7_1", "branch7x7_2", "branch7x7_3"],
          "branch7x7dbl": ["branch7x7dbl_1", "branch7x7dbl_2",
                           "branch7x7dbl_3", "branch7x7dbl_4",
                           "branch7x7dbl_5"],
          "branch_pool": ["branch_pool"]},
    "D": {"branch3x3": ["branch3x3_1", "branch3x3_2"],
          "branch7x7x3": ["branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3",
                          "branch7x7x3_4"]},
    "E": {"branch1x1": ["branch1x1"],
          "branch3x3": ["branch3x3_1"],
          "branch3x3_a": ["branch3x3_2a"],
          "branch3x3_b": ["branch3x3_2b"],
          "branch3x3dbl": ["branch3x3dbl_1", "branch3x3dbl_2"],
          "branch3x3dbl_a": ["branch3x3dbl_3a"],
          "branch3x3dbl_b": ["branch3x3dbl_3b"],
          "branch_pool": ["branch_pool"]},
}
_TORCH_NAMES["E2"] = _TORCH_NAMES["E"]

BN_EPS = 1e-3  # torchvision BasicConv2d BatchNorm eps


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _bc_init(key, spec):
    _, cin, cout, (kh, kw), _, _ = spec
    return {
        "w": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
        * (kh * kw * cin) ** -0.5,
        "bn_scale": jnp.ones((cout,), jnp.float32),
        "bn_bias": jnp.zeros((cout,), jnp.float32),
        "bn_mean": jnp.zeros((cout,), jnp.float32),
        "bn_var": jnp.ones((cout,), jnp.float32),
    }


def _bc_apply(p, x, spec):
    """BasicConv2d: conv(bias=False) + BN(eps 1e-3, inference) + relu."""
    _, _, _, _, stride, (ph, pw) = spec
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride, stride),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    inv = jax.lax.rsqrt(p["bn_var"] + BN_EPS) * p["bn_scale"]
    y = y * inv.astype(y.dtype) + (
        p["bn_bias"] - p["bn_mean"] * inv
    ).astype(y.dtype)
    return jax.nn.relu(y)


def _chain(params, names, x, specs):
    for name, spec in zip(names, specs):
        x = _bc_apply(params[name], x, spec)
    return x


def _avg_pool3_excl(x):
    """3x3 stride-1 pad-1 average pool, count_include_pad=False (the
    FIDInception patch)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return s / cnt


def _max_pool3_s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (0, 0), (0, 0), (0, 0)],
    )


# ---------------------------------------------------------------------------
# init / apply / import
# ---------------------------------------------------------------------------


def init_inception_params(key):
    params = {}
    keys = iter(jax.random.split(key, 512))
    for spec in _STEM:
        params[spec[0]] = _bc_init(next(keys), spec)
    for bname, kind, spec in BLOCKS:
        bp = {}
        for branch, convs in spec.items():
            names = _TORCH_NAMES[kind][branch]
            for tname, cspec in zip(names, convs):
                bp[tname] = _bc_init(next(keys), (tname,) + cspec)
        params[bname] = bp
    return params


def _apply_block(bp, kind, spec, x):
    def run(branch):
        return _chain(bp, _TORCH_NAMES[kind][branch], x,
                      [(n,) + c for n, c in
                       zip(_TORCH_NAMES[kind][branch], spec[branch])])

    if kind == "A":
        pool = _chain(bp, _TORCH_NAMES[kind]["branch_pool"],
                      _avg_pool3_excl(x),
                      [("bp",) + spec["branch_pool"][0]])
        return jnp.concatenate(
            [run("branch1x1"), run("branch5x5"), run("branch3x3dbl"), pool],
            axis=-1,
        )
    if kind == "B":
        return jnp.concatenate(
            [run("branch3x3"), run("branch3x3dbl"), _max_pool3_s2(x)],
            axis=-1,
        )
    if kind == "C":
        pool = _chain(bp, _TORCH_NAMES[kind]["branch_pool"],
                      _avg_pool3_excl(x),
                      [("bp",) + spec["branch_pool"][0]])
        return jnp.concatenate(
            [run("branch1x1"), run("branch7x7"), run("branch7x7dbl"), pool],
            axis=-1,
        )
    if kind == "D":
        return jnp.concatenate(
            [run("branch3x3"), run("branch7x7x3"), _max_pool3_s2(x)],
            axis=-1,
        )
    # E / E2
    b3 = run("branch3x3")
    b3 = jnp.concatenate([
        _chain(bp, _TORCH_NAMES[kind]["branch3x3_a"], b3,
               [("a",) + spec["branch3x3_a"][0]]),
        _chain(bp, _TORCH_NAMES[kind]["branch3x3_b"], b3,
               [("b",) + spec["branch3x3_b"][0]]),
    ], axis=-1)
    bd = run("branch3x3dbl")
    bd = jnp.concatenate([
        _chain(bp, _TORCH_NAMES[kind]["branch3x3dbl_a"], bd,
               [("a",) + spec["branch3x3dbl_a"][0]]),
        _chain(bp, _TORCH_NAMES[kind]["branch3x3dbl_b"], bd,
               [("b",) + spec["branch3x3dbl_b"][0]]),
    ], axis=-1)
    # FIDInceptionE_2 (Mixed_7c) uses a MAX pool branch (TF-weights bug
    # compatibility); E_1 (Mixed_7b) uses the exclusive avg pool
    pooled_in = (
        jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )
        if kind == "E2"
        else _avg_pool3_excl(x)
    )
    pool = _chain(bp, _TORCH_NAMES[kind]["branch_pool"], pooled_in,
                  [("bp",) + spec["branch_pool"][0]])
    return jnp.concatenate([run("branch1x1"), b3, bd, pool], axis=-1)


def inception_pool3_features(params, images, resize_input=True,
                             normalize_input=False):
    """images: (B, H, W, 3) NHWC -> (B, 2048) pool3 features.

    resize_input: bilinear to 299 (pytorch_fid InceptionV3.forward);
    normalize_input: maps [0,1] -> [-1,1] (off in the reference wrapper,
    modules.py:237).
    """
    x = images
    if resize_input:
        b, _, _, c = x.shape
        x = jax.image.resize(x, (b, 299, 299, c), method="linear")
    if normalize_input:
        x = 2.0 * x - 1.0

    for i, spec in enumerate(_STEM):
        x = _chain(params, [spec[0]], x, [spec])
        if i in (2, 4):  # after Conv2d_2b and Conv2d_4a
            x = _max_pool3_s2(x)
    for bname, kind, spec in BLOCKS:
        x = _apply_block(params[bname], kind, spec, x)
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1


def load_inception_torch(state_dict):
    """pytorch_fid / torchvision Inception3 state dict -> param pytree.
    Conv weights OIHW -> HWIO; BN running stats come along."""
    import numpy as np

    def arr(name):
        t = state_dict[name]
        return np.asarray(
            t.detach().cpu().numpy() if hasattr(t, "detach") else t,
            dtype=np.float32,
        )

    def bc(prefix):
        return {
            "w": jnp.asarray(arr(f"{prefix}.conv.weight").transpose(2, 3, 1, 0)),
            "bn_scale": jnp.asarray(arr(f"{prefix}.bn.weight")),
            "bn_bias": jnp.asarray(arr(f"{prefix}.bn.bias")),
            "bn_mean": jnp.asarray(arr(f"{prefix}.bn.running_mean")),
            "bn_var": jnp.asarray(arr(f"{prefix}.bn.running_var")),
        }

    params = {spec[0]: bc(spec[0]) for spec in _STEM}
    for bname, kind, spec in BLOCKS:
        bp = {}
        for branch in spec:
            for tname in _TORCH_NAMES[kind][branch]:
                bp[tname] = bc(f"{bname}.{tname}")
        params[bname] = bp
    return params
