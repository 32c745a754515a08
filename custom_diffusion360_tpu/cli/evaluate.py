"""Evaluation CLI: FID and CLIP scores for sampled images.

The reference publishes no evaluation code ("Evaluation: to be released",
README.md:114); this implements the paper's metric protocol (arXiv
2404.12333 uses FID-style distribution distance plus CLIP text/image
similarities) over this package's eval subsystem.

    python -m custom_diffusion360_tpu.cli.evaluate \\
        --generated out/samples --real data/car0_views \\
        --prompt "photo of a <new1> car" \\
        --inception_ckpt pt_inception-2015-12-05.pth \\
        --clip_vision_ckpt open_clip_vit_h14.pth --vocab_dir tok/

Metrics are selected by what you provide:
  * --real + --inception_ckpt      -> FID(generated, real)
  * --prompt + CLIP text+vision weights -> CLIP-T (image/prompt similarity)
  * --real + CLIP vision weights   -> CLIP-I (image/image similarity)

--smoke runs all three on random-init tiny towers and synthetic images
(no weights needed) to prove the plumbing.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--generated", default=None,
                   help="dir of generated PNG/JPG images")
    p.add_argument("--real", default=None,
                   help="dir of real concept images (FID / CLIP-I reference)")
    p.add_argument("--prompt", default=None, help="prompt for CLIP-T")
    p.add_argument("--inception_ckpt", default=None,
                   help="pytorch_fid pt_inception .pth (torch state dict)")
    p.add_argument("--clip_vision_ckpt", default=None,
                   help="open_clip checkpoint with visual.* keys")
    p.add_argument("--clip_arch", default="open_clip",
                   choices=["open_clip", "hf"],
                   help="naming inside --clip_vision_ckpt")
    p.add_argument("--clip_text_ckpt", default=None,
                   help="open_clip checkpoint with text-tower keys for "
                        "CLIP-T (may be the same file as the vision ckpt)")
    p.add_argument("--vocab_dir", default=None,
                   help="dir with bpe vocab files (see cli.sample)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--output", default=None, help="write metrics JSON here")
    p.add_argument("--smoke", action="store_true")
    return p


def _list_images(d):
    exts = (".png", ".jpg", ".jpeg", ".webp")
    return sorted(
        os.path.join(d, f) for f in os.listdir(d)
        if f.lower().endswith(exts)
    )


def _load_images(paths, size=None):
    """-> (N, H, W, 3) float32 in [0, 1]."""
    from PIL import Image

    imgs = []
    for p in paths:
        im = Image.open(p).convert("RGB")
        if size is not None:
            im = im.resize((size, size), Image.BICUBIC)
        imgs.append(np.asarray(im, np.float32) / 255.0)
    return np.stack(imgs)


def _batched(fn, images, batch):
    outs = []
    for i in range(0, len(images), batch):
        outs.append(np.asarray(fn(images[i:i + batch])))
    return np.concatenate(outs)


def compute_fid(inception_params, gen, real, batch=8):
    import jax.numpy as jnp

    from ..eval.fid import FeatureStats, fid_from_stats
    from ..eval.inception import inception_pool3_features

    def feats(imgs):
        # pytorch_fid protocol: [0,1] inputs, normalize_input=True maps to
        # the [-1,1] range the published pt_inception weights expect
        return inception_pool3_features(
            inception_params, jnp.asarray(imgs), resize_input=True,
            normalize_input=True,
        )

    s_gen = FeatureStats().update(_batched(feats, gen, batch))
    s_real = FeatureStats().update(_batched(feats, real, batch))
    return fid_from_stats(s_gen, s_real)


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    from ..utils.cache import setup_compile_cache

    setup_compile_cache()
    import jax.numpy as jnp

    from ..eval.clip_score import (
        clip_image_similarity,
        clip_score,
    )
    from ..eval.inception import (
        init_inception_params,
        load_inception_torch,
    )
    from ..models.clip import (
        ClipTextConfig,
        ClipVisionConfig,
        init_clip_text_params,
        init_clip_vision_params,
        load_clip_vision_torch,
    )

    metrics = {}

    if args.smoke:
        rng = np.random.default_rng(0)
        gen = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
        real = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
        inc = init_inception_params(jax.random.PRNGKey(0))
        metrics["fid"] = compute_fid(inc, gen, real, args.batch)
        vcfg = ClipVisionConfig(image_size=16, patch_size=8, width=32,
                                layers=2, heads=4, embed_dim=32)
        tcfg = ClipTextConfig(vocab_size=64, width=32, layers=2, heads=4,
                              context_length=8, text_projection=True)
        vp = init_clip_vision_params(jax.random.PRNGKey(1), vcfg)
        tp = init_clip_text_params(jax.random.PRNGKey(2), tcfg)
        tokens = jnp.asarray(rng.integers(0, 60, (4, 8)), jnp.int32)
        g = jnp.asarray(gen * 2 - 1)
        metrics["clip_t"] = float(
            np.mean(np.asarray(clip_score(vp, tp, g, tokens, vcfg, tcfg)))
        )
        metrics["clip_i"] = float(np.mean(np.asarray(
            clip_image_similarity(vp, g, jnp.asarray(real * 2 - 1), vcfg)
        )))
    else:
        if not args.generated:
            raise SystemExit("--generated is required (or --smoke)")
        gen = _load_images(_list_images(args.generated))
        real = (_load_images(_list_images(args.real), size=gen.shape[1])
                if args.real else None)

        if args.inception_ckpt and real is not None:
            import torch

            sd = torch.load(args.inception_ckpt, map_location="cpu")
            sd = sd.get("state_dict", sd)
            inc = load_inception_torch(sd)
            metrics["fid"] = compute_fid(inc, gen, real, args.batch)

        if args.clip_vision_ckpt:
            import torch

            sd = torch.load(args.clip_vision_ckpt, map_location="cpu")
            sd = sd.get("state_dict", sd)
            vcfg = ClipVisionConfig()  # ViT-H/14 defaults
            vp = load_clip_vision_torch(sd, vcfg, naming=args.clip_arch)
            g = jnp.asarray(gen * 2 - 1)
            if args.prompt:
                import re

                from ..data.tokenizer import ClipTokenizer
                from ..io.torch_convert import convert_open_clip_state_dict

                if args.vocab_dir is None:
                    raise SystemExit(
                        "CLIP-T against real weights needs --vocab_dir "
                        "(the bpe vocab files)"
                    )
                tsd = sd
                if args.clip_text_ckpt and (
                    args.clip_text_ckpt != args.clip_vision_ckpt
                ):
                    tsd = torch.load(args.clip_text_ckpt, map_location="cpu")
                    tsd = tsd.get("state_dict", tsd)
                tsd = {k: np.asarray(v) for k, v in tsd.items()
                       if not k.startswith("visual.")}
                # ViT-H/14 text tower (open_clip): width 1024, 24 layers
                tcfg = ClipTextConfig(width=1024, layers=24, heads=16,
                                      act="gelu", text_projection=True,
                                      num_modifier_tokens=0)
                tp = convert_open_clip_state_dict(tsd, tcfg, prefix="")
                # a vanilla CLIP has no row for the V* token — strip the
                # modifier token from the prompt (standard customization
                # eval protocol) and tokenize WITHOUT the special token so
                # nothing maps past the vocab / hijacks the eot argmax
                prompt = re.sub(r"\s*<new\d+>\s*", " ", args.prompt).strip()
                tok_open = ClipTokenizer.from_merges(
                    os.path.join(args.vocab_dir,
                                 "bpe_simple_vocab_16e6.txt.gz")
                )
                tokens = jnp.asarray(tok_open([prompt] * len(gen)))
                metrics["clip_t"] = float(np.mean(np.asarray(
                    clip_score(vp, tp, g, tokens, vcfg, tcfg)
                )))
            if real is not None:
                r = jnp.asarray(real * 2 - 1)
                n = min(len(gen), len(real))
                metrics["clip_i"] = float(np.mean(np.asarray(
                    clip_image_similarity(vp, g[:n], r[:n], vcfg)
                )))

    print(json.dumps(metrics))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(metrics, f)
    return metrics


if __name__ == "__main__":
    main()
