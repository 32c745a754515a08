"""Pose-conditioned sampling CLI.

Equivalent of the reference's sample.py:201-406: load base SDXL + delta
checkpoint + cameras, pick evenly spaced reference views, build per-target-
pose batches (optionally a camera-interpolation sweep), run 50-step
Euler-EDM with dual CFG, save PNGs.

    python -m custom_diffusion360_tpu.cli.sample \\
        --base_ckpt sd_xl_base_1.0.safetensors --delta_ckpt delta.npz \\
        --cameras cameras.npz --prompt "photo of a <new1> car" \\
        --vocab_dir tokenizer_files/ --output_dir out/

--smoke runs the whole path on a tiny random-init config (no weights needed).
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base_ckpt", default=None, help=".safetensors SDXL base")
    p.add_argument("--delta_ckpt", default=None, help="delta .npz or reference .ckpt")
    p.add_argument("--cameras", default=None, help="cameras .npz (train/val splits)")
    p.add_argument("--prompt", default="photo of a <new1> car")
    p.add_argument("--negative_prompt", default="")
    p.add_argument("--scale", type=float, default=7.5)
    p.add_argument("--scale_im", type=float, default=3.5,
                   help=">0 selects the x3 image+text guider (sample.py:228-240)")
    p.add_argument("--num_steps", type=int, default=50)
    p.add_argument("--sampler", default="euler_edm",
                   choices=["euler_edm", "heun_edm", "euler_ancestral",
                            "dpmpp2s_ancestral", "dpmpp2m", "lms"],
                   help="sampler (reference: config-selectable sampler "
                   "classes; sample.py uses EulerEDM)")
    p.add_argument("--num_ref", type=int, default=8)
    p.add_argument("--batch", type=int, default=1,
                   help="target poses sampled per step (throughput mode; "
                   "reference features are shared across the batch — "
                   "compact tokens + batch-scaled ray chunks keep b=4 at "
                   "1024^2 inside one v5e's HBM)")
    p.add_argument("--num_images", type=int, default=4, help="target poses to sample")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output_dir", default="outputs")
    p.add_argument("--vocab_dir", default=None,
                   help="dir with vocab.json+merges.txt (HF) and/or bpe_simple_vocab_16e6.txt.gz")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--nerf_chunk", type=int, default=4096,
                   help="FeatureNeRF ray-chunk size (4096 = unchunked at "
                        "the shipped hw extents, fastest measured render; "
                        "b>1 row-scales via chunk_rows_ref; training "
                        "uses 512)")
    p.add_argument("--translate", choices=["x", "y", "z", "focal"], default=None)
    p.add_argument("--interp_start", type=float, default=-0.3)
    p.add_argument("--interp_end", type=float, default=0.3)
    p.add_argument("--interp_step", type=float, default=0.1)
    p.add_argument("--override", action="append", default=[],
                   help="config dotlist override, repeatable")
    p.add_argument("--latency_shard", action="store_true",
                   help="multi-chip latency mode: shard the guider's CFG "
                   "copies (and any batch) across all local devices — one "
                   "image's CFG rows run on different chips with a single "
                   "latent-sized combine per step (no-op on one device)")
    p.add_argument("--smoke", action="store_true")
    return p


def make_tokenizers(vocab_dir, context_length: int = 77):
    from ..data.tokenizer import ClipTokenizer, make_test_tokenizer

    if vocab_dir is None:
        tok = make_test_tokenizer(
            ["photo", "of", "a", "car", "chair", "teddybear"],
            additional_special_tokens=("<new1>",),
            context_length=context_length,
        )
        return tok, tok
    hf_vocab = os.path.join(vocab_dir, "vocab.json")
    hf_merges = os.path.join(vocab_dir, "merges.txt")
    oc_merges = os.path.join(vocab_dir, "bpe_simple_vocab_16e6.txt.gz")
    tok_clip = (
        ClipTokenizer.from_hf_files(
            hf_vocab, hf_merges, additional_special_tokens=("<new1>",),
            context_length=context_length,
        )
        if os.path.exists(hf_vocab)
        else ClipTokenizer.from_merges(
            oc_merges, additional_special_tokens=("<new1>",), pad_style="hf",
            context_length=context_length,
        )
    )
    tok_open = ClipTokenizer.from_merges(
        oc_merges, additional_special_tokens=("<new1>",),
        context_length=context_length,
    ) if os.path.exists(oc_merges) else tok_clip
    return tok_clip, tok_open


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    from ..utils.cache import setup_compile_cache

    setup_compile_cache()
    import jax.numpy as jnp

    from ..diffusion import scheduled_cfg_img_text_ref, vanilla_cfg_img_ref
    from ..engine import Engine, EngineConfig
    from ..models.unet import UNetConfig
    from ..geometry.cameras import (
        interpolate_camera_focal,
        interpolate_camera_translation,
        stack_cameras,
    )
    from ..io.cameras_io import load_cameras_npz
    from ..io.delta import apply_delta_state_dict, load_delta_npz, load_delta_torch
    from ..models.conditioner import get_unconditional_conditioning
    from ..utils.config import apply_overrides

    cfg = EngineConfig(
        compute_dtype=args.dtype,
        unet=UNetConfig(
            nerf_dtype=args.dtype, nerf_chunk_size=args.nerf_chunk
        ),
    )
    if args.smoke:
        from tests.test_engine import TINY_CFG

        cfg = dataclasses.replace(TINY_CFG, compute_dtype="float32")
    cfg = apply_overrides(cfg, args.override)
    eng = Engine(cfg)

    key = jax.random.PRNGKey(args.seed)

    # ---- params ----
    if args.base_ckpt:
        from ..io.torch_convert import load_sdxl_checkpoint

        params = load_sdxl_checkpoint(
            args.base_ckpt, cfg.unet, cfg.vae, cfg.conditioner.clip_l,
            cfg.conditioner.open_clip,
        )
        params = {
            "unet": params["unet"], "vae": params["vae"],
            "conditioner": params["conditioner"],
        }
    else:
        params = eng.init_params(key)

    references = None
    if args.delta_ckpt:
        delta = (
            load_delta_npz(args.delta_ckpt)
            if args.delta_ckpt.endswith(".npz")
            else load_delta_torch(args.delta_ckpt)
        )
        params, references = apply_delta_state_dict(params, delta, cfg.unet)

    dtype = jnp.dtype(args.dtype)
    params = jax.tree.map(lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)

    # ---- cameras ----
    if args.cameras:
        splits = load_cameras_npz(args.cameras)
        cams_train, cams_val = splits["train"], splits["val"]
    else:  # smoke: synthetic ring
        from ..geometry.cameras import Cameras

        def ring(n, z=2.7):
            th = np.linspace(0, 2 * np.pi, n, endpoint=False)
            R = np.stack(
                [np.array([[np.cos(t), 0, np.sin(t)], [0, 1, 0],
                           [-np.sin(t), 0, np.cos(t)]], np.float32) for t in th]
            )
            T = np.tile(np.array([0, 0, z], np.float32), (n, 1))
            return Cameras.create(R, T, 2.0, 0.0)

        cams_train, cams_val = ring(20), ring(7)

    n_train = cams_train.batch_shape[0]
    num_ref = min(args.num_ref, n_train)
    max_diff = n_train / num_ref
    choices = [int(x) for x in np.linspace(0, n_train - max_diff, num_ref)]
    ref_cams = cams_train[np.asarray(choices)]

    # ---- conditioning ----
    tok_clip, tok_open = make_tokenizers(
        args.vocab_dir, context_length=cfg.conditioner.clip_l.context_length
    )
    b = max(1, args.batch)

    def cond_batch(prompt):
        return {
            "tokens_clip": jnp.asarray(tok_clip([prompt] * b)),
            "tokens_open": jnp.asarray(tok_open([prompt] * b)),
            "original_size": jnp.full((b, 2), float(args.resolution)),
            "crop_coords": jnp.zeros((b, 2)),
            "target_size": jnp.full((b, 2), float(args.resolution)),
        }

    c, uc = get_unconditional_conditioning(
        params["conditioner"],
        cond_batch(args.prompt),
        cond_batch(args.negative_prompt),
        cfg.conditioner,
        force_uc_zero_txt=bool(args.prompt),
        ref=False,
    )
    c = jax.tree.map(lambda x: x.astype(dtype), c)
    uc = jax.tree.map(lambda x: x.astype(dtype), uc)

    guider = (
        scheduled_cfg_img_text_ref(scale=args.scale, scale_im=args.scale_im)
        if args.scale_im > 0
        else vanilla_cfg_img_ref(scale=args.scale)
    )

    # ---- target poses ----
    rng = np.random.default_rng(args.seed)
    n_val = cams_val.batch_shape[0]
    pose_ids = rng.choice(n_val, min(args.num_images, n_val), replace=False)

    latent = args.resolution // 8
    os.makedirs(args.output_dir, exist_ok=True)
    from PIL import Image

    cfg_sharding = None
    if args.latency_shard and len(jax.devices()) > 1:
        from ..parallel.mesh import batch_sharding, make_mesh

        n_rows = guider.num_copies * b
        n_dev = min(len(jax.devices()), n_rows)
        while n_rows % n_dev:
            n_dev -= 1
        cfg_sharding = batch_sharding(make_mesh(n_dev))

    # one compiled program per run: params/references/cams/cond are jit args
    # (closures over concrete arrays would bake GBs of constants in).
    # Initial noise is derived per JOB index, not per chunk, so a given
    # (seed, pose, sweep-step) gets identical noise at any --batch; with the
    # deterministic samplers (euler_edm/heun_edm/dpmpp2m/lms) the output
    # image is then --batch-invariant too. Ancestral samplers draw their
    # per-step noise per chunk and stay reproducible only for a fixed --batch.
    @jax.jit
    def sample_jit(params, references, cams, c, uc, job_idx):
        noise = jax.vmap(
            lambda i: jax.random.normal(
                jax.random.fold_in(key, i), (latent, latent, 4), jnp.float32
            )
        )(job_idx)
        z = eng.sample(
            params, c, uc, guider, key,
            noise=noise,
            shape=(b, latent, latent, 4),
            cams=cams,
            references=references,
            choices=np.asarray(choices) if references else None,
            num_steps=args.num_steps,
            cfg_sharding=cfg_sharding,
            sampler=args.sampler,
            # cams below are built by tiling the b-row block per CFG copy,
            # so the x3 render dedupe is licensed (Engine.sample docstring)
            shared_target_cams=True,
        )
        return eng.decode_first_stage(params, z.astype(dtype))

    # flatten (pose, sweep-step) jobs, then run them --batch per step: each
    # row carries its own target camera, the reference cameras/features are
    # shared (compact tokens + batch-scaled ray chunks keep b>1 in HBM)
    jobs = []
    for count, pid in enumerate(pose_ids):
        target = cams_val[int(pid) : int(pid) + 1]
        targets = [target]
        if args.translate:
            steps = np.arange(args.interp_start, args.interp_end, args.interp_step)
            if args.translate == "focal":
                targets = [
                    interpolate_camera_focal(target, float(s)) for s in steps
                ]
            else:
                axis = {"x": 0, "y": 1, "z": 2}[args.translate]
                targets = [
                    interpolate_camera_translation(target, axis, float(s))
                    for s in steps
                ]
        for j, tgt in enumerate(targets):
            jobs.append((count, j, tgt[0]))

    for start in range(0, len(jobs), b):
        chunk = jobs[start : start + b]
        real = len(chunk)
        job_idx = list(range(start, start + real))
        while len(chunk) < b:  # pad the ragged tail; extras aren't saved
            chunk.append(chunk[-1])
            job_idx.append(job_idx[-1])
        # cams rows: [target_i | refs] per image, the b-row block repeated
        # per CFG copy (the guider batches copies block-major, sample.py:166-177)
        rows = stack_cameras(
            [
                stack_cameras([tgt] + [ref_cams[i] for i in range(num_ref)])
                for _, _, tgt in chunk
            ]
        )
        cams = jax.tree.map(
            lambda x: jnp.concatenate([x] * guider.num_copies, axis=0), rows
        )
        t0 = time.time()
        img = sample_jit(
            params, references, cams, c, uc, jnp.asarray(job_idx, jnp.int32)
        )
        img = np.asarray(
            jnp.clip((img.astype(jnp.float32) + 1) * 127.5, 0, 255)
        ).astype(np.uint8)
        dt = time.time() - t0
        for r in range(real):
            count, j, _ = chunk[r]
            out_path = os.path.join(
                args.output_dir, f"sample_{count:02d}_{j:02d}.png"
            )
            Image.fromarray(img[r]).save(out_path)
            print(f"saved {out_path} ({dt/real:.1f}s/img)")


if __name__ == "__main__":
    main()
