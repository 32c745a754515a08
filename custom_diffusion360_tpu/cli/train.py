"""Training CLI.

Equivalent of the reference's main.py: assemble engine + data + trainer, run
the fine-tuning loop (pose params + V* token rows only), log step metrics,
checkpoint periodically, and at the end run the reference-feature capture
pass and export the delta checkpoint + cameras file — everything sample.py
needs.

    python -m custom_diffusion360_tpu.cli.train \\
        --data_root data/co3d --category car --base_ckpt sd_xl_base_1.0.safetensors \\
        --output_dir runs/car0 --max_steps 1610 --batch_size 4

--smoke runs a tiny random-init end-to-end loop on synthetic data (no
dataset or weights needed) — the CI/driver path.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", default="data/co3d")
    p.add_argument("--category", default="car")
    p.add_argument("--single_id", type=int, default=0)
    p.add_argument("--base_ckpt", default=None)
    p.add_argument("--output_dir", default="runs/run0")
    p.add_argument("--name", default="")
    p.add_argument("--max_steps", type=int, default=1610)
    p.add_argument("--batch_size", type=int, default=1, help="per-device batch")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--scale_lr", action="store_true",
                   help="scale lr by devices*batch (main.py:1040-1050)")
    p.add_argument("--trainkeys", default="pose", choices=["pose", "poseattn", "all"])
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--num_images", type=int, default=5)
    p.add_argument("--accumulate", type=int, default=1)
    p.add_argument("--ckpt_every", type=int, default=1600)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--vocab_dir", default=None)
    p.add_argument("--modifier_token", default="<new1>")
    p.add_argument("--reg_dir", default=None)
    p.add_argument("--config", default=None, help="EngineConfig YAML overrides")
    p.add_argument("--override", action="append", default=[])
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest orbax checkpoint in output_dir")
    p.add_argument("--full_ckpt_every", type=int, default=0,
                   help="orbax full-state checkpoint interval (0 = final only)")
    p.add_argument("--sample_every", type=int, default=0,
                   help="write input/recon/sample image grids every N steps")
    p.add_argument("--log_steps_increase", action="store_true",
                   help="also log grids at power-of-two early steps "
                        "(reference ImageLogger increase_log_steps, "
                        "main.py:383,397)")
    p.add_argument("--val_every", type=int, default=0,
                   help="log validation loss every N steps (the reference "
                        "interleaves val epochs into trainer.fit, "
                        "main.py:588-608)")
    p.add_argument("--multihost", action="store_true",
                   help="multi-host run: jax.distributed.initialize(), "
                        "per-process data shards, rank-0-gated writes "
                        "(reference main.py:901-919)")
    p.add_argument("--coordinator", default=None,
                   help="coordinator address for --multihost off-TPU "
                        "(host:port); on TPU pods it is auto-detected")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace for steps [10, 10+N)")
    p.add_argument("--wandb", default=None,
                   help="wandb project name: mirror step metrics to wandb "
                        "(reference main.py:843-875); requires wandb installed")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--smoke_steps", type=int, default=2)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    if args.multihost:
        from ..parallel import init_distributed

        init_distributed(args.coordinator, args.num_processes, args.process_id)
    if not args.multihost:
        # Persistent compile cache, single-process only. Two reasons it is
        # gated: (a) setup touches jax.default_backend(), which initializes
        # the backend and would freeze a 1-process world if it ran before
        # init_distributed; (b) in a multi-process world asymmetric cache
        # hit/miss across ranks (plus cpu_aot_loader feature-check stalls)
        # skews ranks past Gloo's 30 s rendezvous — observed as
        # "Gloo context initialization failed: DEADLINE_EXCEEDED" in
        # tests/test_multihost.py.
        from ..utils.cache import setup_compile_cache

        setup_compile_cache()
    import jax.numpy as jnp

    from ..engine import Engine, EngineConfig
    from ..io.cameras_io import save_cameras_npz
    from ..io.delta import extract_delta, save_delta_npz
    from ..parallel import is_main_process, make_mesh, replicate, shard_batch
    from ..train import (
        MetricsLogger,
        TrainConfig,
        Trainer,
        capture_references,
        ema_init,
        ema_swap,
        ema_update,
        latest_checkpoint,
        restore_train_state,
        save_train_state,
    )
    from ..utils.config import apply_overrides, config_to_dict
    from .sample import make_tokenizers

    os.makedirs(args.output_dir, exist_ok=True)

    cfg = EngineConfig()
    if args.smoke:
        from tests.test_engine import TINY_CFG

        cfg = TINY_CFG
        args.max_steps = args.smoke_steps
        args.img_size = 64
        args.num_images = 3
        args.ckpt_every = max(args.ckpt_every, 10**6)
    if args.config:
        from ..utils.config import load_config

        cfg = load_config(cfg, args.config)
    cfg = apply_overrides(cfg, args.override)
    eng = Engine(cfg)

    n_dev = jax.device_count()
    lr = args.lr
    if args.scale_lr:
        lr = lr * args.accumulate * n_dev * args.batch_size
    trainer = Trainer(
        eng,
        TrainConfig(
            lr=lr,
            trainkeys=args.trainkeys,
            accumulate_grad_batches=args.accumulate,
        ),
    )

    key = jax.random.PRNGKey(args.seed)
    if args.base_ckpt:
        from ..io.torch_convert import load_sdxl_checkpoint

        params = load_sdxl_checkpoint(
            args.base_ckpt, cfg.unet, cfg.vae, cfg.conditioner.clip_l,
            cfg.conditioner.open_clip,
        )
        # seed V* rows from token 42170 (modules.py:428-431)
        from ..models.clip import init_modifier_rows

        params["conditioner"]["clip_l"] = init_modifier_rows(
            params["conditioner"]["clip_l"]
        )
        params["conditioner"]["open_clip"] = init_modifier_rows(
            params["conditioner"]["open_clip"]
        )
    else:
        params = eng.init_params(key)

    # ---- data ----
    tok_clip, tok_open = make_tokenizers(
        args.vocab_dir, context_length=cfg.conditioner.clip_l.context_length
    )
    if args.smoke:
        batches = _synthetic_batches(args, cfg, tok_clip, tok_open)
        train_iter = iter(batches)
        capture_data = None
    else:
        from ..data.co3d import Co3dConfig, Co3dDataset, DataLoader

        dcfg = Co3dConfig(
            root=args.data_root,
            category=args.category,
            single_id=args.single_id,
            img_size=args.img_size,
            num_images=args.num_images,
            modifier_token=args.modifier_token,
            addreg=args.reg_dir is not None,
            reg_dir=args.reg_dir,
        )
        ds = Co3dDataset(dcfg)
        # per-process rows (DDP per-rank split): the global batch is
        # assembled across hosts by shard_batch
        local_rows = jax.local_device_count() * args.batch_size
        loader = DataLoader(
            ds, local_rows, tok_clip, tok_open,
            seed=args.seed + jax.process_index(),
        )
        capture_data = (ds, dcfg)

        def cycle():
            while True:
                yield from loader

        train_iter = cycle()

    mesh = make_mesh() if n_dev > 1 else None
    state = trainer.init_state(params)
    if mesh is not None:
        state = state._replace(
            params=replicate(state.params, mesh),
            opt_state=jax.tree.map(
                lambda x: replicate(x, mesh) if hasattr(x, "shape") else x,
                state.opt_state,
            ),
        )

    is_main = is_main_process()
    if is_main:
        with open(os.path.join(args.output_dir, "config.json"), "w") as f:
            json.dump(config_to_dict(cfg), f, indent=2, default=str)

    ckpt_dir = os.path.join(args.output_dir, "checkpoints")
    if args.resume:
        latest = latest_checkpoint(ckpt_dir)
        if latest:
            state = restore_train_state(latest, state)
            print(f"resumed from {latest} at step {int(state.step)}")

    ema_state = ema_init(state.params, trainer.mask) if args.use_ema else None

    # SIGUSR1 -> checkpoint on demand (the reference's 'melk' handler,
    # main.py:1053-1072)
    import signal

    def melk(*_):
        # orbax save is a collective (every process must enter it); from a
        # signal handler only the single-process case is safe to run
        if jax.process_count() == 1:
            print("SIGUSR1: writing checkpoint")
            save_train_state(ckpt_dir, state)
        elif is_main:
            print("SIGUSR1 ignored under multi-process (collective save "
                  "cannot run from a signal handler)")

    # SIGUSR2 -> drop into the debugger (the reference's 'divein',
    # main.py:1066-1072)
    def divein(*_):
        if is_main:
            import pdb

            pdb.set_trace()

    try:
        signal.signal(signal.SIGUSR1, melk)
        signal.signal(signal.SIGUSR2, divein)
    except (ValueError, OSError):
        pass

    # donate the carried state: without it the old and new params+opt trees
    # coexist and the full-SDXL 512^2 step OOMs a 16 GB v5e chip
    step_fn = jax.jit(trainer.train_step, donate_argnums=(0,))
    val_iter = None
    val_fn = None
    if args.val_every:
        if args.smoke:
            val_batches = _synthetic_batches(args, cfg, tok_clip, tok_open)

            def val_cycle():
                while True:
                    yield from val_batches
        else:
            val_loader = DataLoader(
                ds, local_rows, tok_clip, tok_open,
                seed=args.seed + 10_000 + jax.process_index(),
            )

            def val_cycle():
                while True:
                    yield from val_loader

        val_iter = val_cycle()
        val_fn = jax.jit(
            lambda params, batch, key, step: eng.training_loss(
                params, batch, key, step
            )
        )
    log_images_fn = None
    ema_fn = (
        jax.jit(lambda e, p: ema_update(e, p, args.ema_decay))
        if args.use_ema
        else None
    )
    t_start = time.time()
    images_per_step = n_dev * args.batch_size
    meter = MetricsLogger(
        args.output_dir, images_per_step,
        wandb_project=args.wandb if is_main else None, run_name=args.name,
    )
    start_step = int(state.step)
    profile_dir = os.path.join(args.output_dir, "profile")
    try:
        for step in range(start_step, args.max_steps):
            if args.profile_steps and step == 10 and is_main:
                jax.profiler.start_trace(profile_dir)
            batch = next(train_iter)
            txts = batch.pop("txt", None)
            batch.pop("txt_ref", None)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            key, sub = jax.random.split(key)
            meter.tic()
            state, metrics = step_fn(state, batch, sub)
            jax.block_until_ready(state.params["conditioner"]["clip_l"]["modifier_rows"])
            meter.toc()
            if args.profile_steps and step == 10 + args.profile_steps - 1 and is_main:
                jax.profiler.stop_trace()
                print(f"profiler trace written to {profile_dir}")
            if ema_fn is not None:
                ema_state = ema_fn(ema_state, state.params)
            if (step % args.log_every == 0 or step == args.max_steps - 1) and is_main:
                row = meter.log(step, metrics)
                print(
                    f"step {step}: loss={row.get('loss_total', 0):.4f} "
                    + " ".join(
                        f"{k}={v:.4f}" for k, v in row.items()
                        if k not in ("loss_total", "step")
                    )
                )
            if args.val_every and step and step % args.val_every == 0:
                vbatch = next(val_iter)
                vbatch.pop("txt", None), vbatch.pop("txt_ref", None)
                if mesh is not None:
                    vbatch = shard_batch(vbatch, mesh)
                _, vmetrics = val_fn(
                    state.params, vbatch, jax.random.PRNGKey(step), state.step
                )
                if is_main:
                    row = meter.log(
                        step, {f"val_{k}": v for k, v in vmetrics.items()}
                    )
                    print(
                        f"step {step}: val_loss="
                        f"{row.get('val_loss_total', 0):.4f}"
                    )
            if args.ckpt_every and step and step % args.ckpt_every == 0 and is_main:
                _save_delta(args, eng, state.params, None, cfg, tag=f"step{step}")
            if args.full_ckpt_every and step and step % args.full_ckpt_every == 0:
                # all processes enter: orbax coordinates internally and
                # syncs at the end (rank-gating this deadlocks rank 0)
                save_train_state(ckpt_dir, state)
            # reference ImageLogger schedule (main.py:397,511-517): every
            # batch_freq steps PLUS logarithmically spaced early steps
            # (1, 2, 4, ... batch_freq) when increase_log_steps is on
            log_now = args.sample_every and step and (
                step % args.sample_every == 0
                or (args.log_steps_increase
                    and step <= args.sample_every
                    and (step & (step - 1)) == 0)
            )
            if log_now and is_main:
                from ..train import save_image_grid

                # jitted: eager execution runs the 8-step sampler op-by-op
                # (minutes per grid on a remote-device transport)
                if log_images_fn is None:
                    log_images_fn = jax.jit(
                        lambda p, b_, k: eng.log_images(p, b_, k, num_steps=8)
                    )
                grids = log_images_fn(
                    state.params, batch, jax.random.PRNGKey(step)
                )
                if txts:
                    from ..train.logging import render_text_image

                    grids["conditioning"] = render_text_image(txts)
                for name, imgs in grids.items():
                    path = save_image_grid(
                        os.path.join(
                            args.output_dir, "images", f"{name}_{step:06d}.png"
                        ),
                        np.asarray(imgs),
                    )
                    meter.log_images(step, name, path)
    except KeyboardInterrupt:
        # checkpoint-on-interrupt (the reference's melk/on_exception handlers,
        # main.py:322-329,1053-1072); multi-process: peers may already be
        # gone, so a collective save would hang — skip it there
        if jax.process_count() == 1:
            print("interrupted — writing last checkpoint")
            save_train_state(ckpt_dir, state)
        raise

    # every process enters the (collective) orbax save
    save_train_state(ckpt_dir, state)
    if args.use_ema:
        state = state._replace(params=ema_swap(state.params, ema_state))
    print(f"training done in {time.time()-t_start:.0f}s")

    # ---- capture + delta export (rank 0 writes; capture math is
    # deterministic and replicated across processes) ----
    references = None
    if capture_data is not None:
        references = _run_capture(
            args, eng, state.params, capture_data, tok_clip, tok_open, key,
            write=is_main,
        )
    if is_main:
        _save_delta(args, eng, state.params, references, cfg, tag="last")
        print(f"delta checkpoint written to {args.output_dir}")


def _save_delta(args, eng, params, references, cfg, tag):
    from ..io.delta import extract_delta, save_delta_npz

    host_params = __import__("jax").tree.map(lambda x: x, params)
    delta = extract_delta(host_params, references, cfg.unet)
    save_delta_npz(os.path.join(args.output_dir, f"delta_{tag}.npz"), delta)


def _run_capture(args, eng, params, capture_data, tok_clip, tok_open, key,
                 write=True):
    """Forward the onlyref set through the ref stream, collect per-block
    buffers + export cameras (SURVEY §3.4)."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from ..data.co3d import Co3dConfig, Co3dDataset
    from ..geometry.cameras import stack_cameras
    from ..io.cameras_io import save_cameras_npz
    from ..train import capture_references

    ds, dcfg = capture_data
    cap_cfg = dc.replace(
        dcfg, num_images=2, repeat=1, addlen=True, onlyref=True,
        drop_ratio=0.0, drop_txt=0.0,
    )
    cap_ds = Co3dDataset(cap_cfg)
    rng = np.random.default_rng(0)

    imgs, cams = [], []
    n_items = len(cap_ds) - 1
    for i in range(n_items):
        it = cap_ds.__getitem__(i, rng=rng, validation=True)
        imgs.append(np.asarray(it["image_ref"][0]))
        cams.append(it["cams"][1])  # the captured frame's camera
    images_ref = jnp.asarray(np.stack(imgs))

    it0 = cap_ds.__getitem__(0, rng=rng, validation=True)
    target_cam = it0["cams"][0]
    cam_batch = stack_cameras([target_cam] + cams + [cams[-1]]).reshape(
        1, n_items + 2
    )

    prompt = it0["txt"]
    n_rows = 1 + n_items + 1
    from ..models.conditioner import apply_conditioner

    cond = apply_conditioner(
        params["conditioner"],
        {
            "tokens_clip": jnp.asarray(tok_clip([prompt] * n_rows)),
            "tokens_open": jnp.asarray(tok_open([prompt] * n_rows)),
            "original_size": jnp.full((n_rows, 2), float(args.img_size)),
            "crop_coords": jnp.zeros((n_rows, 2)),
            "target_size": jnp.full((n_rows, 2), float(args.img_size)),
        },
        eng.cfg.conditioner,
        ref=False,
    )
    view_sharding = None
    if jax.device_count() > 1:
        # multi-chip feature extraction: shard the capture views over the
        # largest mesh that divides them (reference: per-rank capture +
        # all_gather, main.py:588-603)
        from ..parallel.mesh import batch_sharding, make_mesh

        # full-mesh only: params already live replicated on all devices and
        # mixing meshes of different sizes is a device-assignment error
        n_views = n_items + 1
        if n_views % jax.device_count() == 0:
            view_sharding = batch_sharding(make_mesh())
    references = capture_references(
        eng, params, images_ref, cam_batch, cond, key,
        view_sharding=view_sharding,
    )

    # cameras export (camera.bin equivalent, main.py:1025-1029)
    if write:
        train_cams = stack_cameras(cams)
        save_cameras_npz(
            os.path.join(args.output_dir, "cameras.npz"),
            train=train_cams,
            val=train_cams,
        )
    return references


def _synthetic_batches(args, cfg, tok_clip, tok_open):
    """Random batches shaped like the CO3D contract (smoke mode)."""
    import jax.numpy as jnp

    from ..geometry.cameras import Cameras
    from ..geometry import stack_cameras

    import jax

    # LOCAL rows: under multi-process, shard_batch assembles the global
    # batch from each process's local rows (like the real loader path)
    rng = np.random.default_rng(jax.process_index())
    b = args.batch_size * max(jax.local_device_count(), 1)
    n = args.num_images - 1
    s = args.img_size
    out = []
    prompt = f"photo of a {args.modifier_token} {args.category}"
    for _ in range(args.max_steps):
        th = rng.uniform(0, 2 * np.pi, (b * (1 + n),))
        R = np.stack(
            [np.array([[np.cos(t), 0, np.sin(t)], [0, 1, 0],
                       [-np.sin(t), 0, np.cos(t)]], np.float32) for t in th]
        )
        cams = Cameras.create(
            R, np.tile(np.array([0, 0, 2.7], np.float32), (b * (1 + n), 1)),
            2.0, 0.0,
        ).reshape(b, 1 + n)
        out.append(
            {
                "image": jnp.asarray(rng.normal(size=(b, s, s, 3)).astype(np.float32) * 0.3),
                "image_ref": jnp.asarray(rng.normal(size=(b, n, s, s, 3)).astype(np.float32) * 0.3),
                "mask": jnp.ones((b, s // 8, s // 8, 1)),
                "mask_ref": jnp.ones((b, n, s // 8, s // 8, 1)),
                "opacity": jnp.ones((b, s // 8, s // 8, 1)),
                "drop_im": jnp.ones((b,)),
                "cams": cams,
                "tokens_clip": jnp.asarray(tok_clip([prompt] * b) % cfg.conditioner.clip_l.vocab_size),
                "tokens_open": jnp.asarray(tok_open([prompt] * b) % cfg.conditioner.open_clip.vocab_size),
                "tokens_clip_ref": jnp.asarray(tok_clip([prompt] * (b * n)) % cfg.conditioner.clip_l.vocab_size),
                "tokens_open_ref": jnp.asarray(tok_open([prompt] * (b * n)) % cfg.conditioner.open_clip.vocab_size),
                "original_size": jnp.full((b, 2), float(s)),
                "crop_coords": jnp.zeros((b, 2)),
                "target_size": jnp.full((b, 2), float(s)),
                "original_size_ref": jnp.full((b * n, 2), float(s)),
                "crop_coords_ref": jnp.zeros((b * n, 2)),
                "target_size_ref": jnp.full((b * n, 2), float(s)),
            }
        )
    return out


if __name__ == "__main__":
    main()
