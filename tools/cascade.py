"""Cascaded-diffusion sampling (extension beyond the reference): chain a
base checkpoint with one or more super-resolution checkpoints (Ho et al.
2021 "Cascaded Diffusion Models"; Saharia et al. 2021 "SR3").

Usage:
    python tools/cascade.py \
        --base_checkpoint checkpoints/cifar32/best_model.pth.ckpt \
        --sr_checkpoint checkpoints/sr64/best_model.pth.ckpt \
        [--sr_checkpoint checkpoints/sr128/...]   # chain more stages \
        --num_samples 16 --cfg_scale 1.8

Stage 0 samples the base resolution from noise; every later stage is a
`super_resolution` checkpoint (utils/sr.py) whose LR grid must equal the
previous stage's output size — validated up front. Each stage writes its
own grid (`cascade_stage{k}.png`); the final stage also writes
`--output_name`. Per-stage sampler/steps/CFG are independently
controllable (SR stages typically want little or no guidance).
"""

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_collection_tpu.platform_setup import apply_platform_env

apply_platform_env()

from diffusion_models_collection_tpu.factory import (
    eval_model_fn,
    get_diffusion,
    load_model_for_inference,
)
from diffusion_models_collection_tpu.utils import sr as sr_lib
from diffusion_models_collection_tpu.utils.checkpoint import load_checkpoint
from diffusion_models_collection_tpu.utils.helpers import (
    format_duration,
    resolve_image_size,
    save_image_grid,
    set_seed,
)


def _load_stage(path, use_ema, mixed_precision, num_inference_steps,
                sampling_method):
    """(config, model_fn, diffusion, sr_spec) for one cascade stage."""
    payload = load_checkpoint(path)
    config = dict(payload["config"])
    config["image_size"] = resolve_image_size(config["image_size"])
    if mixed_precision:
        config["mixed_precision"] = mixed_precision
    if num_inference_steps:
        config["num_inference_steps"] = int(num_inference_steps)
    if config.get("latent_diffusion"):
        raise SystemExit(
            "cascade stages must be pixel-space checkpoints (latent "
            "diffusion decodes through its own VAE)"
        )
    model, params = load_model_for_inference(payload, config, use_ema)
    model_fn = eval_model_fn(model, params)
    dtype_key = str(config.get("diffusion_type", "ddpm")).lower()
    method = sampling_method
    if dtype_key not in ("ddpm", "diffusion"):
        method = "ddpm"  # flow/edm/consistency own their samplers
    diffusion = get_diffusion(config, sampling_method=method)
    return config, model_fn, diffusion, sr_lib.SRSpec.from_config(config)


def _sample_stage(diffusion, model_fn, shape, labels, rng, cfg_scale,
                  batch_size, num_samples, desc, make_fn=None):
    """Batched generation at one padded compiled shape; returns
    (num_samples, H, W, C) in [-1, 1]. `make_fn(start, end, batch_rng)`
    optionally builds a per-batch conditioned model callable (SR stages);
    the conditioning rides as a traced Partial arg, so batches share one
    compiled trajectory."""
    out = []
    num_batches = (num_samples + batch_size - 1) // batch_size
    for i in range(num_batches):
        start = i * batch_size
        end = min(start + batch_size, num_samples)
        rng, batch_rng = jax.random.split(rng)
        batch_labels = None
        if labels is not None:
            batch_labels = labels[start:end]
            if len(batch_labels) < batch_size:
                batch_labels = np.pad(
                    batch_labels, (0, batch_size - len(batch_labels)),
                    mode="edge",
                )
            batch_labels = jnp.asarray(batch_labels)
        fn = make_fn(start, end, batch_rng) if make_fn else model_fn
        print(f"{desc}: batch {i + 1}/{num_batches}")
        if cfg_scale and cfg_scale > 0 and batch_labels is not None:
            samples = diffusion.sample_with_cfg(
                fn, shape, batch_labels, batch_rng, cfg_scale=cfg_scale
            )
        else:
            samples = diffusion.sample(
                fn, shape, batch_rng, y=batch_labels
            )
        out.append(np.asarray(samples)[: end - start])
    return np.concatenate(out, axis=0)


def main():
    parser = argparse.ArgumentParser(
        description="Cascaded sampling: base checkpoint + SR stage(s)"
    )
    parser.add_argument("--base_checkpoint", type=str, required=True)
    parser.add_argument("--sr_checkpoint", type=str, action="append",
                        required=True,
                        help="super_resolution checkpoint; repeat the flag "
                             "to chain stages (each LR grid must match the "
                             "previous stage's output size)")
    parser.add_argument("--num_samples", type=int, default=16)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--sampling_method", type=str, default="ddim",
                        choices=["ddpm", "ddim", "dpm++", "dpm++sde",
                                 "unipc"],
                        help="sampler for the base stage (flow/edm/"
                             "consistency checkpoints keep their own)")
    parser.add_argument("--sr_sampling_method", type=str, default="ddim",
                        choices=["ddpm", "ddim", "dpm++", "dpm++sde",
                                 "unipc"],
                        help="sampler for SR stages")
    parser.add_argument("--num_inference_steps", type=int, default=None,
                        help="base-stage step count (default: config)")
    parser.add_argument("--sr_num_inference_steps", type=int, default=None,
                        help="SR-stage step count (default: config)")
    parser.add_argument("--cfg_scale", type=float, default=0.0,
                        help="base-stage CFG scale (0 = no CFG)")
    parser.add_argument("--sr_cfg_scale", type=float, default=0.0,
                        help="SR-stage CFG scale (SR stages usually want "
                             "little or none)")
    parser.add_argument("--labels", type=str, default=None,
                        help="comma-separated class labels, cycled over "
                             "samples (conditional stages)")
    parser.add_argument("--use_ema", action="store_true")
    parser.add_argument("--mixed_precision", type=str, default=None,
                        choices=["bf16", "none"])
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--output_dir", type=str, default="./samples")
    parser.add_argument("--output_name", type=str, default="cascade.png")
    args = parser.parse_args()

    rng = set_seed(args.seed)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    nrow = max(1, int(math.sqrt(args.num_samples)))

    print(f"Loading base stage from {args.base_checkpoint}...")
    base_cfg, base_fn, base_diff, base_sr = _load_stage(
        args.base_checkpoint, args.use_ema, args.mixed_precision,
        args.num_inference_steps, args.sampling_method,
    )
    if base_sr is not None:
        raise SystemExit(
            "--base_checkpoint must be a from-noise checkpoint (it has a "
            "super_resolution block — pass it as --sr_checkpoint instead)"
        )

    stages = []
    prev_hw = tuple(base_cfg["image_size"])
    for k, path in enumerate(args.sr_checkpoint, start=1):
        print(f"Loading SR stage {k} from {path}...")
        cfg, fn, diff, spec = _load_stage(
            path, args.use_ema, args.mixed_precision,
            args.sr_num_inference_steps, args.sr_sampling_method,
        )
        if spec is None:
            raise SystemExit(
                f"--sr_checkpoint {path} has no super_resolution config "
                "block — it cannot consume the previous stage's output"
            )
        lr_hw = spec.lr_hw(cfg["image_size"])
        if lr_hw != prev_hw:
            raise SystemExit(
                f"SR stage {k} expects LR {lr_hw} but the previous stage "
                f"produces {prev_hw}"
            )
        if int(cfg.get("model_params", {}).get("in_channels", 3)) != int(
            base_cfg.get("model_params", {}).get("in_channels", 3)
        ):
            raise SystemExit(
                f"SR stage {k} channel count differs from the base stage"
            )
        stages.append((cfg, fn, diff, spec))
        prev_hw = tuple(cfg["image_size"])

    # labels: one per sample, shared by every conditional stage (+1 shift)
    labels = None
    conditional_cfgs = [c for c in [base_cfg] + [s[0] for s in stages]
                        if c.get("conditional", False)]
    if conditional_cfgs:
        num_classes = min(
            int(c.get("num_classes", 0) or 0) for c in conditional_cfgs
        )
        if args.labels:
            row = [int(x) for x in args.labels.split(",")]
            for lbl in row:
                if not (0 <= lbl < num_classes):
                    raise SystemExit(
                        f"label {lbl} out of range [0, {num_classes})"
                    )
            labels = np.asarray(
                [row[i % len(row)] for i in range(args.num_samples)],
                np.int32,
            ) + 1
        else:
            gen = np.random.default_rng(args.seed)
            labels = gen.integers(
                0, num_classes, size=args.num_samples
            ).astype(np.int32) + 1
        print(f"Labels (+1 shifted): {labels.tolist()}")

    h, w = base_cfg["image_size"]
    in_ch = base_cfg.get("model_params", {}).get("in_channels", 3)
    rng, stage_rng = jax.random.split(rng)
    images = _sample_stage(
        base_diff, base_fn, (args.batch_size, h, w, in_ch),
        labels if base_cfg.get("conditional", False) else None,
        stage_rng, args.cfg_scale, args.batch_size, args.num_samples,
        f"Base stage ({h}x{w})",
    )
    save_image_grid(np.clip((images + 1) / 2, 0, 1),
                    out_dir / "cascade_stage0.png", nrow=nrow)

    for k, (cfg, fn, diff, spec) in enumerate(stages, start=1):
        sh, sw = cfg["image_size"]
        rng, stage_rng = jax.random.split(rng)
        lr_all = images  # the previous stage's output conditions this one

        def make_fn(start, end, batch_rng, fn=fn, cfg=cfg, spec=spec,
                    lr_all=lr_all):
            cond = sr_lib.batch_condition(
                spec, cfg["image_size"], lr_all,
                start, end, args.batch_size, batch_rng,
            )
            return sr_lib.wrap_model_fn(fn, cond)

        images = _sample_stage(
            diff, None, (args.batch_size, sh, sw, in_ch),
            labels if cfg.get("conditional", False) else None,
            stage_rng, args.sr_cfg_scale, args.batch_size,
            args.num_samples, f"SR stage {k} ({sh}x{sw})",
            make_fn=make_fn,
        )
        save_image_grid(np.clip((images + 1) / 2, 0, 1),
                        out_dir / f"cascade_stage{k}.png", nrow=nrow)

    final = out_dir / args.output_name
    save_image_grid(np.clip((images + 1) / 2, 0, 1), final, nrow=nrow)
    print(f"Cascade complete: {final}")


if __name__ == "__main__":
    start = time.time()
    main()
    print(f"Total cascade time: {format_duration(time.time() - start)}")
