"""Sampling entry point (parity target: reference sample.py).

Same flag surface and label conventions (+1 shift, per-row classes, 0 as
the CFG null). TPU-native behavior: every batch is generated at ONE padded
compiled shape (`--batch_size`) so the sampler's `lax.scan` compiles once;
the trailing partial batch is trimmed after generation (SURVEY.md §7 "hard
parts": dynamic shapes → pad-and-mask).

Feature wiring (ToMe/FreeU/int8/PAG/DeepCache/classifier/SR/img2img/
restarts/latent) lives in diffusion_models_collection_tpu/pipeline.py —
this file is argument parsing + orchestration + output handling.
"""

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import numpy as np

from diffusion_models_collection_tpu.platform_setup import (
    apply_platform_env,
    configure_compile_cache,
)

apply_platform_env()
configure_compile_cache()

from diffusion_models_collection_tpu.pipeline import (
    SamplingPipeline,
    build_labels,
)
from diffusion_models_collection_tpu.utils.checkpoint import load_checkpoint
from diffusion_models_collection_tpu.utils.helpers import (
    create_gif,
    format_duration,
    load_config,
    make_grid,
    save_image_grid,
    set_seed,
)


def build_parser():
    parser = argparse.ArgumentParser(description="Sample from diffusion models")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="Path to checkpoint")
    parser.add_argument("--config", type=str, default=None,
                        help="Path to config file (if not in checkpoint)")
    parser.add_argument("--sampling_method", type=str, default="ddpm",
                        choices=["ddpm", "ddim", "dpm++", "dpm++sde",
                                 "unipc"],
                        help="Sampling method (dpm++ = DPM-Solver++(2M), "
                             "dpm++sde = its stochastic SDE variant, "
                             "unipc = UniPC predictor-corrector; all "
                             "beyond the reference)")
    parser.add_argument("--num_inference_steps", type=int, default=None,
                        help="Number of inference steps (default: 50 for "
                             "ddim — reference-parity CLI behavior; other "
                             "methods and flow/edm/consistency checkpoints "
                             "default to the config's embedded count)")
    parser.add_argument("--num_samples", type=int, default=64,
                        help="Number of samples to generate")
    parser.add_argument("--batch_size", type=int, default=16,
                        help="Batch size for sampling")
    parser.add_argument("--output_dir", type=str, default="./samples",
                        help="Output directory")
    parser.add_argument("--output_name", type=str, default="samples.png",
                        help="Output filename")
    parser.add_argument("--use_ema", action="store_true",
                        help="Use EMA model if available")
    parser.add_argument("--cfg_scale", type=float, default=0.0,
                        help="Classifier-free guidance scale (0 = no CFG)")
    parser.add_argument("--guidance_rescale", type=float, default=None,
                        help="CFG contrast rescale phi in [0, 1] (Lin et "
                             "al. 2023; overrides the config's "
                             "guidance_rescale key; 0 disables)")
    parser.add_argument("--cfg_interval", type=str, default=None,
                        help="Guide only inside this 'lo,hi' timestep "
                             "interval (Kynkaanniemi et al. 2024); "
                             "overrides the config key")
    parser.add_argument("--labels", type=str, default=None,
                        help="Comma-separated labels for conditional generation")
    parser.add_argument("--seed", type=int, default=42, help="Random seed")
    parser.add_argument("--init_image", type=str, default=None,
                        help="Image-to-image (SDEdit, beyond the reference): "
                             "start from this image instead of pure noise")
    parser.add_argument("--strength", type=float, default=0.8,
                        help="img2img noising strength in [0, 1] "
                             "(1.0 ~ fresh sample, 0.0 returns the input)")
    parser.add_argument("--mask", type=str, default=None,
                        help="Inpainting mask image (white = regenerate, "
                             "black = keep); requires --init_image")
    parser.add_argument("--repaint_jump", type=int, default=0,
                        help="RePaint jump length j (inpainting; requires "
                             "--mask and --sampling_method ddpm)")
    parser.add_argument("--repaint_resample", type=int, default=1,
                        help="RePaint resample count r (Lugmayr et al. "
                             "2022 Alg. 2): denoise j steps, renoise j "
                             "levels, rerun r times — harmonizes the "
                             "inpainted region; 1 = single pass (default)")
    parser.add_argument("--restarts", type=int, default=0,
                        help="Restart Sampling (Xu et al. 2023, beyond "
                             "the reference): re-inject noise and "
                             "re-integrate the DDIM ODE K times inside "
                             "--restart_interval; 0 = plain sampling")
    parser.add_argument("--restart_interval", type=str, default=None,
                        help="'t_min,t_max' training-timestep interval "
                             "for --restarts (must contain >= 2 "
                             "inference-grid points); default: the "
                             "bottom 30%% of the schedule "
                             "(1,0.3*num_timesteps)")
    parser.add_argument("--tome_ratio", type=float, default=0.0,
                        help="Token Merging (ToMe, beyond the reference; "
                             "DiT checkpoints only): merge this fraction "
                             "of patch tokens before every block's "
                             "attention — training-free inference "
                             "speedup; 0 = off")
    parser.add_argument("--tome_mlp", action="store_true",
                        help="extend --tome_ratio merging around each "
                             "block's MLP too (faster, coarser)")
    parser.add_argument("--quantize", type=str, default=None,
                        choices=["int8"],
                        help="w8a8 int8 inference (beyond the reference; "
                             "DiT checkpoints only): contract the block "
                             "matmuls through the MXU int8 path — "
                             "per-token dynamic activation scales, "
                             "weights quantized at compile")
    parser.add_argument("--classifier_checkpoint", type=str, default=None,
                        help="Noise-conditional classifier checkpoint "
                             "(model_type 'classifier') for classifier "
                             "guidance (Dhariwal & Nichol 2021, beyond "
                             "the reference): shifts eps by the "
                             "classifier score toward the target labels")
    parser.add_argument("--classifier_scale", type=float, default=1.0,
                        help="Classifier-guidance strength s (gradient "
                             "scale); used with --classifier_checkpoint")
    parser.add_argument("--pag_scale", type=float, default=0.0,
                        help="Perturbed Attention Guidance strength (Ahn "
                             "et al. 2024, beyond the reference): run the "
                             "same checkpoint with identity attention "
                             "maps and extrapolate away from the degraded "
                             "eps — training-free, works unconditionally, "
                             "stacks with CFG; 0 = off")
    parser.add_argument("--deepcache", type=int, default=0,
                        metavar="INTERVAL",
                        help="DeepCache (Ma et al. 2023, beyond the "
                             "reference; UNet + DDIM only): run the full "
                             "network every INTERVAL steps and only the "
                             "outermost levels in between, reusing the "
                             "cached deep features — training-free "
                             "speedup; 0 = off, 1 = exact plain DDIM")
    parser.add_argument("--deepcache_depth", type=int, default=1,
                        help="How many outer UNet levels stay live on "
                             "cached steps (1 = cache everything below "
                             "the top level; must be < len(channel_mult))")
    parser.add_argument("--freeu", type=str, default=None,
                        metavar="B1,B2,S1,S2",
                        help="FreeU factors (Si et al. 2023, beyond the "
                             "reference; UNet checkpoints only): amplify "
                             "the backbone's first half-channels (b1, b2) "
                             "and Fourier-low-pass the skip features "
                             "(s1, s2) at the two deepest up levels — "
                             "training-free, parameter-free (e.g. "
                             "1.2,1.1,0.9,0.95)")
    parser.add_argument("--sr_source", type=str, default=None,
                        help="Super-resolution conditioning source (image "
                             "file or directory): required for checkpoints "
                             "trained with a super_resolution config block "
                             "— inputs are resized to the LR grid and the "
                             "model generates their high-resolution "
                             "versions (SR3-style, beyond the reference)")
    parser.add_argument("--mixed_precision", type=str, default=None,
                        choices=["bf16", "none"],
                        help="Override the checkpoint config's compute "
                             "dtype (e.g. bf16 inference on an imported "
                             "fp32 .pth checkpoint)")
    parser.add_argument("--device", type=str, default="tpu",
                        help="Accepted for parity; placement is automatic")
    parser.add_argument("--save_intermediate", action="store_true",
                        help="Save intermediate denoising steps")
    parser.add_argument("--create_gif", action="store_true",
                        help="Create GIF of the denoising process")
    parser.add_argument("--gif_fps", type=int, default=20, help="FPS for the GIF")
    parser.add_argument("--gif_final_seconds", type=float, default=2.0,
                        help="Seconds to hold the final frame in the GIF")
    return parser


def main():
    args = build_parser().parse_args()

    rng = set_seed(args.seed)

    print(f"Loading checkpoint from {args.checkpoint}...")
    checkpoint = load_checkpoint(args.checkpoint)
    config = load_config(Path(args.config)) if args.config else checkpoint["config"]

    pipe = SamplingPipeline(args, config, checkpoint)

    nrow = max(1, int(math.sqrt(args.num_samples)))
    num_rows = math.ceil(args.num_samples / nrow)
    labels = build_labels(args, config, nrow, num_rows)

    print(f"Generating {args.num_samples} samples...")
    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    return_all = args.save_intermediate or args.create_gif
    pipe.setup_conditioning(labels, nrow, num_rows)

    num_batches = (args.num_samples + args.batch_size - 1) // args.batch_size
    all_samples, all_intermediates = [], []
    for i in range(num_batches):
        start = i * args.batch_size
        end = min(start + args.batch_size, args.num_samples)
        rng, batch_rng = jax.random.split(rng)

        samples = pipe.run_batch(
            i, num_batches, start, end, batch_rng, labels, return_all
        )
        keep = end - start
        if return_all:
            all_intermediates.append(samples[:, :keep])  # (T, keep, H, W, C)
            all_samples.append(samples[-1, :keep])
        else:
            all_samples.append(samples[:keep])

    all_samples = np.concatenate(all_samples, axis=0)
    all_samples = np.clip((all_samples + 1) / 2, 0, 1)

    output_path = output_dir / args.output_name
    print(f"Saving samples to {output_path}...")
    save_image_grid(all_samples, output_path, nrow=nrow)

    if return_all:
        print("Processing intermediate steps...")
        inter = np.concatenate(all_intermediates, axis=1)  # (T, N, H, W, C)
        inter = np.clip((inter + 1) / 2, 0, 1)
        T = inter.shape[0]

        if args.create_gif:
            gif_path = output_dir / args.output_name.replace(".png", ".gif")
            print(f"Creating GIF at {gif_path}...")
            grid_frames = [make_grid(inter[t], nrow=nrow, padding=2)
                           for t in range(T)]
            if grid_frames and args.gif_final_seconds and args.gif_final_seconds > 0:
                extra = max(1, int(args.gif_fps * float(args.gif_final_seconds)))
                grid_frames.extend([grid_frames[-1]] * extra)
            create_gif(grid_frames, str(gif_path), fps=args.gif_fps)

        if args.save_intermediate:
            intermediate_dir = output_dir / "intermediate"
            intermediate_dir.mkdir(exist_ok=True)
            print(f"Saving intermediate frames to {intermediate_dir}...")
            step_interval = 1 if T <= 100 else T // 50
            for t in range(0, T, step_interval):
                save_image_grid(
                    inter[t], intermediate_dir / f"step_{t:04d}.png", nrow=nrow
                )
            save_image_grid(
                inter[-1], intermediate_dir / f"step_{T - 1:04d}.png", nrow=nrow
            )

    print("Done!")


if __name__ == "__main__":
    start_time = time.time()
    main()
    print(f"Total sampling time: {format_duration(time.time() - start_time)}")
