"""Sampling entry point (parity target: reference sample.py).

Same flag surface and label conventions (+1 shift, per-row classes, 0 as
the CFG null). TPU-native behavior: every batch is generated at ONE padded
compiled shape (`--batch_size`) so the sampler's `lax.scan` compiles once;
the trailing partial batch is trimmed after generation (SURVEY.md §7 "hard
parts": dynamic shapes → pad-and-mask).
"""

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_collection_tpu.platform_setup import apply_platform_env

apply_platform_env()

from diffusion_models_collection_tpu.factory import (
    dp_sampling_sharding,
    eval_model_fn,
    get_diffusion,
    load_model_for_inference,
    sharded_init_noise,
)
from diffusion_models_collection_tpu.utils.checkpoint import load_checkpoint
from diffusion_models_collection_tpu.utils.helpers import (
    create_gif,
    format_duration,
    load_config,
    make_grid,
    resolve_image_size,
    save_image_grid,
    set_seed,
)


def build_labels(args, config, nrow: int, num_rows: int):
    """Per-row class labels with +1 shift (parity: sample.py:131-167)."""
    conditional = config.get("conditional", False)
    num_classes = config.get("num_classes")
    if not conditional:
        return None
    if args.labels:
        row_labels = [int(x.strip()) for x in args.labels.split(",")]
        if num_classes is not None:
            for lbl in row_labels:
                if not (0 <= lbl < num_classes):
                    raise ValueError(
                        f"Label {lbl} is out of range [0, {num_classes})"
                    )
        if len(row_labels) < num_rows:
            row_labels = (row_labels * ((num_rows // len(row_labels)) + 1))[
                :num_rows
            ]
        else:
            row_labels = row_labels[:num_rows]
        labels = np.repeat(np.asarray(row_labels) + 1, nrow)[: args.num_samples]
    elif num_classes is not None:
        rng = np.random.default_rng(args.seed)
        row_labels = rng.integers(0, num_classes, size=num_rows)
        labels = np.repeat(row_labels + 1, nrow)[: args.num_samples]
    else:
        raise ValueError(
            "Conditional generation requires either --labels or known "
            "num_classes."
        )
    print(f"Using conditional generation with labels: {labels.tolist()}")
    return labels.astype(np.int32)


def load_image_for_model(path, image_size, in_channels):
    """Load + resize + normalize an image to the model's [-1,1] NHWC shape."""
    from PIL import Image

    img = Image.open(path)
    img = img.convert("L" if in_channels == 1 else "RGB")
    h, w = image_size
    img = img.resize((w, h), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr[None] * 2.0 - 1.0  # (1, H, W, C) in [-1, 1]


def load_sr_sources(source, lr_hw, in_channels, num_samples):
    """Load LR conditioning images for SR sampling: a single image file
    (repeated) or a directory (sorted, cycled to num_samples). Returns
    (num_samples, lr_h, lr_w, C) in [-1, 1]."""
    src = Path(source)
    if src.is_dir():
        exts = {".png", ".jpg", ".jpeg", ".bmp", ".webp"}
        files = sorted(
            p for p in src.iterdir() if p.suffix.lower() in exts
        )
        if not files:
            raise SystemExit(f"--sr_source directory {src} has no images")
    elif src.is_file():
        files = [src]
    else:
        raise SystemExit(f"--sr_source {src} does not exist")
    imgs = [
        load_image_for_model(files[i % len(files)], lr_hw, in_channels)[0]
        for i in range(num_samples)
    ]
    return np.stack(imgs, axis=0)


def load_mask_for_model(path, image_size):
    """Load an inpainting mask: white = regenerate (1), black = keep (0)."""
    from PIL import Image

    img = Image.open(path).convert("L")
    h, w = image_size
    img = img.resize((w, h), Image.NEAREST)
    arr = (np.asarray(img, np.float32) / 255.0 >= 0.5).astype(np.float32)
    return arr[None, ..., None]  # (1, H, W, 1), broadcast over channels


def main():
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
    args = parser.parse_args()

    rng = set_seed(args.seed)

    print(f"Loading checkpoint from {args.checkpoint}...")
    checkpoint = load_checkpoint(args.checkpoint)
    config = load_config(Path(args.config)) if args.config else checkpoint["config"]

    if str(config.get("model_type", "")).lower() == "classifier":
        raise SystemExit(
            "this is a noise-conditional CLASSIFIER checkpoint — pass it "
            "via --classifier_checkpoint alongside a diffusion checkpoint"
        )

    dtype_key = str(config.get("diffusion_type", "ddpm")).lower()
    is_flow = dtype_key in ("flow", "flow_matching", "rectified_flow")
    is_edm = dtype_key == "edm"
    is_cm = dtype_key == "consistency"
    if args.num_inference_steps is not None:
        if (args.sampling_method.lower() in ("ddim", "dpm++", "dpm++sde",
                                             "unipc")
                or is_flow or is_edm or is_cm):
            config["num_inference_steps"] = args.num_inference_steps
    elif args.sampling_method.lower() == "ddim" and not (
            is_flow or is_edm or is_cm):
        # reference parity: the sample CLI's own DDIM default of 50
        # overrides the checkpoint's embedded count (reference
        # sample.py:69-87); checkpoints that OWN their step count
        # (flow/edm/consistency, distilled students) keep it
        config["num_inference_steps"] = 50
    if args.mixed_precision is not None:
        config["mixed_precision"] = args.mixed_precision
    if args.tome_ratio > 0:
        # Token Merging (ops/tome.py): parameter-free, so it applies to
        # any existing DiT checkpoint — model fields only, params as-is
        if str(config.get("model_type", "")).lower() != "dit":
            raise SystemExit(
                "--tome_ratio is a DiT token-merging knob (the UNet has "
                "no token stream; DiM's scan is already linear in L)"
            )
        mp = dict(config.get("model_params", {}))
        mp["tome_ratio"] = args.tome_ratio
        if args.tome_mlp:
            mp["tome_mlp"] = True
        config["model_params"] = mp
        print(f"Token merging: ratio {args.tome_ratio}"
              + (" (attention + MLP)" if args.tome_mlp else " (attention)"))
    if args.freeu is not None:
        # FreeU (ops/fourier.py + models/unet.py): parameter-free model
        # fields, so any existing UNet checkpoint applies unchanged
        if str(config.get("model_type", "")).lower() != "unet":
            raise SystemExit(
                "--freeu reweights UNet skip connections — DiT/DiM have "
                "no skip-concat up path"
            )
        try:
            factors = tuple(float(v) for v in args.freeu.split(","))
        except ValueError:
            factors = ()
        if len(factors) != 4:
            raise SystemExit("--freeu expects four floats: b1,b2,s1,s2")
        config["model_params"] = dict(
            config.get("model_params", {}), freeu=factors
        )
        print(f"FreeU: b1,b2={factors[0]},{factors[1]} "
              f"s1,s2={factors[2]},{factors[3]}")
    if args.quantize:
        # int8 w8a8 inference (ops/quant.py): parameter-free config-level
        # switch, any fp32 DiT checkpoint applies
        if str(config.get("model_type", "")).lower() != "dit":
            raise SystemExit(
                "--quantize int8 is implemented for DiT checkpoints (the "
                "UNet is conv-bound; int8 convs showed no MXU win)"
            )
        mp = dict(config.get("model_params", {}), quant=args.quantize)
        config["model_params"] = mp
        print(f"Quantized inference: {args.quantize}")
    if args.guidance_rescale is not None:
        config["guidance_rescale"] = args.guidance_rescale
    if args.cfg_interval is not None:
        lo, hi = (int(v) for v in args.cfg_interval.split(","))
        config["cfg_interval"] = (lo, hi)
    config["image_size"] = resolve_image_size(config["image_size"])

    print("Creating model...")
    model, params = load_model_for_inference(checkpoint, config, args.use_ema)
    model_fn = eval_model_fn(model, params)

    # Perturbed Attention Guidance (extension, diffusion/pag.py): wrap
    # the base denoiser BEFORE SR/classifier composition so every later
    # wrapper (and the fused-CFG 2B batch inside the samplers) sees the
    # rectified eps. The perturbed branch is the SAME checkpoint applied
    # through pag_perturb=True model fields — no extra params.
    if args.pag_scale != 0.0:
        if args.pag_scale < 0:
            raise SystemExit("--pag_scale must be >= 0")
        if is_flow or is_edm or is_cm:
            raise SystemExit(
                "PAG extrapolates the VP family's eps predictions — not "
                "flow/edm/consistency checkpoints"
            )
        if str(config.get("prediction_type", "eps")) != "eps":
            raise SystemExit(
                "PAG shifts the EPS prediction; this checkpoint predicts "
                f"{config.get('prediction_type')!r}"
            )
        mt = str(config.get("model_type", "")).lower()
        if mt not in ("unet", "dit"):
            raise SystemExit(
                "PAG perturbs self-attention maps — implemented for UNet "
                f"and DiT checkpoints, not {mt!r} (DiM's Mamba mixer has "
                "no attention map)"
            )
        if mt == "unet" and not config.get("model_params", {}).get(
                "use_attention", True):
            raise SystemExit(
                "PAG perturbs attention maps — this UNet was built with "
                "use_attention: false"
            )
        from diffusion_models_collection_tpu.diffusion.pag import (
            pag_model_fn,
        )
        from diffusion_models_collection_tpu.factory import (
            get_model as _get_model,
        )

        p_config = dict(config)
        p_config["model_params"] = dict(
            config.get("model_params", {}), pag_perturb=True
        )
        p_model = _get_model(p_config)
        perturbed_fn = eval_model_fn(p_model, params)
        model_fn = pag_model_fn(model_fn, perturbed_fn, args.pag_scale)
        print(f"Perturbed Attention Guidance: scale {args.pag_scale}")

    # DeepCache (extension, diffusion/deepcache.py): two extra views of
    # the SAME checkpoint — a 'full' forward that also emits the deep
    # up-path feature, and a 'shallow' forward that splices it back in.
    dc_full_fn = dc_shallow_fn = None
    if args.deepcache > 0:
        if str(config.get("model_type", "")).lower() != "unet":
            raise SystemExit(
                "--deepcache caches UNet deep features across steps — "
                "DiT/DiM have no resolution hierarchy to cache (use "
                "--tome_ratio for DiT)"
            )
        if args.sampling_method.lower() != "ddim" or is_flow or is_edm \
                or is_cm:
            raise SystemExit(
                "--deepcache is implemented on the DDIM trajectory "
                "(--sampling_method ddim on a VP checkpoint)"
            )
        incompatible = [
            (args.save_intermediate or args.create_gif,
             "--save_intermediate/--create_gif (the cached scan returns "
             "final samples only)"),
            (bool(args.init_image), "img2img"),
            (args.restarts > 0, "--restarts"),
            (bool(args.classifier_checkpoint), "classifier guidance"),
            (args.pag_scale != 0.0, "--pag_scale"),
            (bool(args.sr_source), "super-resolution"),
        ]
        for cond, what in incompatible:
            if cond:
                raise SystemExit(f"--deepcache does not compose with {what}")
        n_levels = len(config.get("model_params", {}).get(
            "channel_mult", (1, 2, 2, 2)))
        if not (1 <= args.deepcache_depth <= n_levels - 1):
            raise SystemExit(
                f"--deepcache_depth must be in [1, {n_levels - 1}] for "
                f"this checkpoint's channel_mult"
            )
        from diffusion_models_collection_tpu.factory import (
            get_model as _get_model,
        )

        def _dc_model(mode):
            c = dict(config)
            c["model_params"] = dict(
                config.get("model_params", {}),
                deepcache_mode=mode,
                deepcache_depth=args.deepcache_depth,
            )
            return _get_model(c)

        dc_full_model = _dc_model("full")
        dc_shallow_model = _dc_model("shallow")

        def _full_call(x, t, y):
            return dc_full_model.apply({"params": params}, x, t, y,
                                       train=False)

        def _shallow_call(x, t, y, cache):
            return dc_shallow_model.apply({"params": params}, x, t, y,
                                          train=False, cache=cache)

        dc_full_fn = jax.tree_util.Partial(_full_call)
        dc_shallow_fn = jax.tree_util.Partial(_shallow_call)
        print(f"DeepCache: full pass every {args.deepcache} steps, "
              f"depth {args.deepcache_depth}")

    print(f"Using sampling method: {args.sampling_method.upper()}")
    diffusion = get_diffusion(config, sampling_method=args.sampling_method)

    conditional = config.get("conditional", False)
    nrow = max(1, int(math.sqrt(args.num_samples)))
    num_rows = math.ceil(args.num_samples / nrow)
    labels = build_labels(args, config, nrow, num_rows)

    print(f"Generating {args.num_samples} samples...")
    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    return_all = args.save_intermediate or args.create_gif
    # Latent diffusion (extension): the denoiser samples in the frozen
    # VAE's latent space; pixels appear only after decode.
    from diffusion_models_collection_tpu.utils.latent import LatentCodec

    codec = LatentCodec.from_config(config)
    if codec is not None:
        shape = codec.latent_shape(args.batch_size)
        in_ch = codec.model.in_channels  # pixel channels (for init images)
        print(f"Latent diffusion: sampling {shape[1]}x{shape[2]}x{shape[3]} "
              "latents, decoding through the VAE")
    else:
        h, w = config["image_size"]
        in_ch = config["model_params"]["in_channels"]
        shape = (args.batch_size, h, w, in_ch)  # ONE compiled shape for all batches

    # Classifier guidance (extension, diffusion/guidance.py): load the
    # noise-conditional classifier and build per-sample target labels.
    classifier_fn = None
    if args.classifier_checkpoint:
        if is_flow or is_edm or is_cm:
            raise SystemExit(
                "classifier guidance is defined on the VP (DDPM/DDIM/"
                "DPM++/UniPC) family's eps predictions — not flow/edm/"
                "consistency checkpoints"
            )
        if str(config.get("prediction_type", "eps")) != "eps":
            raise SystemExit(
                "classifier guidance shifts the EPS prediction; this "
                "checkpoint predicts "
                f"{config.get('prediction_type')!r}"
            )
        if config.get("latent_diffusion"):
            raise SystemExit(
                "classifier guidance is defined on pixels — a latent-"
                "diffusion checkpoint samples VAE latents the pixel "
                "classifier cannot score"
            )
        from diffusion_models_collection_tpu.diffusion.guidance import (
            classifier_guided_model_fn,
        )
        from diffusion_models_collection_tpu.factory import get_model

        cls_payload = load_checkpoint(args.classifier_checkpoint)
        cls_config = dict(cls_payload["config"])
        if str(cls_config.get("model_type", "")).lower() != "classifier":
            raise SystemExit(
                "--classifier_checkpoint must be a model_type "
                "'classifier' checkpoint (train one with "
                "utils/classifier_trainer.py through train.py)"
            )
        for key in ("num_timesteps", "beta_start", "beta_end",
                    "beta_schedule"):
            if cls_config.get(key) != config.get(key):
                raise SystemExit(
                    f"classifier/diffusion schedule mismatch on {key!r}: "
                    f"{cls_config.get(key)!r} vs {config.get(key)!r} — "
                    "the classifier must be trained on the same noising "
                    "schedule it guides"
                )
        cls_config["image_size"] = resolve_image_size(
            cls_config["image_size"]
        )
        cls_model = get_model(cls_config)
        cls_params = cls_payload.get("ema_model_state_dict")
        if not args.use_ema or cls_params is None:
            cls_params = cls_payload["model_state_dict"]
        cls_params = jax.tree_util.tree_map(jnp.asarray, cls_params)

        # params as jit-closure constants (the eval_model_fn pattern):
        # transferred once at compile, not re-fed per trajectory call
        def _cls_call(x, t):
            return cls_model.apply({"params": cls_params}, x, t,
                                   train=False)

        classifier_fn = jax.tree_util.Partial(_cls_call)
        cls_num_classes = int(cls_config["num_classes"])
        print(f"Classifier guidance: scale {args.classifier_scale}, "
              f"{cls_num_classes} classes")

    # target labels for the classifier (raw 0..K-1, no +1/null shift)
    guidance_labels_all = None
    if classifier_fn is not None:
        if labels is not None:
            guidance_labels_all = labels.astype(np.int32) - 1
        else:
            fake = {"conditional": True, "num_classes": cls_num_classes}
            guidance_labels_all = build_labels(
                args, fake, nrow, num_rows
            ).astype(np.int32) - 1
        if int(guidance_labels_all.max()) >= cls_num_classes:
            raise SystemExit(
                f"label {int(guidance_labels_all.max())} is out of the "
                f"classifier's range [0, {cls_num_classes})"
            )

    # Super-resolution checkpoints (extension, utils/sr.py): conditioning
    # images are mandatory — the model generates HR versions of them.
    from diffusion_models_collection_tpu.utils import sr as sr_lib

    sr_spec = sr_lib.SRSpec.from_config(config)
    sr_lr_all = None
    if sr_spec is not None:
        if not args.sr_source:
            raise SystemExit(
                "this checkpoint was trained with super_resolution: pass "
                "--sr_source <image|directory> to condition on"
            )
        lr_hw = sr_spec.lr_hw(config["image_size"])
        sr_lr_all = load_sr_sources(
            args.sr_source, lr_hw, in_ch, args.num_samples
        )
        print(f"Super-resolving {len(sr_lr_all)} conditioning images "
              f"{lr_hw} -> {tuple(config['image_size'])} "
              f"(factor {sr_spec.factor})")
    elif args.sr_source:
        raise SystemExit(
            "--sr_source requires a checkpoint trained with a "
            "super_resolution config block"
        )

    init_image = mask = None
    if args.mask and not args.init_image:
        raise SystemExit("--mask requires --init_image")
    if args.repaint_resample > 1 and not args.mask:
        raise SystemExit(
            "--repaint_resample requires --init_image and --mask "
            "(RePaint is an inpainting schedule)"
        )
    if args.restarts > 0:
        if args.sampling_method.lower() != "ddim" or is_flow or is_edm \
                or is_cm:
            raise SystemExit(
                "--restarts is defined on the deterministic DDIM ODE "
                "(--sampling_method ddim on a VP checkpoint)"
            )
        if args.init_image:
            raise SystemExit(
                "--restarts composes with from-noise sampling, not "
                "img2img"
            )
        if float(config.get("ddim_eta", 0.0) or 0.0) != 0.0:
            raise SystemExit("--restarts requires ddim_eta = 0")
    if args.init_image:
        if is_cm:
            raise SystemExit(
                "img2img is not defined for consistency checkpoints "
                "(f(x, t) maps straight to x0 — there is no partial "
                "trajectory to start from)"
            )
        if ((args.sampling_method.lower().startswith("dpm++")
             or args.sampling_method.lower() == "unipc")
                and not (is_flow or is_edm)):
            raise SystemExit(
                "img2img supports --sampling_method ddpm/ddim (and flow/"
                "edm checkpoints), not dpm++/dpm++sde/unipc"
            )
        if not (0.0 < args.strength <= 1.0):
            raise SystemExit("--strength must be in (0, 1] for img2img")
        if args.repaint_resample > 1:
            if not args.mask:
                raise SystemExit("--repaint_resample requires --mask")
            if args.sampling_method.lower() != "ddpm" or is_flow or is_edm:
                raise SystemExit(
                    "RePaint resampling is defined on the DDPM ancestral "
                    "sampler (--sampling_method ddpm)"
                )
            if args.repaint_jump < 1:
                raise SystemExit("--repaint_resample needs --repaint_jump "
                                 ">= 1")
        init_image = load_image_for_model(
            args.init_image, config["image_size"], in_ch
        )
        if args.mask:
            mask = load_mask_for_model(args.mask, config["image_size"])
        print(f"img2img from {args.init_image} at strength {args.strength}"
              + (f" with inpainting mask {args.mask}" if args.mask else ""))

    # On a multi-device host, shard each batch over a 'data' mesh — the
    # jitted trajectory becomes an SPMD program (beyond the single-GPU
    # reference sample.py); trajectories identical to single-device runs.
    dp_sharding = dp_sampling_sharding(args.batch_size)
    if dp_sharding is not None:
        print(f"Sampling data-parallel over {jax.device_count()} devices "
              f"({args.batch_size // jax.device_count()} samples/device)")

    num_batches = (args.num_samples + args.batch_size - 1) // args.batch_size
    all_samples, all_intermediates = [], []
    for i in range(num_batches):
        start = i * args.batch_size
        end = min(start + args.batch_size, args.num_samples)
        rng, batch_rng = jax.random.split(rng)

        if labels is not None:
            batch_labels = labels[start:end]
            # pad partial batch to the compiled shape; extras trimmed below
            if len(batch_labels) < args.batch_size:
                batch_labels = np.pad(
                    batch_labels, (0, args.batch_size - len(batch_labels)),
                    mode="edge",
                )
            batch_labels = jnp.asarray(batch_labels)
        else:
            batch_labels = None

        init_noise = None
        if dp_sharding is not None:
            init_noise = sharded_init_noise(batch_rng, shape, dp_sharding)
            if batch_labels is not None:
                batch_labels = jax.device_put(batch_labels, dp_sharding)

        batch_model_fn = model_fn
        if sr_lr_all is not None:
            cond = sr_lib.batch_condition(
                sr_spec, config["image_size"], sr_lr_all,
                start, end, args.batch_size, batch_rng,
            )
            # cond is a Partial ARG (traced), so batches don't retrace
            batch_model_fn = sr_lib.wrap_model_fn(model_fn, cond)

        if classifier_fn is not None:
            gl = guidance_labels_all[start:end]
            if len(gl) < args.batch_size:
                gl = np.pad(gl, (0, args.batch_size - len(gl)),
                            mode="edge")
            # labels/scale are Partial ARGS (traced): no per-batch retrace
            batch_model_fn = classifier_guided_model_fn(
                batch_model_fn, classifier_fn, jnp.asarray(gl),
                args.classifier_scale, diffusion.schedule,
            )

        if init_image is not None:
            use_cfg = args.cfg_scale > 0 and conditional
            batch_init = jnp.asarray(
                np.repeat(init_image, args.batch_size, axis=0)
            )
            batch_mask = (
                jnp.asarray(np.repeat(mask, args.batch_size, axis=0))
                if mask is not None else None
            )
            if codec is not None:
                if batch_mask is not None:
                    raise SystemExit(
                        "--mask is not supported with latent-diffusion "
                        "checkpoints (pixel masks do not map exactly onto "
                        "the latent grid)"
                    )
                batch_init = codec.encode_mode(batch_init)
            print(f"img2img batch {i + 1}/{num_batches}"
                  + (f" with CFG scale {args.cfg_scale}" if use_cfg else "")
                  + "...")
            repaint_kw = {}
            if args.repaint_resample > 1:
                repaint_kw = dict(repaint_jump=args.repaint_jump,
                                  repaint_resample=args.repaint_resample)
            samples = diffusion.img2img(
                batch_model_fn, batch_init, batch_rng,
                strength=args.strength,
                y=batch_labels,
                cfg_scale=args.cfg_scale if use_cfg else None,
                mask=batch_mask, return_all_timesteps=return_all,
                progress=True, **repaint_kw,
            )
        elif args.restarts > 0:
            if args.restart_interval is not None:
                lo, hi = (int(v) for v in args.restart_interval.split(","))
            else:
                # default: bottom 30% of THIS checkpoint's schedule (the
                # paper restarts low-t intervals; scales with T)
                lo, hi = 1, max(2, int(0.3 * diffusion.num_timesteps))
            use_cfg = args.cfg_scale > 0 and conditional
            print(f"Restart sampling batch {i + 1}/{num_batches} "
                  f"({args.restarts} restarts in [{lo}, {hi}])"
                  + (f" with CFG scale {args.cfg_scale}" if use_cfg
                     else "") + "...")
            samples = diffusion.sample_restart(
                batch_model_fn, shape, batch_rng, y=batch_labels,
                cfg_scale=args.cfg_scale if use_cfg else None,
                restart_interval=(lo, hi), restarts=args.restarts,
                init_noise=init_noise,
                return_all_timesteps=return_all, progress=True,
            )
        elif args.deepcache > 0:
            from diffusion_models_collection_tpu.diffusion.deepcache import (
                deepcache_sample,
            )

            use_cfg = args.cfg_scale > 0 and conditional
            print(f"DeepCache batch {i + 1}/{num_batches} "
                  f"(interval {args.deepcache})"
                  + (f" with CFG scale {args.cfg_scale}" if use_cfg
                     else "") + "...")
            samples = deepcache_sample(
                diffusion, dc_full_fn, dc_shallow_fn, shape, batch_rng,
                y=batch_labels,
                cfg_scale=args.cfg_scale if use_cfg else None,
                interval=args.deepcache, init_noise=init_noise,
            )
        elif args.cfg_scale > 0 and conditional:
            print(f"Sampling batch {i + 1}/{num_batches} with CFG scale "
                  f"{args.cfg_scale}...")
            samples = diffusion.sample_with_cfg(
                batch_model_fn, shape, batch_labels, batch_rng,
                cfg_scale=args.cfg_scale, return_all_timesteps=return_all,
                init_noise=init_noise, progress=True,
            )
        else:
            print(f"Sampling batch {i + 1}/{num_batches}...")
            samples = diffusion.sample(
                batch_model_fn, shape, batch_rng, y=batch_labels,
                return_all_timesteps=return_all, init_noise=init_noise,
                progress=True,
            )

        if codec is not None:
            samples = (
                codec.decode_trajectory(samples) if return_all
                else codec.decode(samples)
            )
        samples = np.asarray(samples)
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
