"""Sampling-pipeline builder: composes the inference feature stack.

`sample.py` (and `evaluate.py` for the knobs it shares) exposes ~20
inference flags — ToMe, FreeU, int8, PAG, DeepCache, classifier
guidance, SR conditioning, img2img/inpaint/RePaint, restart sampling,
latent decode — each with its own validation and mutual-exclusion rules.
This module owns that wiring as an explicit composition order:

    config overrides (quant -> ToMe/FreeU -> precision/steps)
    -> base model_fn
    -> PAG wrapper
    -> DeepCache views
    -> per-batch wrappers (SR conditioning -> classifier guidance)
    -> sampler dispatch (img2img / restart / deepcache / cfg / plain)

Each feature validates in its own `_apply_*` / `_build_*` step, so a new
feature lands here as one function + one composition call instead of
another inline block in sample.py's main() (round-2 review finding:
sample.py had grown to 852 lines of inline wiring).

Behavior parity: every message, print and validation below is the
verbatim round-2 sample.py logic — the 32 CLI e2e tests in
tests/test_cli.py pin it.
"""

import math
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .factory import (
    dp_sampling_sharding,
    eval_model_fn,
    get_diffusion,
    load_model_for_inference,
)
from .utils.checkpoint import load_checkpoint
from .utils.helpers import resolve_image_size


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


# ------------------------------------------------------- config overrides
def _apply_steps_and_precision(args, config, flags):
    is_flow, is_edm, is_cm = flags
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


def _apply_tome(args, config):
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


def _apply_freeu(args, config):
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


def _apply_quantize(args, config):
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


def _apply_cfg_knobs(args, config):
    if args.guidance_rescale is not None:
        config["guidance_rescale"] = args.guidance_rescale
    if args.cfg_interval is not None:
        lo, hi = (int(v) for v in args.cfg_interval.split(","))
        config["cfg_interval"] = (lo, hi)


# -------------------------------------------------------- model wrappers
def _wrap_pag(args, config, params, model_fn, flags):
    """Perturbed Attention Guidance (extension, diffusion/pag.py): wrap
    the base denoiser BEFORE SR/classifier composition so every later
    wrapper (and the fused-CFG 2B batch inside the samplers) sees the
    rectified eps. The perturbed branch is the SAME checkpoint applied
    through pag_perturb=True model fields — no extra params."""
    is_flow, is_edm, is_cm = flags
    if args.pag_scale == 0.0:
        return model_fn
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
    from .diffusion.pag import pag_model_fn
    from .factory import get_model as _get_model

    p_config = dict(config)
    p_config["model_params"] = dict(
        config.get("model_params", {}), pag_perturb=True
    )
    p_model = _get_model(p_config)
    perturbed_fn = eval_model_fn(p_model, params)
    out = pag_model_fn(model_fn, perturbed_fn, args.pag_scale)
    print(f"Perturbed Attention Guidance: scale {args.pag_scale}")
    return out


def _build_deepcache(args, config, params, flags, base_wrapped: bool):
    """DeepCache (extension, diffusion/deepcache.py): two extra views of
    the SAME checkpoint — a 'full' forward that also emits the deep
    up-path feature, and a 'shallow' forward that splices it back in.

    `base_wrapped` ties the incompatibility list to the wrapper
    construction sites (advisor round-2 finding): the two DeepCache views
    are built straight from model.apply, so ANY model_fn wrapper (PAG
    today, future ones tomorrow) must be rejected, not silently ignored.
    """
    is_flow, is_edm, is_cm = flags
    if args.deepcache <= 0:
        return None, None
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
    # getattr defaults: evaluate.py shares this builder but exposes only
    # a subset of sample.py's flags (no img2img/gif/restart/classifier)
    incompatible = [
        (getattr(args, "save_intermediate", False)
         or getattr(args, "create_gif", False),
         "--save_intermediate/--create_gif (the cached scan returns "
         "final samples only)"),
        (bool(getattr(args, "init_image", None)), "img2img"),
        (getattr(args, "restarts", 0) > 0, "--restarts"),
        (bool(getattr(args, "classifier_checkpoint", None)),
         "classifier guidance"),
        (args.pag_scale != 0.0, "--pag_scale"),
        (bool(getattr(args, "sr_source", None)), "super-resolution"),
        (base_wrapped, "the active model_fn wrapper"),
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
    from .factory import get_model as _get_model

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

    print(f"DeepCache: full pass every {args.deepcache} steps, "
          f"depth {args.deepcache_depth}")
    return jax.tree_util.Partial(_full_call), jax.tree_util.Partial(
        _shallow_call)


def _build_classifier(args, config, flags, nrow, num_rows, labels):
    """Classifier guidance (extension, diffusion/guidance.py): load the
    noise-conditional classifier and build per-sample target labels
    (raw 0..K-1, no +1/null shift)."""
    is_flow, is_edm, is_cm = flags
    if not args.classifier_checkpoint:
        return None, None
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
    from .factory import get_model

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
    return classifier_fn, guidance_labels_all


def _build_sr(args, config, in_ch):
    """Super-resolution checkpoints (extension, utils/sr.py):
    conditioning images are mandatory — the model generates HR versions
    of them."""
    from .utils import sr as sr_lib

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
    return sr_spec, sr_lr_all


def _validate_editing(args, config, flags, codec, in_ch):
    """img2img / inpainting / RePaint / restart-sampling flag rules."""
    is_flow, is_edm, is_cm = flags
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
    return init_image, mask


# ------------------------------------------------------------ the pipeline
class SamplingPipeline:
    """The composed inference stack behind sample.py.

    Two-stage construction mirrors the CLI's print/validation order
    (pinned by tests/test_cli.py):

      pipe = SamplingPipeline(args, config, checkpoint)   # model stack
      ... build labels / announce sample count ...
      pipe.setup_conditioning(labels, nrow, num_rows)     # codec/SR/cls
      samples = pipe.run_batch(...)                       # per batch
    """

    def __init__(self, args, config, checkpoint):
        self.args = args
        self.config = config

        if str(config.get("model_type", "")).lower() == "classifier":
            raise SystemExit(
                "this is a noise-conditional CLASSIFIER checkpoint — pass "
                "it via --classifier_checkpoint alongside a diffusion "
                "checkpoint"
            )

        dtype_key = str(config.get("diffusion_type", "ddpm")).lower()
        self.is_flow = dtype_key in ("flow", "flow_matching",
                                     "rectified_flow")
        self.is_edm = dtype_key == "edm"
        self.is_cm = dtype_key == "consistency"
        flags = (self.is_flow, self.is_edm, self.is_cm)

        _apply_steps_and_precision(args, config, flags)
        _apply_tome(args, config)
        _apply_freeu(args, config)
        _apply_quantize(args, config)
        _apply_cfg_knobs(args, config)
        config["image_size"] = resolve_image_size(config["image_size"])

        print("Creating model...")
        self.model, self.params = load_model_for_inference(
            checkpoint, config, args.use_ema
        )
        model_fn = eval_model_fn(self.model, self.params)
        wrapped = _wrap_pag(args, config, self.params, model_fn, flags)
        self.dc_full_fn, self.dc_shallow_fn = _build_deepcache(
            args, config, self.params, flags,
            base_wrapped=wrapped is not model_fn,
        )
        self.model_fn = wrapped

        print(f"Using sampling method: {args.sampling_method.upper()}")
        self.diffusion = get_diffusion(
            config, sampling_method=args.sampling_method
        )
        self.conditional = config.get("conditional", False)

    # ------------------------------------------------- conditioning stage
    def setup_conditioning(self, labels, nrow, num_rows):
        args, config = self.args, self.config
        flags = (self.is_flow, self.is_edm, self.is_cm)

        # Latent diffusion (extension): the denoiser samples in the
        # frozen VAE's latent space; pixels appear only after decode.
        from .utils.latent import LatentCodec

        self.codec = LatentCodec.from_config(config)
        if self.codec is not None:
            self.shape = self.codec.latent_shape(args.batch_size)
            # pixel channels (for init images)
            self.in_ch = self.codec.model.in_channels
            print(f"Latent diffusion: sampling "
                  f"{self.shape[1]}x{self.shape[2]}x{self.shape[3]} "
                  "latents, decoding through the VAE")
        else:
            h, w = config["image_size"]
            self.in_ch = config["model_params"]["in_channels"]
            # ONE compiled shape for all batches
            self.shape = (args.batch_size, h, w, self.in_ch)

        self.classifier_fn, self.guidance_labels_all = _build_classifier(
            args, config, flags, nrow, num_rows, labels
        )
        self.sr_spec, self.sr_lr_all = _build_sr(args, config, self.in_ch)
        self.init_image, self.mask = _validate_editing(
            args, config, flags, self.codec, self.in_ch
        )

        # On a multi-device host, shard each batch over a 'data' mesh —
        # the jitted trajectory becomes an SPMD program (beyond the
        # single-GPU reference sample.py); trajectories identical to
        # single-device runs.
        self.dp_sharding = dp_sampling_sharding(args.batch_size)
        if self.dp_sharding is not None:
            print(f"Sampling data-parallel over {jax.device_count()} "
                  f"devices ({args.batch_size // jax.device_count()} "
                  "samples/device)")

    # -------------------------------------------------------- batch stage
    def run_batch(self, i, num_batches, start, end, batch_rng, labels,
                  return_all):
        """Generate one padded batch: compose per-batch wrappers, pick the
        sampler, decode latents. Returns a host ndarray (trajectory-first
        when return_all)."""
        args = self.args
        from .diffusion.guidance import classifier_guided_model_fn
        from .factory import sharded_init_noise
        from .utils import sr as sr_lib

        if labels is not None:
            batch_labels = labels[start:end]
            # pad partial batch to the compiled shape; extras trimmed
            # by the caller
            if len(batch_labels) < args.batch_size:
                batch_labels = np.pad(
                    batch_labels, (0, args.batch_size - len(batch_labels)),
                    mode="edge",
                )
            batch_labels = jnp.asarray(batch_labels)
        else:
            batch_labels = None

        init_noise = None
        if self.dp_sharding is not None:
            init_noise = sharded_init_noise(
                batch_rng, self.shape, self.dp_sharding
            )
            if batch_labels is not None:
                batch_labels = jax.device_put(batch_labels,
                                              self.dp_sharding)

        batch_model_fn = self.model_fn
        if self.sr_lr_all is not None:
            cond = sr_lib.batch_condition(
                self.sr_spec, self.config["image_size"], self.sr_lr_all,
                start, end, args.batch_size, batch_rng,
            )
            # cond is a Partial ARG (traced), so batches don't retrace
            batch_model_fn = sr_lib.wrap_model_fn(self.model_fn, cond)

        if self.classifier_fn is not None:
            gl = self.guidance_labels_all[start:end]
            if len(gl) < args.batch_size:
                gl = np.pad(gl, (0, args.batch_size - len(gl)),
                            mode="edge")
            # labels/scale are Partial ARGS (traced): no per-batch retrace
            batch_model_fn = classifier_guided_model_fn(
                batch_model_fn, self.classifier_fn, jnp.asarray(gl),
                args.classifier_scale, self.diffusion.schedule,
            )

        if self.init_image is not None:
            use_cfg = args.cfg_scale > 0 and self.conditional
            batch_init = jnp.asarray(
                np.repeat(self.init_image, args.batch_size, axis=0)
            )
            batch_mask = (
                jnp.asarray(np.repeat(self.mask, args.batch_size, axis=0))
                if self.mask is not None else None
            )
            if self.codec is not None:
                if batch_mask is not None:
                    raise SystemExit(
                        "--mask is not supported with latent-diffusion "
                        "checkpoints (pixel masks do not map exactly onto "
                        "the latent grid)"
                    )
                batch_init = self.codec.encode_mode(batch_init)
            print(f"img2img batch {i + 1}/{num_batches}"
                  + (f" with CFG scale {args.cfg_scale}" if use_cfg
                     else "") + "...")
            repaint_kw = {}
            if args.repaint_resample > 1:
                repaint_kw = dict(repaint_jump=args.repaint_jump,
                                  repaint_resample=args.repaint_resample)
            samples = self.diffusion.img2img(
                batch_model_fn, batch_init, batch_rng,
                strength=args.strength,
                y=batch_labels,
                cfg_scale=args.cfg_scale if use_cfg else None,
                mask=batch_mask, return_all_timesteps=return_all,
                progress=True, **repaint_kw,
            )
        elif args.restarts > 0:
            if args.restart_interval is not None:
                lo, hi = (int(v)
                          for v in args.restart_interval.split(","))
            else:
                # default: bottom 30% of THIS checkpoint's schedule (the
                # paper restarts low-t intervals; scales with T)
                lo, hi = 1, max(2, int(0.3 * self.diffusion.num_timesteps))
            use_cfg = args.cfg_scale > 0 and self.conditional
            print(f"Restart sampling batch {i + 1}/{num_batches} "
                  f"({args.restarts} restarts in [{lo}, {hi}])"
                  + (f" with CFG scale {args.cfg_scale}" if use_cfg
                     else "") + "...")
            samples = self.diffusion.sample_restart(
                batch_model_fn, self.shape, batch_rng, y=batch_labels,
                cfg_scale=args.cfg_scale if use_cfg else None,
                restart_interval=(lo, hi), restarts=args.restarts,
                init_noise=init_noise,
                return_all_timesteps=return_all, progress=True,
            )
        elif args.deepcache > 0:
            from .diffusion.deepcache import deepcache_sample

            use_cfg = args.cfg_scale > 0 and self.conditional
            print(f"DeepCache batch {i + 1}/{num_batches} "
                  f"(interval {args.deepcache})"
                  + (f" with CFG scale {args.cfg_scale}" if use_cfg
                     else "") + "...")
            samples = deepcache_sample(
                self.diffusion, self.dc_full_fn, self.dc_shallow_fn,
                self.shape, batch_rng,
                y=batch_labels,
                cfg_scale=args.cfg_scale if use_cfg else None,
                interval=args.deepcache, init_noise=init_noise,
            )
        elif args.cfg_scale > 0 and self.conditional:
            print(f"Sampling batch {i + 1}/{num_batches} with CFG scale "
                  f"{args.cfg_scale}...")
            samples = self.diffusion.sample_with_cfg(
                batch_model_fn, self.shape, batch_labels, batch_rng,
                cfg_scale=args.cfg_scale,
                return_all_timesteps=return_all,
                init_noise=init_noise, progress=True,
            )
        else:
            print(f"Sampling batch {i + 1}/{num_batches}...")
            samples = self.diffusion.sample(
                batch_model_fn, self.shape, batch_rng, y=batch_labels,
                return_all_timesteps=return_all, init_noise=init_noise,
                progress=True,
            )

        if self.codec is not None:
            samples = (
                self.codec.decode_trajectory(samples) if return_all
                else self.codec.decode(samples)
            )
        return np.asarray(samples)
