"""Composition helpers shared by the train/sample/evaluate CLIs.

Parity targets: reference train.py:27-128 (get_model / get_diffusion /
get_dataset / get_dataloader) and sample.py:42-64 (sampling-method switch).
These are the only places where models, diffusion processes and data meet —
preserving the reference's key invariant that the layers below never import
each other.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .datasets import CustomImageDataset, DataLoader, DiffusionDataset
from .diffusion import (
    DDIM,
    DDPM,
    DPMSolverPP,
    EDM,
    ConsistencyModel,
    FlowMatching,
    UniPC,
)
from .models import DiM, DiT, NoisyClassifier, UNet, VAE
from .parallel import mesh as pmesh
from .utils.helpers import resolve_image_size

MODEL_CLASSES = {
    "unet": UNet,
    "dit": DiT,
    "dim": DiM,
    "vae": VAE,
    "classifier": NoisyClassifier,
}


def get_model(config: dict):
    """Build the denoiser from config (parity: train.py:27-56), injecting
    the normalized image size and conditional num_classes."""
    model_type = config["model_type"].lower()
    model_params = dict(config.get("model_params", {}))
    image_size = resolve_image_size(config["image_size"])

    # extension: SR3-style super-resolution stage (utils/sr.py) — the
    # denoiser consumes [x_t ; upsampled-LR] so its input channels double
    # while the predicted eps keeps the data channel count. Validated
    # BEFORE the latent block so conflicts surface without touching the
    # VAE checkpoint.
    from .utils.sr import SRSpec

    sr = SRSpec.from_config(config)
    if sr is not None:
        if model_type == "vae":
            raise ValueError(
                "super_resolution applies to denoisers, not the VAE stage"
            )
        if config.get("latent_diffusion"):
            raise ValueError(
                "super_resolution composes with pixel-space diffusion "
                "only (the LR conditioning is defined on pixels, not on "
                "a VAE's latent grid)"
            )

    if config.get("latent_diffusion") and model_type != "vae":
        # extension: the denoiser lives in the frozen VAE's latent space —
        # its spatial size and channel count come from the VAE checkpoint,
        # not the pixel-space config keys (utils/latent.py)
        from .utils.latent import LatentCodec

        codec = LatentCodec.from_config(config)
        image_size = codec.latent_hw()
        lc = codec.latent_channels
        declared = model_params.get("in_channels")
        if declared is not None and int(declared) != lc:
            raise ValueError(
                f"model_params.in_channels={declared} conflicts with the "
                f"VAE's latent_channels={lc} under latent_diffusion"
            )
        model_params["in_channels"] = lc
        if model_type == "unet":
            model_params["out_channels"] = lc

    if sr is not None:
        data_ch = int(model_params.get("in_channels", 3))
        model_params["in_channels"] = 2 * data_ch
        if model_type == "unet":
            model_params.setdefault("out_channels", data_ch)
        else:
            model_params["out_channels"] = data_ch

    if model_type in ("unet", "vae", "classifier"):
        model_params["image_size"] = image_size
    elif model_type in ("dit", "dim"):
        model_params["img_size"] = image_size

    if model_type == "classifier":
        # the guidance classifier (extension, models/classifier.py)
        # always needs the real class count — labels are its TARGETS,
        # not an input embedding, and there is no CFG null class
        if sr is not None:
            raise ValueError(
                "super_resolution does not apply to the classifier"
            )
        nc = int(config.get("num_classes", 0) or 0)
        if nc < 2:
            raise ValueError(
                "model_type 'classifier' needs num_classes >= 2"
            )
        model_params["num_classes"] = nc
    elif model_type != "vae":  # the autoencoder is unconditional by design
        if config.get("conditional", False):
            model_params["num_classes"] = config.get("num_classes")
        else:
            model_params["num_classes"] = None

    # tuples keep flax dataclass fields hashable
    for key in ("image_size", "img_size", "attention_resolutions",
                "channel_mult", "freeu"):
        if key in model_params and isinstance(model_params[key], list):
            model_params[key] = tuple(model_params[key])

    # Mixed precision: 'bf16' runs the model's matmuls/convs/activations in
    # bfloat16 while params, optimizer state and the loss stay fp32 (master
    # weights). TPU-native policy — params cast per-layer, no loss scaling
    # needed (bf16 shares fp32's exponent range).
    mp = str(config.get("mixed_precision", "none") or "none").lower()
    if mp in ("bf16", "bfloat16"):
        model_params["dtype"] = jnp.bfloat16
    elif mp not in ("none", "fp32", "float32", "off", "false"):
        raise ValueError(f"Unknown mixed_precision: {mp!r}")

    # Gradient checkpointing (jax.checkpoint per block): recompute
    # activations in the backward instead of storing them — O(depth) less
    # activation HBM for ~1/3 more FLOPs; param tree unchanged.
    if config.get("remat", False):
        model_params["remat"] = True

    try:
        cls = MODEL_CLASSES[model_type]
    except KeyError:
        raise ValueError(f"Unknown model type: {model_type}") from None
    return cls(**model_params)


def get_diffusion(config: dict, sampling_method: str = "ddpm"):
    """Build the diffusion process (parity: train.py:59-70 — training always
    uses DDPM; sample.py:42-64 — DDIM selected per CLI flag).

    Extension: `diffusion_type: 'flow_matching'` switches the whole stack
    (training objective AND sampling) to rectified flow; the DDPM/DDIM
    sampling grids are meaningless for a velocity-trained model, so the
    key overrides `sampling_method` (num_inference_steps still honored).
    """
    dtype_key = str(config.get("diffusion_type", "ddpm")).lower()
    # Latent diffusion samples an UNBOUNDED space: the pixel [-1, 1]
    # clamp / dynamic thresholding would corrupt every latent, so
    # clip_sample defaults off there (explicit `clip_sample` key wins).
    clip_sample = bool(
        config.get("clip_sample", not config.get("latent_diffusion", False))
    )
    if dtype_key in ("flow", "flow_matching", "rectified_flow"):
        if str(config.get("loss_weighting", "uniform")) != "uniform":
            raise ValueError(
                "loss_weighting is SNR-based and does not apply to "
                "flow matching (the velocity objective is already "
                "uniformly weighted along the path)"
            )
        if float(config.get("guidance_rescale", 0.0)) != 0.0:
            raise ValueError(
                "guidance_rescale is defined on the VP-diffusion x0 "
                "prediction (Lin et al. 2023) and does not apply to "
                "flow matching"
            )
        if config.get("cfg_interval") is not None:
            raise ValueError(
                "cfg_interval is defined on the VP timestep grid and "
                "does not apply to flow matching"
            )
        return FlowMatching(
            num_timesteps=config["num_timesteps"],
            num_inference_steps=config.get("num_inference_steps", 50),
            solver=config.get("flow_solver", "euler"),
            clip_sample=clip_sample,
        )
    if dtype_key == "edm":
        # extension: EDM design space (Karras et al. 2022) — VE-style
        # preconditioned denoiser, log-normal sigma training, Heun
        # sampler with optional churn; like flow matching the key owns
        # the whole stack (DDPM/DDIM grids are meaningless for it)
        if str(config.get("loss_weighting", "uniform")) != "uniform":
            raise ValueError(
                "loss_weighting does not apply to EDM — it has its own "
                "lambda(sigma) weighting (Karras et al. 2022 eq. 8)"
            )
        if str(config.get("prediction_type", "eps")) != "eps":
            raise ValueError(
                "prediction_type does not apply to EDM — the "
                "preconditioned denoiser D is defined in x0 space"
            )
        if config.get("cfg_interval") is not None:
            raise ValueError(
                "cfg_interval is defined on the VP timestep grid and "
                "does not apply to EDM (its noise levels are sigmas)"
            )
        return EDM(
            num_timesteps=config["num_timesteps"],
            num_inference_steps=config.get("num_inference_steps", 18),
            sigma_data=config.get("sigma_data", 0.5),
            sigma_min=config.get("sigma_min", 0.002),
            sigma_max=config.get("sigma_max", 80.0),
            rho=config.get("edm_rho", config.get("karras_rho", 7.0)),
            p_mean=config.get("p_mean", -1.2),
            p_std=config.get("p_std", 1.2),
            s_churn=config.get("s_churn", 0.0),
            s_min=config.get("s_min", 0.0),
            s_max=config.get("s_max", float("inf")),
            s_noise=config.get("s_noise", 1.0),
            guidance_rescale=config.get("guidance_rescale", 0.0),
            clip_sample=clip_sample,
        )
    if dtype_key == "consistency":
        # extension: consistency model distilled by tools/distill.py
        # (distill_method: 'consistency'); the key owns the stack —
        # DDPM/DDIM sampling grids are meaningless for f(x, t) -> x0
        return ConsistencyModel(
            num_timesteps=config["num_timesteps"],
            num_inference_steps=config.get("num_inference_steps", 2),
            beta_start=config["beta_start"],
            beta_end=config["beta_end"],
            beta_schedule=config["beta_schedule"],
            prediction_type=config.get("prediction_type", "eps"),
            sigma_data=config.get("sigma_data", 0.5),
            timestep_scaling=config.get("timestep_scaling", 10.0),
            zero_terminal_snr=config.get("zero_terminal_snr", False),
            clip_sample=clip_sample,
        )
    if dtype_key not in ("ddpm", "diffusion"):
        raise ValueError(
            f"Unknown diffusion_type: {config.get('diffusion_type')!r} "
            "(expected 'ddpm', 'flow_matching', 'edm' or 'consistency')"
        )
    common = dict(
        num_timesteps=config["num_timesteps"],
        beta_start=config["beta_start"],
        beta_end=config["beta_end"],
        beta_schedule=config["beta_schedule"],
        # extension: 'eps' (reference parity, default) | 'v' | 'x0'
        prediction_type=config.get("prediction_type", "eps"),
        # extension: SNR-based loss weighting — 'uniform' (parity) |
        # 'snr' | 'min_snr' (Min-SNR-gamma, Hang et al. 2023)
        loss_weighting=config.get("loss_weighting", "uniform"),
        min_snr_gamma=config.get("min_snr_gamma", 5.0),
        # extension: terminal-SNR fix (Lin et al. 2023) — requires v/x0
        zero_terminal_snr=config.get("zero_terminal_snr", False),
        # extension: CFG contrast rescale, phi in [0, 1] (Lin et al. 2023
        # §3.4); 0 (default) is bit-exact reference-parity CFG
        guidance_rescale=config.get("guidance_rescale", 0.0),
        clip_sample=clip_sample,
        # extension: guide only inside a [t_lo, t_hi] noise interval
        # (Kynkaanniemi et al. 2024); None (default) guides everywhere
        cfg_interval=config.get("cfg_interval"),
    )
    # extension: Karras-spaced inference grid (Karras et al. 2022) for
    # the fast samplers; DDPM is always full-step so the key is ignored
    fast_common = dict(
        common,
        timestep_spacing=config.get("timestep_spacing", "uniform"),
        karras_rho=config.get("karras_rho", 7.0),
    )
    method = sampling_method.lower()
    if method == "ddim":
        return DDIM(
            num_inference_steps=config.get("num_inference_steps", 50),
            eta=config.get("ddim_eta", 0.0),
            **fast_common,
        )
    if method in ("dpm++", "dpmpp", "dpm_solver++", "dpm-solver++"):
        return DPMSolverPP(
            num_inference_steps=config.get("num_inference_steps", 20),
            **fast_common,
        )
    if method in ("unipc", "uni-pc", "uni_pc"):
        # extension: UniPC (Zhao et al. 2023) — predictor-corrector,
        # one model call per step, strongest at <10 steps
        return UniPC(
            num_inference_steps=config.get("num_inference_steps", 10),
            **fast_common,
        )
    if method in ("dpm++sde", "dpmpp_sde", "sde-dpm++", "dpm++_sde"):
        # extension: SDE-DPM-Solver++(2M) — the stochastic variant
        # (Lu et al. 2022b); re-injects matched noise each step
        return DPMSolverPP(
            num_inference_steps=config.get("num_inference_steps", 20),
            sde=True,
            **fast_common,
        )
    return DDPM(**common)


def get_dataset(config: dict, train: bool = True):
    """Build the dataset (parity: train.py:73-104)."""
    dataset_name = config["dataset"].lower()
    img_size = resolve_image_size(config["image_size"])

    if dataset_name == "custom":
        transform = CustomImageDataset.get_default_transform(
            img_size, "rgb", train=train
        )
        return CustomImageDataset(
            root=config["data_root"],
            transform=transform,
            conditional=config.get("conditional", False),
            label_file=config.get("label_file"),
            use_subdirs=config.get("use_subdirs", False),
        )

    transform = DiffusionDataset.get_default_transform(
        img_size, dataset_name, train=train
    )
    kwargs = {}
    if dataset_name == "synthetic":
        kwargs = dict(
            image_size=img_size,
            channels=config.get("model_params", {}).get("in_channels", 3),
            num_classes=config.get("num_classes", 10) or 10,
        )
    return DiffusionDataset(
        dataset_name=dataset_name,
        root=config.get("data_root", "./data"),
        train=train,
        transform=transform,
        download=True,
        conditional=config.get("conditional", False),
        **kwargs,
    )


def get_dataloader(config: dict, dataset, train: bool = True, seed: int = 0):
    """Build the loader (parity: train.py:107-128 + DistributedSampler).

    The LOCAL batch is config batch_size / process_count so the global
    batch matches the reference's per-step batch semantics on one host.
    """
    pcount = pmesh.process_count()
    local_bs = max(1, config["batch_size"] // pcount)
    return DataLoader(
        dataset,
        batch_size=local_bs,
        shuffle=train,
        drop_last=train,
        seed=seed,
        process_index=pmesh.process_index(),
        process_count=pcount,
        # lazy (file-backed) datasets only: decode thread pool / one-time
        # decoded-uint8 cache (reference analog: DataLoader num_workers)
        num_workers=config.get("num_workers"),
        cache_decoded=config.get("cache_decoded", False),
        # train only: DCT-scaled JPEG decode trades exact pixel parity
        # for decode throughput — never applied to evaluation data
        fast_jpeg_decode=train and config.get("fast_jpeg_decode", False),
    )


def init_model_params(model, rng, image_size, in_channels, conditional):
    """Initialize model params as ONE jitted computation on the host CPU.

    Running `model.init` eagerly dispatches hundreds of tiny ops; on a
    remote-compiled TPU backend each becomes a separate compilation
    (observed ~2.5 min for the CIFAR UNet). One jitted init on the CPU
    backend takes seconds; params transfer to device on first use.
    """
    h, w = image_size
    x = jnp.zeros((1, h, w, in_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    y = jnp.zeros((1,), jnp.int32) if conditional else None
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        # Host CPU platform not registered (JAX_PLATFORMS pinned to an
        # accelerator) — one jitted init on the default backend is still
        # a single compile, just not host-staged.
        cpu = None
    if cpu is None:
        variables = jax.jit(lambda k: model.init(k, x, t, y))(rng)
    else:
        with jax.default_device(cpu):
            variables = jax.jit(lambda k: model.init(k, x, t, y))(rng)
    return variables["params"]


def eval_model_fn(model, params):
    """Pytree-friendly eval-mode denoiser closure `(x, t, y) -> eps`."""

    def fn(x, t, y):
        return model.apply({"params": params}, x, t, y, train=False)

    return jax.tree_util.Partial(fn)


def dp_sampling_sharding(batch_size: int):
    """Batch sharding for data-parallel CLI sampling, or None.

    The reference's sample/evaluate CLIs are single-GPU
    (sample.py:129-210); here, when several devices are visible to one
    process (a pod-slice host), the per-batch work shards over a 'data'
    mesh instead of running replicated — the whole jitted trajectory
    becomes an SPMD program via input shardings alone. Returns None when
    it doesn't apply (one device, multi-process, or indivisible batch).
    """
    return pmesh.dp_batch_sharding(batch_size)


def sharded_init_noise(rng, shape, sharding):
    """The exact noise the sampler's `_initial_image` would draw (same
    key split), placed sharded — with JAX's partitionable threefry the
    per-step in-scan noise is sharding-invariant, so DP trajectories are
    identical to single-device ones."""
    init_rng = jax.random.split(rng)[1]
    noise = jax.random.normal(init_rng, tuple(shape), jnp.float32)
    return jax.device_put(noise, sharding)


def load_model_for_inference(checkpoint: dict, config: dict, use_ema: bool):
    """Rebuild model + params from a checkpoint payload (parity:
    sample.py:116-126: --use_ema picks the EMA weights when present)."""
    model = get_model(config)
    if use_ema and "ema_model_state_dict" in checkpoint:
        print("Using EMA model")
        params = checkpoint["ema_model_state_dict"]
    else:
        params = checkpoint["model_state_dict"]
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return model, params
