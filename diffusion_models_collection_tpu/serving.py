"""Ahead-of-time export of samplers for serving.

Production-serving addition beyond the reference: the whole DDIM/DDPM
trajectory (schedule + CFG + denoiser) is one jittable function, so it can
be exported as a portable StableHLO artifact with `jax.export` — a serving
binary loads the bytes and runs generation with no Python model code, no
checkpoint parsing, and no retracing.

    blob = export_sampler(model, params, config, batch_size=64)
    Path("sampler.stablehlo").write_bytes(blob)
    ...
    samples = run_exported(blob, rng, labels)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .factory import get_diffusion
from .utils.helpers import resolve_image_size


def _build_sampler_fn(model, config: dict, batch_size: int,
                      sampling_method: str, cfg_scale: float):
    """A pure (params, rng, labels) -> images function with everything
    else baked static."""
    if config.get("super_resolution"):
        raise ValueError(
            "super-resolution checkpoints are not exportable as "
            "self-contained samplers: they need a per-call LR "
            "conditioning input (use sample.py --sr_source)"
        )
    diffusion = get_diffusion(config, sampling_method=sampling_method)
    # Latent diffusion (extension): sample latents, decode inside the
    # exported program (the frozen VAE rides along as closure constants)
    from .utils.latent import LatentCodec

    codec = LatentCodec.from_config(config)
    if codec is not None:
        shape = codec.latent_shape(batch_size)
    else:
        h, w = resolve_image_size(config["image_size"])
        in_ch = config["model_params"]["in_channels"]
        shape = (batch_size, h, w, in_ch)
    conditional = bool(config.get("conditional", False)) and cfg_scale > 0

    def sampler(params, rng, labels):
        def model_fn(x, t, y):
            return model.apply({"params": params}, x, t, y, train=False)

        fn = jax.tree_util.Partial(model_fn)
        if conditional:
            out = diffusion.sample_with_cfg(
                fn, shape, labels, rng, cfg_scale=cfg_scale
            )
        else:
            out = diffusion.sample(fn, shape, rng)
        if codec is not None:
            out = codec.decode(out)
        return jnp.clip((out + 1.0) * 0.5, 0.0, 1.0)

    return sampler, shape


def export_sampler(
    model,
    params,
    config: dict,
    batch_size: int = 64,
    sampling_method: str = "ddim",
    cfg_scale: Optional[float] = None,
) -> bytes:
    """Serialize the full sampling trajectory as a StableHLO artifact.

    The exported function signature is (params, rng_key, labels) ->
    images in [0, 1]; labels use the +1-shifted convention (0 = null).
    """
    if cfg_scale is None:
        cfg_scale = float(config.get("cfg_scale", 0.0))
    sampler, shape = _build_sampler_fn(
        model, config, batch_size, sampling_method, cfg_scale
    )
    rng = jax.random.PRNGKey(0)
    labels = jnp.zeros((batch_size,), jnp.int32)
    exported = jax.export.export(jax.jit(sampler))(params, rng, labels)
    return bytes(exported.serialize())


def run_exported(blob: bytes, params, rng, labels):
    """Load and call an exported sampler artifact."""
    exported = jax.export.deserialize(blob)
    return exported.call(params, rng, labels)
