"""Latent-diffusion codec: a frozen, pretrained KL-VAE wrapped for use
inside jitted train/sample programs — extension beyond the reference
(which diffuses in pixel space only).

Stage 2 of latent diffusion (Rombach et al. 2022): a diffusion config
sets `latent_diffusion: true` + `vae_checkpoint: <stage-1 ckpt>`, and the
whole stack — trainer, sample.py, evaluate.py, serving — moves the
denoiser into the VAE's latent space: images are encoded (posterior
sample in training, mode at the img2img entry), the denoiser sees
(H/f, W/f, latent_channels) arrays, and sampled latents are decoded back
to pixels. `latent_scale_factor` rescales latents to ~unit variance
before diffusion (LDM's sigma normalization); 1/scale is applied before
decoding.

The codec's VAE params are closure constants of the jitted programs that
use them (frozen — transferred to device once at compile, the same
policy as sampler model params).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import checkpoint as ckpt_lib


@functools.lru_cache(maxsize=8)
def _load_vae(abspath: str):
    """Load + build a VAE checkpoint ONCE per process. Every latent entry
    point needs the codec (factory.get_model for geometry, the trainer /
    CLIs / serving for encode-decode) — caching avoids deserializing the
    checkpoint and re-materializing its params for each of them."""
    payload = ckpt_lib.load_checkpoint(abspath)
    vae_config = payload.get("config") or {}
    if str(vae_config.get("model_type", "")).lower() != "vae":
        raise ValueError(
            f"{abspath} is not a VAE checkpoint "
            f"(model_type={vae_config.get('model_type')!r}); train one "
            "with a `model_type: 'vae'` config first"
        )
    from ..factory import get_model  # deferred: factory imports utils

    model = get_model(vae_config)
    params = payload.get("ema_model_state_dict")
    if params is None:
        params = payload["model_state_dict"]
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return model, params, vae_config


class LatentCodec:
    """Frozen encode/decode views of a trained VAE checkpoint.

    Prefers EMA weights when the checkpoint has them (inference-quality
    reconstruction, matching the samplers' EMA convention). encode/decode
    are jitted per instance — eager per-op dispatch is catastrophic on a
    remote-compiled backend (see vae_trainer.init_vae_params)."""

    def __init__(self, vae_checkpoint: str, scale_factor: float = 1.0):
        self.model, self.params, self.vae_config = _load_vae(
            os.path.abspath(str(vae_checkpoint))
        )
        self.scale = float(scale_factor)
        if self.scale <= 0.0:
            raise ValueError("latent_scale_factor must be positive")
        self._encode_jit = jax.jit(self._encode_impl)
        self._encode_mode_jit = jax.jit(self._encode_mode_impl)
        self._decode_jit = jax.jit(self._decode_impl)

    @classmethod
    def from_config(cls, config: dict) -> Optional["LatentCodec"]:
        """Build from a diffusion config, or None when it isn't latent."""
        if not config.get("latent_diffusion"):
            return None
        path = config.get("vae_checkpoint")
        if not path:
            raise ValueError(
                "latent_diffusion: true needs a `vae_checkpoint` config key"
            )
        return cls(path, config.get("latent_scale_factor", 1.0))

    # ------------------------------------------------------------- geometry
    def latent_hw(self) -> Tuple[int, int]:
        return self.model.latent_hw()

    @property
    def latent_channels(self) -> int:
        return self.model.latent_channels

    def latent_shape(self, batch: int) -> Tuple[int, int, int, int]:
        lh, lw = self.latent_hw()
        return (batch, lh, lw, self.latent_channels)

    # ------------------------------------------------------------ transforms
    def _encode_impl(self, x, rng):
        mean, logvar = self.model.apply(
            {"params": self.params}, x, method=self.model.encode
        )
        noise = jax.random.normal(rng, mean.shape, mean.dtype)
        return (mean + jnp.exp(0.5 * logvar) * noise) * self.scale

    def _encode_mode_impl(self, x):
        mean, _ = self.model.apply(
            {"params": self.params}, x, method=self.model.encode
        )
        return mean * self.scale

    def _decode_impl(self, z):
        return self.model.apply(
            {"params": self.params}, z / self.scale, method=self.model.decode
        )

    def encode(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """Pixel batch -> scaled posterior SAMPLE (training-time encode).
        Calls the un-jitted impl when already inside a trace (the train
        step closes over it), the jitted one at eager call sites."""
        if isinstance(x, jax.core.Tracer):
            return self._encode_impl(x, rng)
        return self._encode_jit(x, rng)

    def encode_mode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Pixel batch -> scaled posterior MODE (deterministic encode for
        img2img/eval entry points)."""
        if isinstance(x, jax.core.Tracer):
            return self._encode_mode_impl(x)
        return self._encode_mode_jit(x)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """Scaled latent batch -> pixel batch."""
        if isinstance(z, jax.core.Tracer):
            return self._decode_impl(z)
        return self._decode_jit(z)

    def decode_trajectory(self, z: jnp.ndarray):
        """(T, B, lh, lw, C) latent trajectory -> pixel frames (numpy),
        decoded one timestep at a time: a single flattened T*B batch
        OOMs for full DDPM trajectories, while per-step decodes reuse
        ONE compiled shape and stream frames straight to host memory."""
        import numpy as np

        return np.stack(
            [np.asarray(self.decode(z[t])) for t in range(z.shape[0])],
            axis=0,
        )
