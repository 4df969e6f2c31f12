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

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import checkpoint as ckpt_lib


class LatentCodec:
    """Frozen encode/decode views of a trained VAE checkpoint.

    Prefers EMA weights when the checkpoint has them (inference-quality
    reconstruction, matching the samplers' EMA convention).
    """

    def __init__(self, vae_checkpoint: str, scale_factor: float = 1.0):
        payload = ckpt_lib.load_checkpoint(vae_checkpoint)
        vae_config = payload.get("config") or {}
        if str(vae_config.get("model_type", "")).lower() != "vae":
            raise ValueError(
                f"{vae_checkpoint} is not a VAE checkpoint "
                f"(model_type={vae_config.get('model_type')!r}); train one "
                "with a `model_type: 'vae'` config first"
            )
        from ..factory import get_model  # deferred: factory imports utils

        self.vae_config = vae_config
        self.model = get_model(vae_config)
        params = payload.get("ema_model_state_dict")
        if params is None:
            params = payload["model_state_dict"]
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.scale = float(scale_factor)
        if self.scale <= 0.0:
            raise ValueError("latent_scale_factor must be positive")

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
    def encode(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """Pixel batch -> scaled posterior SAMPLE (training-time encode)."""
        mean, logvar = self.model.apply(
            {"params": self.params}, x, method=self.model.encode
        )
        noise = jax.random.normal(rng, mean.shape, mean.dtype)
        return (mean + jnp.exp(0.5 * logvar) * noise) * self.scale

    def encode_mode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Pixel batch -> scaled posterior MODE (deterministic encode for
        img2img/eval entry points)."""
        mean, _ = self.model.apply(
            {"params": self.params}, x, method=self.model.encode
        )
        return mean * self.scale

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """Scaled latent batch -> pixel batch."""
        return self.model.apply(
            {"params": self.params}, z / self.scale, method=self.model.decode
        )

    def decode_trajectory(self, z: jnp.ndarray) -> jnp.ndarray:
        """(T, B, lh, lw, C) latent trajectory -> pixel frames (decoded as
        one flattened batch; used for --save_intermediate/--create_gif)."""
        t, b = z.shape[0], z.shape[1]
        flat = self.decode(z.reshape((t * b,) + z.shape[2:]))
        return flat.reshape((t, b) + flat.shape[1:])
