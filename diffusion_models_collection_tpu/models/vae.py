"""Convolutional KL-VAE for latent diffusion — extension beyond the
reference (which diffuses in pixel space only; reference train.py:59-70).

A compact LDM-style autoencoder (Rombach et al. 2022 §3.1, KL variant):
the encoder downsamples by f = 2^(len(channel_mult) - 1) to a
(H/f, W/f, latent_channels) Gaussian posterior; the decoder mirrors it.
Diffusion then runs in the latent space (`latent_diffusion: true` in a
diffusion config — see utils/latent.py), cutting the denoiser's spatial
FLOPs by f^2 per side.

TPU-native: NHWC throughout, stride-2 convs down / nearest-up + conv up
(both single MXU-friendly convs), GroupNorm+SiLU via the shared fused op,
bf16-capable (`dtype`), per-block remat (`remat: true`). Reuses the UNet's
block vocabulary (models/unet.py) so the two stay visually consistent.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from . import initializers as init
from .unet import (
    AttentionBlock,
    Downsample,
    FusedGroupNormSiLU,
    Upsample,
    _conv1,
    _conv3,
)

Dtype = Any


class VAEResBlock(nn.Module):
    """GroupNorm+SiLU+Conv x2 residual block, unconditioned (the VAE has
    no timestep/label inputs — cf. models/unet.py ResidualBlock)."""

    out_channels: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        h = FusedGroupNormSiLU(dtype=self.dtype)(x)
        h = _conv3(self.out_channels, in_ch, dtype=self.dtype)(h)
        h = FusedGroupNormSiLU(dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = _conv3(self.out_channels, self.out_channels, dtype=self.dtype)(h)
        if in_ch != self.out_channels:
            x = _conv1(self.out_channels, in_ch, dtype=self.dtype)(x)
        return h + x


class _Encoder(nn.Module):
    base_channels: int
    channel_mult: Sequence[int]
    latent_channels: int
    num_res_blocks: int
    use_attention: bool
    dropout: float
    dtype: Optional[Dtype]
    remat: bool

    @nn.compact
    def __call__(self, x, train: bool = False):
        # static_argnums: `train` must stay a Python bool through
        # jax.checkpoint (Dropout branches on it) — index counts self
        block = (
            nn.remat(VAEResBlock, static_argnums=(2,))
            if self.remat else VAEResBlock
        )
        ch = self.base_channels * self.channel_mult[0]
        h = _conv3(ch, x.shape[-1], dtype=self.dtype)(x)
        for level, mult in enumerate(self.channel_mult):
            ch = self.base_channels * mult
            for _ in range(self.num_res_blocks):
                h = block(ch, self.dropout, self.dtype)(h, train)
            if level != len(self.channel_mult) - 1:
                h = Downsample(dtype=self.dtype)(h)
        h = block(ch, self.dropout, self.dtype)(h, train)
        if self.use_attention:
            h = AttentionBlock(dtype=self.dtype)(h)
        h = FusedGroupNormSiLU(dtype=self.dtype)(h)
        # 2C output: [mean, logvar] of the diagonal Gaussian posterior
        h = _conv3(2 * self.latent_channels, ch, dtype=self.dtype)(h)
        mean, logvar = jnp.split(h.astype(jnp.float32), 2, axis=-1)
        # bound the posterior variance (LDM clamps to [-30, 20])
        return mean, jnp.clip(logvar, -30.0, 20.0)


class _Decoder(nn.Module):
    base_channels: int
    channel_mult: Sequence[int]
    out_channels: int
    num_res_blocks: int
    use_attention: bool
    dropout: float
    dtype: Optional[Dtype]
    remat: bool

    @nn.compact
    def __call__(self, z, train: bool = False):
        block = (
            nn.remat(VAEResBlock, static_argnums=(2,))
            if self.remat else VAEResBlock
        )
        ch = self.base_channels * self.channel_mult[-1]
        h = _conv3(ch, z.shape[-1], dtype=self.dtype)(z)
        h = block(ch, self.dropout, self.dtype)(h, train)
        if self.use_attention:
            h = AttentionBlock(dtype=self.dtype)(h)
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            ch = self.base_channels * mult
            for _ in range(self.num_res_blocks):
                h = block(ch, self.dropout, self.dtype)(h, train)
            if level != 0:
                h = Upsample(dtype=self.dtype)(h)
        h = FusedGroupNormSiLU(dtype=self.dtype)(h)
        h = _conv3(self.out_channels, h.shape[-1], dtype=self.dtype)(h)
        return h.astype(jnp.float32)


class VAE(nn.Module):
    """KL-regularized convolutional autoencoder.

    `__call__(x, noise, train)` -> (reconstruction, mean, logvar) with the
    reparameterized z = mean + exp(logvar/2) * noise (noise is an explicit
    standard-normal input — JAX functional RNG, same convention as the
    diffusion `p_losses` noise argument). `encode`/`decode` are exposed as
    apply methods for the latent-diffusion wrapper.
    """

    image_size: Tuple[int, int] = (32, 32)
    in_channels: int = 3
    base_channels: int = 64
    channel_mult: Sequence[int] = (1, 2)
    latent_channels: int = 4
    num_res_blocks: int = 1
    use_attention: bool = False
    dropout: float = 0.0
    dtype: Optional[Dtype] = None
    remat: bool = False

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.channel_mult) - 1)

    def latent_hw(self) -> Tuple[int, int]:
        f = self.downsample_factor
        h, w = self.image_size
        if h % f or w % f:
            raise ValueError(
                f"image size {self.image_size} not divisible by the "
                f"downsample factor {f}"
            )
        return h // f, w // f

    def setup(self):
        self.latent_hw()  # validate divisibility at construction
        kw = dict(
            base_channels=self.base_channels,
            channel_mult=tuple(self.channel_mult),
            num_res_blocks=self.num_res_blocks,
            use_attention=self.use_attention,
            dropout=self.dropout,
            dtype=self.dtype,
            remat=self.remat,
        )
        self.encoder = _Encoder(latent_channels=self.latent_channels, **kw)
        self.decoder = _Decoder(out_channels=self.in_channels, **kw)

    def encode(self, x, train: bool = False):
        """x -> (mean, logvar) of the latent posterior."""
        return self.encoder(x, train)

    def decode(self, z, train: bool = False):
        """latent z -> reconstructed image."""
        return self.decoder(z, train)

    def __call__(self, x, noise, train: bool = False):
        mean, logvar = self.encoder(x, train)
        z = mean + jnp.exp(0.5 * logvar) * noise
        return self.decoder(z, train), mean, logvar


def kl_divergence(mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """Mean per-element KL(q(z|x) || N(0, I)) over the batch:
    0.5 * (mean^2 + var - 1 - logvar)."""
    return 0.5 * jnp.mean(mean**2 + jnp.exp(logvar) - 1.0 - logvar)
