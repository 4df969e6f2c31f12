"""Shared building blocks for the denoiser backbones.

Parity targets: reference models/unet.py:12-25 (UNet TimeEmbedding),
models/dit.py:12-84 (PatchEmbed / TimestepEmbedder / LabelEmbedder — shared
verbatim by DiM at models/dim.py:20-91). All modules operate on NHWC
images / (B, L, D) token sequences, the native TPU layouts.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from . import initializers as init

# Compute dtype for mixed-precision execution. Modules accept a `dtype`
# attribute (flax convention): None keeps full fp32; jnp.bfloat16 runs the
# matmuls/convs and activations in bf16 while parameters stay fp32
# (param_dtype default) — the TPU-native mixed-precision policy. Sinusoidal
# embeddings always *compute* their trig args in fp32 (t spans [0, 1000) —
# bf16's 8-bit mantissa would alias timesteps) and cast only the result.
Dtype = Any


def sinusoidal_time_embedding_unet(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """UNet-style sinusoidal embedding (reference models/unet.py:18-25):
    freqs exp(-arange(half) * ln(10000)/(half-1)), concat [sin, cos]."""
    half = dim // 2
    scale = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -scale)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def sinusoidal_time_embedding_dit(
    t: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """DiT-style sinusoidal embedding (reference models/dit.py:41-50):
    freqs exp(-ln(max_period) * arange(half)/half), concat [cos, sin]."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class UNetTimeEmbed(nn.Module):
    """Sinusoidal features -> MLP (reference models/unet.py:166-172)."""

    model_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        dim = self.model_channels * 4
        h = sinusoidal_time_embedding_unet(t, self.model_channels)
        if self.dtype is not None:
            h = h.astype(self.dtype)
        h = nn.Dense(
            dim,
            dtype=self.dtype,
            kernel_init=init.torch_default_kernel,
            bias_init=init.torch_default_bias(self.model_channels),
        )(h)
        h = nn.silu(h)
        h = nn.Dense(
            dim,
            dtype=self.dtype,
            kernel_init=init.torch_default_kernel,
            bias_init=init.torch_default_bias(dim),
        )(h)
        return h


class TimestepEmbedder(nn.Module):
    """DiT/DiM timestep embedder (reference models/dit.py:30-55)."""

    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        h = sinusoidal_time_embedding_dit(t, self.frequency_embedding_size)
        if self.dtype is not None:
            h = h.astype(self.dtype)
        h = nn.Dense(self.hidden_size, dtype=self.dtype,
                     kernel_init=init.xavier_uniform,
                     bias_init=init.zeros)(h)
        h = nn.silu(h)
        h = nn.Dense(self.hidden_size, dtype=self.dtype,
                     kernel_init=init.xavier_uniform,
                     bias_init=init.zeros)(h)
        return h


class LabelEmbedder(nn.Module):
    """Class-label embedding table with null row 0 for CFG.

    Parity: reference models/dit.py:58-84 — `nn.Embedding(num_classes + 1,
    hidden, padding_idx=0)`. Row 0 is the unconditional token: zero at init
    and masked at lookup so it stays exactly zero (torch freezes the padding
    row by zeroing its grad; masking the output is equivalent and cheaper
    than per-row grad surgery on TPU).
    """

    num_classes: int
    hidden_size: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding",
            init.embedding_with_null_row,
            (self.num_classes + 1, self.hidden_size),
        )
        if self.dtype is not None:
            table = table.astype(self.dtype)
        y = jnp.clip(y, 0, self.num_classes)
        emb = jnp.take(table, y, axis=0)
        return emb * (y != 0).astype(emb.dtype)[:, None]


class PatchEmbed(nn.Module):
    """Image -> patch tokens (reference models/dit.py:12-27), NHWC native.

    The conv-with-stride patchify is expressed as a reshape + matmul-free
    conv that XLA lowers to one MXU matmul per image.
    """

    patch_size: int
    embed_dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        b, h, w, c = x.shape
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            dtype=self.dtype,
            kernel_init=init.torch_default_kernel,
            bias_init=init.torch_default_bias(c * p * p),
        )(x)
        return x.reshape(b, (h // p) * (w // p), self.embed_dim)


def unpatchify(
    x: jnp.ndarray, h_tokens: int, w_tokens: int, patch_size: int, channels: int
) -> jnp.ndarray:
    """Tokens (B, N, p*p*C) -> NHWC image (reference models/dit.py:249-261).

    The reference's einsum 'nhwpqc->nchpwq' produces NCHW; ours produces the
    equivalent NHWC layout directly: (B, h, w, p, q, c) -> (B, h*p, w*q, c).
    """
    p = patch_size
    b = x.shape[0]
    x = x.reshape(b, h_tokens, w_tokens, p, p, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, h, p, w, q, c)
    return x.reshape(b, h_tokens * p, w_tokens * p, channels)


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """adaLN modulation x * (1 + scale) + shift (reference dit.py:121-122),
    broadcasting (B, D) conditioning over the token axis."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class AdaLNModulation(nn.Module):
    """SiLU -> Dense(n_chunks * dim), zero-init (reference dit.py:106-109,
    239-247). Zero init makes every block the identity at step 0."""

    dim: int
    n_chunks: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, c: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        h = nn.Dense(
            self.n_chunks * self.dim,
            dtype=self.dtype,
            kernel_init=init.zeros,
            bias_init=init.zeros,
        )(nn.silu(c))
        return tuple(jnp.split(h, self.n_chunks, axis=-1))
