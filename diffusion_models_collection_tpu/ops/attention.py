"""Multi-head attention for denoiser backbones.

Replaces the reference's `nn.MultiheadAttention` (models/dit.py:94) and the
hand-rolled QKV-conv attention (models/unet.py:75-99). The XLA path is a
fused einsum-softmax-einsum that XLA maps onto the MXU; a Pallas
flash-attention kernel (ops/flash_attention.py) takes over on TPU for
longer sequences where the O(L^2) materialization is HBM-bound.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from . import dispatch


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over (B, H, L, Dh) tensors.

    Dropout is applied to the attention probabilities, matching torch
    `nn.MultiheadAttention(dropout=p)` semantics used by DiT blocks.
    """
    # Flash kernel: inference always; training too when attention dropout
    # is inactive (the kernel has a custom_vjp flash backward but no
    # probability-dropout path — with dropout_rate>0 the XLA formulation
    # below keeps torch-parity semantics).
    if dispatch.pallas_enabled() and (deterministic or dropout_rate == 0.0):
        from . import flash_attention

        out = flash_attention.flash_attention(q, k, v)
        if out is not None:
            return out
    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, dtype=q.dtype))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def multihead_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    *,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Attention over (B, L, D) tensors split into `num_heads` heads."""
    batch, length, dim = q.shape
    head_dim = dim // num_heads

    def split(x):
        return x.reshape(batch, -1, num_heads, head_dim).transpose(0, 2, 1, 3)

    out = dot_product_attention(
        split(q),
        split(k),
        split(v),
        dropout_rate=dropout_rate,
        deterministic=deterministic,
        dropout_rng=dropout_rng,
    )
    return out.transpose(0, 2, 1, 3).reshape(batch, length, dim)
