"""Multi-head attention for denoiser backbones.

Replaces the reference's `nn.MultiheadAttention` (models/dit.py:94) and the
hand-rolled QKV-conv attention (models/unet.py:75-99). The default path is
a fused einsum-softmax-einsum that XLA maps onto the MXU.

Measured end-to-end VERDICT (v5e, round 2 — tools/bench_flash_attention.py,
same discipline as the GN+SiLU kernel): the Pallas flash kernel LOSES to
the XLA formulation at every shipped model shape — DiT-CIFAR DDIM-50
27.2 vs 43.8 samples/s (0.62x), DiT train fwd+bwd 844 vs 933 imgs/s
(0.90x), UNet-CIFAR DDIM-50 44.7 vs 58.5 samples/s (0.76x). At L<=1024
with head_dim 64 the score matrix fits in VMEM-adjacent fusions and XLA's
attention is already memory-efficient, while the flash kernel pays lane
padding (64 of 128 lanes idle) and an optimization barrier per
pallas_call. The kernel is kept behind an explicit opt-in
(DMC_TPU_FLASH_ATTENTION=1) for long-sequence experiments, with parity
tests; the default path lets XLA fuse. Details: docs/benchmarks.md.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from . import dispatch

_FORCE_FLASH_ENV = "DMC_TPU_FLASH_ATTENTION"


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    key_sizes: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over (B, H, L, Dh) tensors.

    Dropout is applied to the attention probabilities, matching torch
    `nn.MultiheadAttention(dropout=p)` semantics used by DiT blocks.

    `key_sizes` (B, Lk) enables proportional attention (ToMe §3.2,
    ops/tome.py): log(size) is added to the key logits so a merged key
    representing s tokens attracts softmax mass as if present s times
    (exact for duplicated tokens). All-ones is a no-op.
    """
    # Flash kernel (opt-in only — see module docstring): usable whenever
    # attention dropout is inactive (it has a custom_vjp flash backward
    # but no probability-dropout path) and no key bias is requested.
    if (
        os.environ.get(_FORCE_FLASH_ENV, "0") == "1"
        and dispatch.pallas_enabled()
        and (deterministic or dropout_rate == 0.0)
        and key_sizes is None
    ):
        from . import flash_attention

        out = flash_attention.flash_attention(q, k, v)
        if out is not None:
            return out
    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, dtype=q.dtype))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if key_sizes is not None:
        logits = logits + jnp.log(key_sizes.astype(logits.dtype))[
            :, None, None, :
        ]
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
    key_sizes: Optional[jnp.ndarray] = None,
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
        key_sizes=key_sizes,
    )
    return out.transpose(0, 2, 1, 3).reshape(batch, length, dim)
