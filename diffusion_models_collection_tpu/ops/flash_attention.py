"""Pallas flash-attention kernel for TPU.

Memory-linear attention for DiT blocks and UNet AttentionBlocks (replacing
the O(L^2)-materializing softmax at reference models/unet.py:92-95 and
models/dit.py:123). Online-softmax tiling over KV blocks: Q tiles stay
resident in VMEM, K/V stream through, running max/denominator carried in
f32 — the standard TPU flash pattern, one `pallas_call` per (batch, head).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401 (memory spaces)

# Minimum sequence length before the kernel beats plain XLA attention; short
# image-token sequences (e.g. 64 tokens) are faster fused by XLA itself.
_MIN_SEQ_LEN = 128
_LANE = 128


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)
    num_k = k_ref.shape[1] // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    d = v_ref.shape[2]
    acc0 = jnp.zeros((q.shape[0], d), jnp.float32)
    m0 = jnp.full((q.shape[0], 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_bh(q, k, v, block_q: int, block_k: int):
    """q,k,v: (BH, L, D) with L % block == 0 and D % 128 == 0."""
    bh, seq_len, head_dim = q.shape
    scale = 1.0 / math.sqrt(head_dim)
    kernel = functools.partial(_flash_kernel, block_k=block_k, scale=scale)
    grid = (bh, seq_len // block_q)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, head_dim), lambda b, i: (b, i, 0)
            ),
            pl.BlockSpec((1, seq_len, head_dim), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, seq_len, head_dim), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, head_dim), lambda b, i: (b, i, 0)),
    )(q, k, v)


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
) -> Optional[jnp.ndarray]:
    """Flash attention over (B, H, L, Dh); returns None if shapes don't
    meet kernel constraints (caller falls back to the XLA path)."""
    batch, heads, seq_len, head_dim = q.shape
    if seq_len < _MIN_SEQ_LEN or seq_len % _LANE != 0:
        return None
    if head_dim % _LANE != 0:
        return None
    block_q = min(256, seq_len)
    block_k = min(256, seq_len)
    if seq_len % block_q or seq_len % block_k:
        return None
    qf = q.reshape(batch * heads, seq_len, head_dim)
    kf = k.reshape(batch * heads, seq_len, head_dim)
    vf = v.reshape(batch * heads, seq_len, head_dim)
    out = _flash_bh(qf, kf, vf, block_q, block_k)
    return out.reshape(batch, heads, seq_len, head_dim)
