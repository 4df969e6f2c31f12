"""Pallas flash-attention kernel for TPU (forward + custom_vjp backward).

Memory-linear attention: online-softmax tiling over KV blocks — Q tiles
stay resident in VMEM, K/V stream through, running max/denominator carried
in f32, one grid step per (batch*head, q-block).

STATUS: **opt-in, not the default attention path** (DMC_TPU_FLASH_ATTENTION
=1). Measured end-to-end it loses to XLA's fused attention at every
shipped model shape (DiT-CIFAR L=256 d=64: 0.62x at DDIM-50 sampling,
0.90x at train fwd+bwd; UNet-CIFAR: 0.76x — tools/bench_flash_attention.py,
docs/benchmarks.md "Flash attention" section). At these sizes XLA is
already memory-efficient and the kernel pays 64-of-128 idle lanes plus an
optimization barrier per pallas_call. Kept (with parity + grad tests) as
the long-sequence escape hatch and kernel reference.

Shapes that ship today: DiT-CIFAR is L=256, head_dim=64; UNet attention
blocks are L=256..1024, head_dim 32/64. head_dim therefore only needs to be
a multiple of 8 (Mosaic pads sub-128 lane dims); requiring 128 lanes — as
round 1 did — made the kernel dead code for every shipped model.

Backward: the forward also emits the per-row logsumexp; the backward
recomputes P from (q, k, lse) in one program per (batch*head) — at the
shipped sequence lengths the full L x L score matrix fits comfortably in
VMEM, so tiling the backward would only add bookkeeping. Longer sequences
fall back to an equivalent jnp formulation (one fused XLA computation).
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
# One-program backward materializes the (L, L) score block in VMEM:
# L=1024 f32 is 4 MiB x ~4 live buffers — the practical ceiling.
_BWD_MAX_SEQ = 1024


_BLOCK = 256  # q/k block edge; _flash_core uses min(_BLOCK, L)


def supported(seq_len: int, head_dim: int) -> bool:
    """Shape gate shared by fwd/bwd; callers fall back to XLA otherwise.
    The grid tiles L by min(_BLOCK, L), so L must divide evenly — L=384
    would silently drop rows 256-383 and normalize over 256 keys."""
    return (
        seq_len >= _MIN_SEQ_LEN
        and seq_len % _LANE == 0
        and (seq_len <= _BLOCK or seq_len % _BLOCK == 0)
        and head_dim % 8 == 0
        and head_dim <= 256
    )


# ---------------------------------------------------------------- forward
def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int,
                scale: float):
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
    acc, m, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # lse carried as (L, 1) — a trailing singleton lane dim keeps the
    # block shape Mosaic-legal ((block_q, 1): sublane %8, lane == array
    # dim); a 2-D (bh, L) layout is NOT lowerable (block (1, block_q)
    # puts block_q in lanes with a 1-sublane block).
    lse_ref[0] = m + jnp.log(l)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_fwd_bh(q, k, v, block_q: int, block_k: int):
    """q,k,v: (BH, L, D). Returns (o, lse) with lse = logsumexp(s*scale)."""
    bh, seq_len, head_dim = q.shape
    scale = 1.0 / math.sqrt(head_dim)
    kernel = functools.partial(_fwd_kernel, block_k=block_k, scale=scale)
    grid = (bh, seq_len // block_q)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((bh, seq_len, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, head_dim), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, seq_len, head_dim), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, seq_len, head_dim), lambda b, i: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, head_dim), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0)),
        ),
    )(q, k, v)


# --------------------------------------------------------------- backward
def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float):
    """One program per (batch*head): recompute P from lse, full-matrix
    flash backward (Dao et al. eqns): dv = P^T dO; dS = P*(dO V^T - D);
    dq = dS K * scale; dk = dS^T Q * scale."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # (L, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse)  # softmax probabilities, exactly as in fwd
    dv_ref[0] = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    delta = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale
    dq_ref[0] = jnp.dot(
        ds, k, preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)


@jax.jit
def _flash_bwd_bh(q, k, v, o, do, lse):
    bh, seq_len, head_dim = q.shape
    scale = 1.0 / math.sqrt(head_dim)
    kernel = functools.partial(_bwd_kernel, scale=scale)
    full = pl.BlockSpec((1, seq_len, head_dim), lambda b: (b, 0, 0))
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(bh,),
        in_specs=[full, full, full, full, full,
                  pl.BlockSpec((1, seq_len, 1), lambda b: (b, 0, 0))],
        out_specs=(full, full, full),
    )(q, k, v, o, do, lse)


def _bwd_jnp(q, k, v, o, do, lse):
    """XLA fallback for sequences too long for the one-program backward —
    same math, one fused XLA computation."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bqd,bkd->bqk", q, k).astype(jnp.float32) * scale
    p = jnp.exp(s - lse)  # lse: (BH, L, 1) broadcasts over keys
    dv = jnp.einsum("bqk,bqd->bkd", p, do.astype(jnp.float32))
    dp = jnp.einsum("bqd,bkd->bqk", do.astype(jnp.float32),
                    v.astype(jnp.float32))
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale
    dq = jnp.einsum("bqk,bkd->bqd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bqk,bqd->bkd", ds, q.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


# ----------------------------------------------------------- custom_vjp op
@jax.custom_vjp
def _flash_core(q, k, v):
    """(BH, L, D) flash attention; differentiable via the flash backward."""
    block = min(_BLOCK, q.shape[1])
    o, _ = _flash_fwd_bh(q, k, v, block, block)
    return o


def _flash_core_fwd(q, k, v):
    block = min(_BLOCK, q.shape[1])
    o, lse = _flash_fwd_bh(q, k, v, block, block)
    return o, (q, k, v, o, lse)


def _flash_core_bwd(res, do):
    q, k, v, o, lse = res
    if q.shape[1] <= _BWD_MAX_SEQ:
        return _flash_bwd_bh(q, k, v, o, do, lse)
    return _bwd_jnp(q, k, v, o, do, lse)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
) -> Optional[jnp.ndarray]:
    """Flash attention over (B, H, L, Dh); returns None if shapes don't
    meet kernel constraints (caller falls back to the XLA path). Safe
    under jax.grad — the backward is the Pallas flash backward."""
    batch, heads, seq_len, head_dim = q.shape
    if k.shape[2] != seq_len:
        # cross-length attention (sequence parallelism gathers K/V to the
        # full length while Q stays local) — the kernel assumes square
        # L x L scores; let the XLA path handle it
        return None
    if not supported(seq_len, head_dim):
        return None
    qf = q.reshape(batch * heads, seq_len, head_dim)
    kf = k.reshape(batch * heads, seq_len, head_dim)
    vf = v.reshape(batch * heads, seq_len, head_dim)
    out = _flash_core(qf, kf, vf)
    return out.reshape(batch, heads, seq_len, head_dim)
