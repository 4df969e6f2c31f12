"""Pallas TPU kernel for the Mamba selective scan.

Why: the XLA associative-scan path materializes the discretized
(B, L, D, N) decay/drive tensors in HBM and streams them log2(L) times —
for DiM CIFAR shapes (B=160, L=256, D=768, N=16) that is ~2 GB per buffer
and measured 1.4 samples/s end-to-end. This kernel keeps the recurrence
state (N, D) resident in VMEM and streams x/dt once, sequentially over L,
with the (B, L, D, N) tensor never existing anywhere.

Layout: state h is (block_b, N, D) with D on lanes (128-multiple) and N on
sublanes — every per-step op is a well-tiled VPU elementwise op. B and C
are passed TRANSPOSED, (B, N, L), so the per-step column read is a (N, 1)
slice that broadcasts across D lanes without an in-kernel transpose.

The op is exposed through `jax.custom_vjp`: forward runs this kernel,
backward recomputes via the memory-bounded chunked XLA path (selective
scan is cheap to recompute; this also keeps training memory bounded).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _scan_kernel(dt_ref, u_ref, b_ref, c_ref, a_ref, y_ref, h_ref):
    """One grid step: one batch element, full L loop.

    Refs (block shapes, leading batch-block dim of 1):
      dt_ref: (1, L, D)  softplus'd step sizes
      u_ref:  (1, L, D)  dt * x  (precomputed drive, pre-B)
      b_ref:  (1, L, N)  input matrix
      c_ref:  (1, L, N)  output matrix
      a_ref:  (N, D)     A transposed (negative real)
      y_ref:  (1, L, D)  output
      h_ref:  (N, D)     VMEM scratch state

    Per-step reads are single-sublane row slices (lane-contiguous — Mosaic
    rejects lane-strided column loads); the (N,1)x(1,D) outer product and
    the (1,N)x(N,D) output contraction are K=1 / K=N dot_generals, so no
    in-kernel transposes are needed.
    """
    length = dt_ref.shape[1]
    h_ref[...] = jnp.zeros_like(h_ref)
    A = a_ref[...]  # (N, D)

    def step(t, _):
        dt_t = dt_ref[0, pl.ds(t, 1), :]  # (1, D)
        u_t = u_ref[0, pl.ds(t, 1), :]  # (1, D)
        b_t = b_ref[0, pl.ds(t, 1), :]  # (1, N)
        c_t = c_ref[0, pl.ds(t, 1), :]  # (1, N)
        decay = jnp.exp(dt_t * A)  # (N, D): (1,D) bcast over N sublanes
        outer = jax.lax.dot_general(  # (N, D) outer product, K=1
            b_t, u_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        h = decay * h_ref[...] + outer
        h_ref[...] = h
        y_ref[0, pl.ds(t, 1), :] = jax.lax.dot_general(  # (1, D), K=N
            c_t, h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(y_ref.dtype)
        return ()

    jax.lax.fori_loop(0, length, step, ())


def _scan_kernel_blocked(dt_ref, u_ref, b_ref, c_ref, a_ref, y_ref, h_ref,
                         *, t_block: int):
    """Time-blocked variant: per outer iteration, the input-dependent
    decay/drive for T_BLOCK steps are computed as ONE batched elementwise
    exp and ONE batched K=1 dot_general (amortizing per-step op overhead
    ~T_BLOCK x); only the h update itself stays serial, unrolled
    statically so all indexing is compile-time."""
    length = dt_ref.shape[1]
    h_ref[...] = jnp.zeros_like(h_ref)
    A = a_ref[...]  # (N, D)
    n_blocks = length // t_block

    def outer(k, _):
        t0 = k * t_block
        dt_c = dt_ref[0, pl.ds(t0, t_block), :]  # (T, D)
        u_c = u_ref[0, pl.ds(t0, t_block), :]  # (T, D)
        b_c = b_ref[0, pl.ds(t0, t_block), :]  # (T, N)
        c_c = c_ref[0, pl.ds(t0, t_block), :]  # (T, N)
        decay_c = jnp.exp(dt_c[:, None, :] * A[None])  # (T, N, D)
        outer_c = jax.lax.dot_general(  # batched outer product (T, N, D)
            b_c[:, None, :], u_c[:, None, :],
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        h = h_ref[...]
        hs = []
        for t in range(t_block):  # static unroll — serial recurrence only
            h = decay_c[t] * h + outer_c[t]
            hs.append(h)
        h_ref[...] = h
        h_all = jnp.stack(hs, axis=0)  # (T, N, D)
        y_c = jax.lax.dot_general(  # batched (1,N)x(N,D) contractions
            c_c[:, None, :], h_all,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (T, 1, D)
        y_ref[0, pl.ds(t0, t_block), :] = y_c[:, 0, :].astype(y_ref.dtype)
        return ()

    jax.lax.fori_loop(0, n_blocks, outer, ())


_T_BLOCK = 16  # swept on v5e: 8 -> 13.7 ms, 16 -> 12.8 ms, 32 -> 12.9 ms
               # (vs 23.7 ms unblocked) at (160, 256, 768, 16)


@jax.jit
def _scan_pallas_call_blocked(dt, u, B, C, A):
    batch, length, d_inner = dt.shape
    n_state = A.shape[0]
    grid = (batch,)
    ldd = pl.BlockSpec((1, length, d_inner), lambda i: (i, 0, 0))
    lnn = pl.BlockSpec((1, length, n_state), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_scan_kernel_blocked, t_block=_T_BLOCK),
        out_shape=jax.ShapeDtypeStruct((batch, length, d_inner), dt.dtype),
        grid=grid,
        in_specs=[ldd, ldd, lnn, lnn,
                  pl.BlockSpec((n_state, d_inner), lambda i: (0, 0))],
        out_specs=ldd,
        scratch_shapes=[pltpu.VMEM((n_state, d_inner), jnp.float32)],
    )(dt, u, B, C, A)


@jax.jit
def _scan_pallas_call(dt, u, B, C, A):
    batch, length, d_inner = dt.shape
    n_state = A.shape[0]
    grid = (batch,)
    ldd = pl.BlockSpec((1, length, d_inner), lambda i: (i, 0, 0))
    lnn = pl.BlockSpec((1, length, n_state), lambda i: (i, 0, 0))
    return pl.pallas_call(
        _scan_kernel,
        out_shape=jax.ShapeDtypeStruct((batch, length, d_inner), dt.dtype),
        grid=grid,
        in_specs=[ldd, ldd, lnn, lnn,
                  pl.BlockSpec((n_state, d_inner), lambda i: (0, 0))],
        out_specs=ldd,
        scratch_shapes=[pltpu.VMEM((n_state, d_inner), jnp.float32)],
    )(dt, u, B, C, A)


def supported(x, A) -> bool:
    """Kernel shape constraints: lane-aligned D, small N."""
    batch, length, d_inner = x.shape
    n_state = A.shape[1]
    return d_inner % _LANE == 0 and n_state <= 32 and length >= 8


def selective_scan_pallas(x, dt, A, B, C, D=None):
    """Pallas selective scan; same contract as ops.selective_scan.

    x, dt: (batch, L, d_inner); A: (d_inner, n); B, C: (batch, L, n);
    D: (d_inner,) optional skip.
    """
    u = dt * x
    At = A.T  # (n, d_inner)
    if x.shape[1] % _T_BLOCK == 0:
        y = _scan_pallas_call_blocked(dt, u, B, C, At)
    else:
        y = _scan_pallas_call(dt, u, B, C, At)
    if D is not None:
        y = y + x * D[None, None, :]
    return y
