"""Pallas TPU kernels for the Mamba selective scan.

Why: the XLA associative-scan path materializes the discretized
(B, L, D, N) decay/drive tensors in HBM and streams them log2(L) times —
for DiM CIFAR shapes (B=160, L=256, D=768, N=16) that is ~2 GB per buffer
and measured 1.4 samples/s end-to-end. These kernels keep the recurrence
state (N, D) resident in VMEM and stream x/dt once, sequentially over L,
with the (B, L, D, N) tensor never existing anywhere.

Layout: state h is (N, D) per batch element, D on lanes (128-multiple)
and N on sublanes — every recurrence op is a well-tiled VPU elementwise
op; B/C stay in natural (L, N) layout.

Cross-shape products are all VPU broadcasts/reductions, NOT MXU dots:
at N=16 the (N,1)x(1,D) outer products and K=16 / K=D contractions are
rank-deficient matmuls that waste the 128x128 systolic array, and fp32
MXU passes cost 3-6x a bf16 pass. Measured on v5e at DiM train shapes
(B=128, L=256, D=768, N=16):

  * forward: rank-1 dot (one bf16 pass) + K=16 output dot = 2.51 ms with
    4.9e-3 relative error; broadcast multiply + sublane-sum = 2.15 ms with
    3.5e-5 error — the exact VPU form is BOTH faster and fp32-exact, so
    there is no precision/speed knob anymore (the former
    DMC_TPU_SCAN_EXACT toggle is gone: exact is the only mode).
  * backward: five HIGHEST-precision dots = 13.4 ms/call; the all-VPU
    form (broadcast outer/w, sublane-sum over N, lane-sum over D) =
    4.3 ms/call with an identical error profile vs float64.

Three kernels:
  * `_scan_kernel` — plain sequential forward (any L);
  * `_scan_kernel_blocked(_ckpt)` — forward with the input-dependent
    decay/drive for T_BLOCK steps batched into one exp + one broadcast
    multiply (the default; `_ckpt` also emits block-boundary states as
    custom_vjp residuals);
  * `_scan_bwd_kernel(_from_ckpt)` — the explicit adjoint (reverse affine
    recurrence) over VMEM-resident boundary checkpoints.

The op is exposed through `jax.custom_vjp` in ops/selective_scan.py:
forward and backward both dispatch to these kernels on TPU, with XLA
implementations as CPU fallbacks and numerical references.
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
    the N-contraction run as VPU broadcast multiply + sublane reduction
    (fp32-exact, no MXU pass).
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
        outer = b_t[0, :, None] * u_t  # (N, D) outer product on the VPU
        h = decay * h_ref[...] + outer
        h_ref[...] = h
        y_ref[0, pl.ds(t, 1), :] = jnp.sum(
            h * c_t[0, :, None], axis=0, keepdims=True
        ).astype(y_ref.dtype)
        return ()

    jax.lax.fori_loop(0, length, step, ())


def _scan_kernel_blocked(dt_ref, u_ref, b_ref, c_ref, a_ref, y_ref, h_ref,
                         *, t_block: int):
    """Time-blocked variant: per outer iteration, the input-dependent
    decay/drive for T_BLOCK steps are computed as ONE batched elementwise
    exp and ONE broadcast multiply (amortizing per-step op overhead
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
        outer_c = b_c[:, :, None] * u_c[:, None, :]  # (T, N, D), exact VPU
        h = h_ref[...]
        hs = []
        for t in range(t_block):  # static unroll — serial recurrence only
            h = decay_c[t] * h + outer_c[t]
            hs.append(h)
        h_ref[...] = h
        h_all = jnp.stack(hs, axis=0)  # (T, N, D)
        y_c = jnp.sum(h_all * c_c[:, :, None], axis=1)  # (T, D) sublane sum
        y_ref[0, pl.ds(t0, t_block), :] = y_c.astype(y_ref.dtype)
        return ()

    jax.lax.fori_loop(0, n_blocks, outer, ())


_T_BLOCK = 16   # fallback block (any L % 16 == 0)
_T_BLOCK_WIDE = 32  # preferred when L % 32 == 0

# History: with the original dot-based kernels, 16 was the optimum
# (8 -> 13.7, 16 -> 12.8, 32 -> 12.9 ms) and t_block=32 in the backward
# exceeded scoped VMEM outright. The all-VPU contractions freed enough
# VMEM that 32 now fits AND wins: backward 3.64 -> 3.09 ms/call (-15%)
# at (128, 256, 768, 16) on v5e; forward comparable-or-better. Block
# size is picked per sequence length (`t_block_for`); the forward's
# boundary-checkpoint residuals shrink 2x at 32.


def t_block_for(length: int) -> int:
    """Largest supported time block for this L (kernels require L % tb == 0)."""
    if length % _T_BLOCK_WIDE == 0:
        return _T_BLOCK_WIDE
    return _T_BLOCK


@functools.partial(jax.jit, static_argnames=("t_block",))
def _scan_pallas_call_blocked(dt, u, B, C, A, *, t_block=_T_BLOCK):
    batch, length, d_inner = dt.shape
    n_state = A.shape[0]
    grid = (batch,)
    ldd = pl.BlockSpec((1, length, d_inner), lambda i: (i, 0, 0))
    lnn = pl.BlockSpec((1, length, n_state), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_scan_kernel_blocked, t_block=t_block),
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


def _bwd_block_body(dt_c, x_c, b_c, c_c, g_c, A, h_start, phi,
                    *, t_block: int):
    """Shared reverse-sweep math for one time block (all-VPU form).

    Math (see ops/selective_scan.py:_core_bwd): the adjoint
    gamma_t = dL/dh_t obeys the REVERSE affine recurrence
    gamma_t = C_t ybar_t + a_{t+1} gamma_{t+1}. h is recomputed inside the
    block from the entering state `h_start` (static unroll); `phi` carries
    a_{t+1} gamma_{t+1} across blocks. Every cross-shape product is a VPU
    broadcast multiply or an axis reduction (sublane over N, lane over D):
    fp32-exact, no MXU pass — measured 3.1x faster than the dot-based form
    at DiM train shapes with an identical error profile vs float64.

    Returns (phi_out, dx_c, ddt_c, db_c, dc_c, da_acc).
    """
    decay_c = jnp.exp(dt_c[:, None, :] * A[None])  # (T, N, D)
    u_c = dt_c * x_c
    outer_c = b_c[:, :, None] * u_c[:, None, :]  # (T, N, D)
    w_c = c_c[:, :, None] * g_c[:, None, :]  # (T, N, D) = C_t (x) ybar_t

    # recompute h (and h_prev) within the block, ascending
    h = h_start
    h_prevs = []
    hs = []
    for t in range(t_block):
        h_prevs.append(h)
        h = decay_c[t] * h + outer_c[t]
        hs.append(h)

    # reverse sweep: only the gamma recurrence is serial; every gradient
    # contraction batches over the block.
    gammas = []
    for t in range(t_block - 1, -1, -1):
        gamma = w_c[t] + phi  # (N, D)
        gammas.append(gamma)
        phi = decay_c[t] * gamma
    gamma_all = jnp.stack(gammas[::-1], axis=0)  # (T, N, D) ascending
    h_all = jnp.stack(hs, axis=0)  # (T, N, D)
    h_prev_all = jnp.stack(h_prevs, axis=0)  # (T, N, D)

    da_all = gamma_all * h_prev_all  # (T, N, D)
    gB = jnp.sum(gamma_all * b_c[:, :, None], axis=1)  # (T, D) sublane sum
    dadec = da_all * decay_c  # (T, N, D)
    ddt_c = jnp.sum(dadec * A[None], axis=1) + gB * x_c  # (T, D)
    dx_c = gB * dt_c  # (T, D)
    db_c = jnp.sum(gamma_all * u_c[:, None, :], axis=2)  # (T, N) lane sum
    dc_c = jnp.sum(h_all * g_c[:, None, :], axis=2)  # (T, N) lane sum
    da_acc = jnp.sum(dadec * dt_c[:, None, :], axis=0)  # (N, D)
    return phi, dx_c, ddt_c, db_c, dc_c, da_acc


def _scan_bwd_kernel(dt_ref, x_ref, b_ref, c_ref, a_ref, g_ref,
                     dx_ref, ddt_ref, db_ref, dc_ref, da_ref,
                     h_ref, bound_ref, *, t_block: int):
    """Backward pass for the selective scan, one batch element per program.

    Phase 1 sweeps forward storing h at t_block boundaries in VMEM;
    phase 2 sweeps blocks in reverse via `_bwd_block_body`. Used only when
    the forward ran without checkpoint residuals (see `_core_bwd`).

    Refs: dt/x/g (1, L, D); b/c (1, L, N); a (N, D) [=A^T];
    outs dx/ddt (1, L, D); db/dc (1, L, N); da (1, N, D) partial;
    scratch h (N, D), bound (L/t_block, N, D).
    """
    length = dt_ref.shape[1]
    n_blocks = length // t_block
    A = a_ref[...]  # (N, D)

    # ---- phase 1: forward, store block-boundary states -----------------
    h_ref[...] = jnp.zeros_like(h_ref)

    def fwd_block(k, _):
        bound_ref[k] = h_ref[...]
        t0 = k * t_block
        dt_c = dt_ref[0, pl.ds(t0, t_block), :]
        x_c = x_ref[0, pl.ds(t0, t_block), :]
        b_c = b_ref[0, pl.ds(t0, t_block), :]
        decay_c = jnp.exp(dt_c[:, None, :] * A[None])
        u_c = dt_c * x_c
        outer_c = b_c[:, :, None] * u_c[:, None, :]
        h = h_ref[...]
        for t in range(t_block):
            h = decay_c[t] * h + outer_c[t]
        h_ref[...] = h
        return ()

    jax.lax.fori_loop(0, n_blocks, fwd_block, ())

    # ---- phase 2: reverse over blocks, gamma carried as phi ------------
    h_ref[...] = jnp.zeros_like(h_ref)  # reuse as phi = a_{t+1} gamma_{t+1}

    def bwd_block(i, _):
        k = n_blocks - 1 - i
        t0 = k * t_block
        phi, dx_c, ddt_c, db_c, dc_c, da_acc = _bwd_block_body(
            dt_ref[0, pl.ds(t0, t_block), :],
            x_ref[0, pl.ds(t0, t_block), :],
            b_ref[0, pl.ds(t0, t_block), :],
            c_ref[0, pl.ds(t0, t_block), :],
            g_ref[0, pl.ds(t0, t_block), :],
            A, bound_ref[k], h_ref[...], t_block=t_block,
        )
        h_ref[...] = phi
        dx_ref[0, pl.ds(t0, t_block), :] = dx_c
        ddt_ref[0, pl.ds(t0, t_block), :] = ddt_c
        db_ref[0, pl.ds(t0, t_block), :] = db_c
        dc_ref[0, pl.ds(t0, t_block), :] = dc_c
        da_ref[0] = jnp.where(i == 0, da_acc, da_ref[0] + da_acc)
        return ()

    jax.lax.fori_loop(0, n_blocks, bwd_block, ())


def _scan_kernel_blocked_ckpt(dt_ref, u_ref, b_ref, c_ref, a_ref,
                              y_ref, bound_ref, h_ref, *, t_block: int):
    """Blocked forward that ALSO emits block-boundary states.

    Identical recurrence to `_scan_kernel_blocked`, plus one (N, D) write
    per block: the state ENTERING block k. Saved as a custom_vjp residual
    so the backward pass skips its phase-1 forward recompute entirely
    (phase 1 was ~1/3 of the backward kernel's time).
    """
    length = dt_ref.shape[1]
    h_ref[...] = jnp.zeros_like(h_ref)
    A = a_ref[...]  # (N, D)
    n_blocks = length // t_block

    def outer(k, _):
        bound_ref[0, k] = h_ref[...]
        t0 = k * t_block
        dt_c = dt_ref[0, pl.ds(t0, t_block), :]
        u_c = u_ref[0, pl.ds(t0, t_block), :]
        b_c = b_ref[0, pl.ds(t0, t_block), :]
        c_c = c_ref[0, pl.ds(t0, t_block), :]
        decay_c = jnp.exp(dt_c[:, None, :] * A[None])
        outer_c = b_c[:, :, None] * u_c[:, None, :]
        h = h_ref[...]
        hs = []
        for t in range(t_block):
            h = decay_c[t] * h + outer_c[t]
            hs.append(h)
        h_ref[...] = h
        h_all = jnp.stack(hs, axis=0)
        y_c = jnp.sum(h_all * c_c[:, :, None], axis=1)
        y_ref[0, pl.ds(t0, t_block), :] = y_c.astype(y_ref.dtype)
        return ()

    jax.lax.fori_loop(0, n_blocks, outer, ())


@functools.partial(jax.jit, static_argnames=("t_block",))
def _scan_fwd_ckpt_pallas_call(dt, u, B, C, A, *, t_block=_T_BLOCK):
    """(y, bound): forward outputs plus boundary states (B, nb, N, D)."""
    batch, length, d_inner = dt.shape
    n_state = A.shape[0]
    n_blocks = length // t_block
    ldd = pl.BlockSpec((1, length, d_inner), lambda i: (i, 0, 0))
    lnn = pl.BlockSpec((1, length, n_state), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_scan_kernel_blocked_ckpt, t_block=t_block),
        out_shape=(
            jax.ShapeDtypeStruct((batch, length, d_inner), dt.dtype),
            jax.ShapeDtypeStruct((batch, n_blocks, n_state, d_inner),
                                 jnp.float32),
        ),
        grid=(batch,),
        in_specs=[ldd, ldd, lnn, lnn,
                  pl.BlockSpec((n_state, d_inner), lambda i: (0, 0))],
        out_specs=(
            ldd,
            pl.BlockSpec((1, n_blocks, n_state, d_inner),
                         lambda i: (i, 0, 0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((n_state, d_inner), jnp.float32)],
    )(dt, u, B, C, A)


def selective_scan_fwd_ckpt_pallas(x, dt, A, B, C):
    """Core forward + boundary checkpoints (for the custom_vjp fwd pass).

    Returns (y_core, bound). The caller adds the D-skip; bound feeds
    `selective_scan_bwd_from_ckpt_pallas` (which infers t_block from the
    bound shape). Requires length % 16 == 0 (callers gate on that).
    """
    return _scan_fwd_ckpt_pallas_call(
        dt, dt * x, B, C, A.T, t_block=t_block_for(x.shape[1])
    )


def _scan_fwd_ckpt_kernel_grid(dt_ref, u_ref, b_ref, c_ref, a_ref,
                               y_ref, bound_ref, h_ref, *, t_block: int):
    """Grid-over-L forward: grid = (batch, n_blocks), one TIME BLOCK per
    program. TPU grids execute sequentially on the core, so the recurrence
    state carries across grid steps in VMEM scratch; Pallas's automatic
    block pipelining prefetches block k+1's dt/u/b/c from HBM while block
    k computes — the fori_loop variants' manual `pl.ds` loads serialize
    load->compute instead. Same math as `_scan_kernel_blocked_ckpt`.

    Refs per program: dt/u (1, T, D); b/c (1, T, N); a (N, D);
    y (1, T, D); bound (1, 1, N, D); scratch h (N, D).

    MEASURED (round 2, v5e, B=128 L=256 D=768 N=16): no speedup over the
    fori_loop kernels — fwd 1.47 vs 1.48 ms, bwd 3.31 vs 3.29 ms — the
    kernels are exp/VPU-bound, not HBM-stall-bound, so prefetch overlap
    buys nothing (docs/benchmarks.md). Kept parity-tested as the scaffold
    for longer-L regimes; NOT the dispatch default.
    """
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)

    A = a_ref[...]  # (N, D)
    bound_ref[0, 0] = h_ref[...]  # state ENTERING this block
    decay_c = jnp.exp(dt_ref[0][:, None, :] * A[None])  # (T, N, D)
    outer_c = b_ref[0][:, :, None] * u_ref[0][:, None, :]
    h = h_ref[...]
    hs = []
    for t in range(t_block):  # static unroll — serial recurrence only
        h = decay_c[t] * h + outer_c[t]
        hs.append(h)
    h_ref[...] = h
    h_all = jnp.stack(hs, axis=0)
    y_ref[0] = jnp.sum(
        h_all * c_ref[0][:, :, None], axis=1
    ).astype(y_ref.dtype)


def _scan_bwd_from_ckpt_kernel_grid(dt_ref, x_ref, b_ref, c_ref, a_ref,
                                    g_ref, bound_ref, dx_ref, ddt_ref,
                                    db_ref, dc_ref, da_ref, h_ref,
                                    *, t_block: int):
    """Grid-over-L backward: grid = (batch, n_blocks) with the TIME index
    map REVERSED (program k processes block n_blocks-1-k), so blocks run
    latest-first while Pallas prefetches the next (earlier) block's
    inputs. phi (= a_{t+1} gamma_{t+1}) carries across grid steps in
    scratch; dA accumulates into the per-batch output block, which stays
    resident because its index map is constant in k (the standard
    reduction-dim revisiting pattern)."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)

    A = a_ref[...]  # (N, D)
    phi, dx_c, ddt_c, db_c, dc_c, da_acc = _bwd_block_body(
        dt_ref[0], x_ref[0], b_ref[0], c_ref[0], g_ref[0],
        A, bound_ref[0, 0], h_ref[...], t_block=t_block,
    )
    h_ref[...] = phi
    dx_ref[0] = dx_c
    ddt_ref[0] = ddt_c
    db_ref[0] = db_c
    dc_ref[0] = dc_c
    da_ref[0] = jnp.where(k == 0, da_acc, da_ref[0] + da_acc)


@functools.partial(jax.jit, static_argnames=("t_block",))
def _scan_fwd_ckpt_grid_call(dt, u, B, C, A, *, t_block):
    batch, length, d_inner = dt.shape
    n_state = A.shape[0]
    n_blocks = length // t_block
    tdd = pl.BlockSpec((1, t_block, d_inner), lambda i, k: (i, k, 0))
    tnn = pl.BlockSpec((1, t_block, n_state), lambda i, k: (i, k, 0))
    return pl.pallas_call(
        functools.partial(_scan_fwd_ckpt_kernel_grid, t_block=t_block),
        out_shape=(
            jax.ShapeDtypeStruct((batch, length, d_inner), dt.dtype),
            jax.ShapeDtypeStruct((batch, n_blocks, n_state, d_inner),
                                 jnp.float32),
        ),
        grid=(batch, n_blocks),
        in_specs=[tdd, tdd, tnn, tnn,
                  pl.BlockSpec((n_state, d_inner), lambda i, k: (0, 0))],
        out_specs=(
            tdd,
            pl.BlockSpec((1, 1, n_state, d_inner),
                         lambda i, k: (i, k, 0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((n_state, d_inner), jnp.float32)],
    )(dt, u, B, C, A)


@jax.jit
def _scan_bwd_from_ckpt_grid_call(dt, x, B, C, A, g, bound):
    batch, length, d_inner = dt.shape
    n_state = A.shape[0]
    n_blocks = bound.shape[1]  # t_block inferred from the residual
    t_block = length // n_blocks
    rev = lambda i, k: (i, n_blocks - 1 - k, 0)
    tdd = pl.BlockSpec((1, t_block, d_inner), rev)
    tnn = pl.BlockSpec((1, t_block, n_state), rev)
    dx, ddt, dB, dC, dA_part = pl.pallas_call(
        functools.partial(_scan_bwd_from_ckpt_kernel_grid, t_block=t_block),
        out_shape=(
            jax.ShapeDtypeStruct((batch, length, d_inner), dt.dtype),
            jax.ShapeDtypeStruct((batch, length, d_inner), dt.dtype),
            jax.ShapeDtypeStruct((batch, length, n_state), dt.dtype),
            jax.ShapeDtypeStruct((batch, length, n_state), dt.dtype),
            jax.ShapeDtypeStruct((batch, n_state, d_inner), dt.dtype),
        ),
        grid=(batch, n_blocks),
        in_specs=[tdd, tdd, tnn, tnn,
                  pl.BlockSpec((n_state, d_inner), lambda i, k: (0, 0)),
                  tdd,
                  pl.BlockSpec((1, 1, n_state, d_inner),
                               lambda i, k: (i, n_blocks - 1 - k, 0, 0))],
        out_specs=(tdd, tdd, tnn, tnn,
                   pl.BlockSpec((1, n_state, d_inner),
                                lambda i, k: (i, 0, 0))),
        scratch_shapes=[pltpu.VMEM((n_state, d_inner), jnp.float32)],
    )(dt, x, B, C, A, g, bound)
    return dx, ddt, dA_part.sum(axis=0).T, dB, dC


def selective_scan_fwd_ckpt_pallas_grid(x, dt, A, B, C, t_block=None):
    """Grid-over-L pipelined forward + boundary checkpoints."""
    if t_block is None:
        t_block = t_block_for(x.shape[1])
    return _scan_fwd_ckpt_grid_call(dt, dt * x, B, C, A.T, t_block=t_block)


def selective_scan_bwd_from_ckpt_pallas_grid(x, dt, A, B, C, g, bound):
    """Grid-over-L pipelined backward from forward-saved checkpoints."""
    return _scan_bwd_from_ckpt_grid_call(dt, x, B, C, A.T, g, bound)


def _scan_bwd_kernel_from_ckpt(dt_ref, x_ref, b_ref, c_ref, a_ref, g_ref,
                               bound_ref, dx_ref, ddt_ref, db_ref, dc_ref,
                               da_ref, h_ref, *, t_block: int):
    """Backward WITHOUT phase 1: boundary states arrive as an input
    (emitted by the forward pass), so only the reverse block sweep runs.
    See `_bwd_block_body` for the math."""
    length = dt_ref.shape[1]
    n_blocks = length // t_block
    A = a_ref[...]  # (N, D)

    h_ref[...] = jnp.zeros_like(h_ref)  # phi = a_{t+1} gamma_{t+1}

    def bwd_block(i, _):
        k = n_blocks - 1 - i
        t0 = k * t_block
        phi, dx_c, ddt_c, db_c, dc_c, da_acc = _bwd_block_body(
            dt_ref[0, pl.ds(t0, t_block), :],
            x_ref[0, pl.ds(t0, t_block), :],
            b_ref[0, pl.ds(t0, t_block), :],
            c_ref[0, pl.ds(t0, t_block), :],
            g_ref[0, pl.ds(t0, t_block), :],
            A, bound_ref[0, k], h_ref[...], t_block=t_block,
        )
        h_ref[...] = phi
        dx_ref[0, pl.ds(t0, t_block), :] = dx_c
        ddt_ref[0, pl.ds(t0, t_block), :] = ddt_c
        db_ref[0, pl.ds(t0, t_block), :] = db_c
        dc_ref[0, pl.ds(t0, t_block), :] = dc_c
        da_ref[0] = jnp.where(i == 0, da_acc, da_ref[0] + da_acc)
        return ()

    jax.lax.fori_loop(0, n_blocks, bwd_block, ())


@jax.jit
def _scan_bwd_from_ckpt_pallas_call(dt, x, B, C, A, g, bound):
    batch, length, d_inner = dt.shape
    n_state = A.shape[0]
    n_blocks = bound.shape[1]  # t_block inferred from the residual
    t_block = length // n_blocks
    ldd = pl.BlockSpec((1, length, d_inner), lambda i: (i, 0, 0))
    lnn = pl.BlockSpec((1, length, n_state), lambda i: (i, 0, 0))
    lnd = pl.BlockSpec((1, n_state, d_inner), lambda i: (i, 0, 0))
    dx, ddt, dB, dC, dA_part = pl.pallas_call(
        functools.partial(_scan_bwd_kernel_from_ckpt, t_block=t_block),
        out_shape=(
            jax.ShapeDtypeStruct((batch, length, d_inner), dt.dtype),
            jax.ShapeDtypeStruct((batch, length, d_inner), dt.dtype),
            jax.ShapeDtypeStruct((batch, length, n_state), dt.dtype),
            jax.ShapeDtypeStruct((batch, length, n_state), dt.dtype),
            jax.ShapeDtypeStruct((batch, n_state, d_inner), dt.dtype),
        ),
        grid=(batch,),
        in_specs=[ldd, ldd, lnn, lnn,
                  pl.BlockSpec((n_state, d_inner), lambda i: (0, 0)), ldd,
                  pl.BlockSpec((1, n_blocks, n_state, d_inner),
                               lambda i: (i, 0, 0, 0))],
        out_specs=(ldd, ldd, lnn, lnn, lnd),
        scratch_shapes=[pltpu.VMEM((n_state, d_inner), jnp.float32)],
    )(dt, x, B, C, A, g, bound)
    return dx, ddt, dA_part.sum(axis=0).T, dB, dC


def selective_scan_bwd_from_ckpt_pallas(x, dt, A, B, C, g, bound):
    """Gradients using forward-saved boundary checkpoints (no phase 1)."""
    return _scan_bwd_from_ckpt_pallas_call(dt, x, B, C, A.T, g, bound)


@jax.jit
def _scan_bwd_pallas_call(dt, x, B, C, A, g):
    batch, length, d_inner = dt.shape
    n_state = A.shape[0]
    ldd = pl.BlockSpec((1, length, d_inner), lambda i: (i, 0, 0))
    lnn = pl.BlockSpec((1, length, n_state), lambda i: (i, 0, 0))
    lnd = pl.BlockSpec((1, n_state, d_inner), lambda i: (i, 0, 0))
    dx, ddt, dB, dC, dA_part = pl.pallas_call(
        functools.partial(_scan_bwd_kernel, t_block=_T_BLOCK),
        out_shape=(
            jax.ShapeDtypeStruct((batch, length, d_inner), dt.dtype),
            jax.ShapeDtypeStruct((batch, length, d_inner), dt.dtype),
            jax.ShapeDtypeStruct((batch, length, n_state), dt.dtype),
            jax.ShapeDtypeStruct((batch, length, n_state), dt.dtype),
            jax.ShapeDtypeStruct((batch, n_state, d_inner), dt.dtype),
        ),
        grid=(batch,),
        in_specs=[ldd, ldd, lnn, lnn,
                  pl.BlockSpec((n_state, d_inner), lambda i: (0, 0)), ldd],
        out_specs=(ldd, ldd, lnn, lnn, lnd),
        scratch_shapes=[
            pltpu.VMEM((n_state, d_inner), jnp.float32),
            pltpu.VMEM(
                (max(1, dt.shape[1] // _T_BLOCK), n_state, d_inner),
                jnp.float32,
            ),
        ],
    )(dt, x, B, C, A, g)
    return dx, ddt, dA_part.sum(axis=0).T, dB, dC


def selective_scan_bwd_pallas(x, dt, A, B, C, g):
    """Gradients (dx, ddt, dA, dB, dC) of the core scan wrt upstream g."""
    return _scan_bwd_pallas_call(dt, x, B, C, A.T, g)


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
        y = _scan_pallas_call_blocked(
            dt, u, B, C, At, t_block=t_block_for(x.shape[1])
        )
    else:
        y = _scan_pallas_call(dt, u, B, C, At)
    if D is not None:
        y = y + x * D[None, None, :]
    return y
