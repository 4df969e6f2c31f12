"""Selective-state-space scan (the Mamba recurrence) for TPU.

TPU-native replacement for the reference's `mamba_ssm` CUDA selective-scan
dependency (reference models/dim.py:11-17,104-109). The recurrence

    h_t = exp(dt_t * A) * h_{t-1} + dt_t * B_t * x_t
    y_t = C_t . h_t + D * x_t

is a first-order affine recurrence, so it maps onto a parallel
`associative_scan` over (decay, increment) pairs: O(log L) depth, fully
vectorized over (batch, channel, state) — the TPU answer to the CUDA
sequential-scan kernel. A chunked variant bounds peak memory for long
sequences by scanning over chunks with carried state.
"""

from __future__ import annotations

import contextlib
import functools
import threading
from typing import Optional

import jax
import jax.numpy as jnp

_TP_STATE = threading.local()


@contextlib.contextmanager
def scan_tensor_parallel(mesh, axis: str = "model",
                         batch_axis: Optional[str] = "auto"):
    """Run selective scans sharded over `axis` of `mesh` within this scope.

    The recurrence is elementwise-independent across d_inner, so tensor
    parallelism is a pure shard_map over the channel axis: x/dt/A/D split
    on d_inner, B/C replicated over `axis`, no collectives inside. This is
    how the Pallas kernel participates in TP — GSPMD cannot partition an
    opaque `pallas_call`, so the op wraps itself in shard_map at trace
    time when this context is active (the model code never changes).

    `batch_axis` additionally splits the batch dimension of every operand
    over that mesh axis — REQUIRED under a DP x TP mesh: an unmentioned
    mesh axis means 'replicated' to shard_map, so leaving the data axis
    out would all-gather the full global batch onto every dp replica and
    scan it dp-fold redundantly. 'auto' uses the mesh's 'data' axis when
    present; None replicates the batch (single-axis TP-only meshes).
    """
    if batch_axis == "auto":
        batch_axis = "data" if "data" in mesh.axis_names else None
    prev = getattr(_TP_STATE, "ctx", None)
    _TP_STATE.ctx = (mesh, axis, batch_axis)
    try:
        yield
    finally:
        _TP_STATE.ctx = prev


def _tp_ctx():
    return getattr(_TP_STATE, "ctx", None)


def _affine_combine(left, right):
    """Compose affine maps h -> a*h + b applied left-then-right."""
    a_l, b_l = left
    a_r, b_r = right
    return a_r * a_l, a_r * b_l + b_r


def associative_affine_scan(a: jnp.ndarray, b: jnp.ndarray, axis: int = 1):
    """All-prefix solutions of h_t = a_t*h_{t-1} + b_t with h_{-1} = 0."""
    _, h = jax.lax.associative_scan(_affine_combine, (a, b), axis=axis)
    return h


def _auto_chunk(batch: int, length: int, d_inner: int, n_state: int,
                budget_bytes: int = 256 * 1024 * 1024) -> Optional[int]:
    """Chunk length keeping the (B, chunk, D, N) intermediate under budget."""
    full = batch * length * d_inner * n_state * 4
    if full <= budget_bytes:
        return None
    chunk = length
    while chunk > 8 and batch * chunk * d_inner * n_state * 4 > budget_bytes:
        chunk //= 2
    while length % chunk:
        chunk -= 1
    return max(chunk, 1)


def selective_scan_xla(
    x: jnp.ndarray,
    dt: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: Optional[jnp.ndarray] = None,
    *,
    chunk_size: Optional[int] = None,
) -> jnp.ndarray:
    """Selective SSM scan.

    Args:
      x:  (batch, L, d_inner) input sequence (post conv + SiLU).
      dt: (batch, L, d_inner) positive step sizes (post softplus).
      A:  (d_inner, d_state) state matrix (negative real).
      B:  (batch, L, d_state) input-dependent input matrix.
      C:  (batch, L, d_state) input-dependent output matrix.
      D:  (d_inner,) skip connection, optional.
      chunk_size: if set, scan sequentially over chunks of this length with
        an associative scan inside each chunk — bounds the (B,L,D,N)
        intermediate to (B,chunk,D,N) for long sequences.

    Returns:
      y: (batch, L, d_inner)
    """
    zero = jnp.zeros((x.shape[0], x.shape[2], A.shape[1]), x.dtype)
    y, _ = _scan_state_impl(x, dt, A, B, C, zero, chunk=chunk_size)
    if D is not None:
        y = y + x * D[None, None, :]
    return y


@jax.custom_vjp
def _selective_scan_core(x, dt, A, B, C):
    """Dispatch: Pallas TPU kernel when enabled and shapes fit, else the
    XLA associative scan with automatic memory-bounded chunking."""
    from . import dispatch

    if dispatch.pallas_enabled():
        from . import selective_scan_pallas as ssp

        if ssp.supported(x, A):
            return ssp.selective_scan_pallas(x, dt, A, B, C, None)
    chunk = _auto_chunk(x.shape[0], x.shape[1], x.shape[2], A.shape[1])
    return selective_scan_xla(x, dt, A, B, C, None, chunk_size=chunk)


def _core_fwd(x, dt, A, B, C):
    """VJP forward: on the Pallas path, emit block-boundary states as an
    extra residual so the backward kernel skips its phase-1 forward
    recompute (ops/selective_scan_pallas.py:_scan_bwd_kernel_from_ckpt)."""
    from . import dispatch

    if dispatch.pallas_enabled():
        from . import selective_scan_pallas as ssp

        if ssp.supported(x, A) and x.shape[1] % ssp._T_BLOCK == 0:
            y, bound = ssp.selective_scan_fwd_ckpt_pallas(x, dt, A, B, C)
            return y, (x, dt, A, B, C, bound)
    return _selective_scan_core(x, dt, A, B, C), (x, dt, A, B, C, None)


def _bwd_chunk_size(batch, d_inner, n_state,
                    budget_bytes: int = 192 * 1024 * 1024) -> int:
    """Chunk K bounding the (K, B, D, N) recomputed-state stack."""
    per_step = batch * d_inner * n_state * 4
    return max(4, min(64, budget_bytes // per_step))


def _core_bwd(residuals, g):
    """Dispatch for the analytic backward: Pallas kernels when eligible,
    else `_analytic_bwd` (zero initial state / zero incoming adjoint)."""
    x, dt, A, B, C, bound = residuals
    from . import dispatch

    if dispatch.pallas_enabled():
        from . import selective_scan_pallas as ssp

        if ssp.supported(x, A) and x.shape[1] % ssp._T_BLOCK == 0:
            if bound is not None:
                return ssp.selective_scan_bwd_from_ckpt_pallas(
                    x, dt, A, B, C, g, bound
                )
            return ssp.selective_scan_bwd_pallas(x, dt, A, B, C, g)
    return _analytic_bwd(x, dt, A, B, C, g)[:5]


def _analytic_bwd(x, dt, A, B, C, g, h0=None, phi0=None):
    """Explicit analytic backward (recompute with boundary checkpoints).

    For the recurrence h_t = a_t h_{t-1} + b_t, y_t = C_t . h_t with
    a = exp(dt*A), b = dt*B*x, the adjoint gamma_t = dL/dh_t satisfies the
    REVERSE affine recurrence gamma_t = C_t ybar_t + a_{t+1} gamma_{t+1};
    all parameter gradients are elementwise functions of (gamma, h_{t-1},
    a, inputs). We checkpoint h at chunk boundaries in one forward sweep,
    then walk chunks in reverse, recomputing h inside each chunk — peak
    memory is one (K, B, D, N) stack instead of (B, L, D, N).

    Written with plain lax.scan + explicit formulas: differentiating
    XLA's associative_scan combinator network (the jax.vjp route) blows up
    TPU compilation at production sizes. On TPU the same math runs as a
    Pallas kernel (ops/selective_scan_pallas.py:_scan_bwd_kernel) with the
    boundary checkpoints resident in VMEM.

    Generalized for the distributed (sequence-parallel) scan: `h0` is the
    incoming state h_{-1} (default zeros) and `phi0` the incoming adjoint
    dL/dh_{L-1} from a downstream consumer of the FINAL state (default
    zeros). Returns (dx, ddt, dA, dB, dC, dh0) — dh0 = a_0^T gamma_0, the
    cotangent of the incoming state.
    """
    batch, length, d_inner = x.shape
    n_state = A.shape[1]
    K = _bwd_chunk_size(batch, d_inner, n_state)
    while length % K:
        K -= 1
    n_chunks = length // K

    def split_chunks(arr):  # (B, L, ...) -> (n_chunks, K, B, ...)
        return (
            arr.reshape(batch, n_chunks, K, *arr.shape[2:])
            .swapaxes(0, 1)
            .swapaxes(1, 2)
        )

    dt_c = split_chunks(dt)      # (nc, K, B, D)
    x_c = split_chunks(x)
    B_c = split_chunks(B)        # (nc, K, B, N)
    C_c = split_chunks(C)
    g_c = split_chunks(g)        # (nc, K, B, D)

    def step_fwd(h, inputs):
        dt_t, x_t, b_t = inputs  # (B,D), (B,D), (B,N)
        a_t = jnp.exp(dt_t[:, :, None] * A[None])          # (B,D,N)
        h_new = a_t * h + (dt_t * x_t)[:, :, None] * b_t[:, None, :]
        return h_new, None

    # ---- pass 1: boundary states h at the START of each chunk ----------
    def chunk_fwd(h, inputs):
        h_end, _ = jax.lax.scan(step_fwd, h, inputs)
        return h_end, h  # emit the state entering this chunk

    if h0 is None:
        h0 = jnp.zeros((batch, d_inner, n_state), x.dtype)
    _, h_starts = jax.lax.scan(chunk_fwd, h0, (dt_c, x_c, B_c))

    # ---- pass 2: reverse over chunks ------------------------------------
    def chunk_bwd(carry, inputs):
        phi, dA_acc = carry  # phi = a_{t+1} gamma_{t+1} entering from later
        dt_k, x_k, b_k, c_k, g_k, h_start = inputs

        # recompute h_{t-1} for every step of the chunk (ascending)
        def step_hprev(h, ins):
            h_new, _ = step_fwd(h, ins)
            return h_new, h  # emit h BEFORE this step

        _, h_prev_k = jax.lax.scan(step_hprev, h_start, (dt_k, x_k, b_k))

        # reverse sweep within the chunk
        def step_rev(phi, ins):
            dt_t, x_t, b_t, c_t, g_t, h_prev = ins
            a_t = jnp.exp(dt_t[:, :, None] * A[None])
            gamma = g_t[:, :, None] * c_t[:, None, :] + phi     # (B,D,N)
            h_t = a_t * h_prev + (dt_t * x_t)[:, :, None] * b_t[:, None, :]
            da = gamma * h_prev
            dC_t = jnp.einsum("bd,bdn->bn", g_t, h_t)
            gB = jnp.einsum("bdn,bn->bd", gamma, b_t)            # sum_n γB
            ddt_t = jnp.einsum("bdn,dn->bd", da * a_t, A) + gB * x_t
            dx_t = gB * dt_t
            dB_t = jnp.einsum("bdn,bd->bn", gamma, dt_t * x_t)
            dA_t = jnp.einsum("bdn,bd->dn", da * a_t, dt_t)
            return a_t * gamma, (dx_t, ddt_t, dB_t, dC_t, dA_t)

        phi, outs = jax.lax.scan(
            step_rev, phi,
            (dt_k, x_k, b_k, c_k, g_k, h_prev_k),
            reverse=True,
        )
        dx_k, ddt_k, dB_k, dC_k, dA_k = outs
        return (phi, dA_acc + dA_k.sum(0)), (dx_k, ddt_k, dB_k, dC_k)

    if phi0 is None:
        phi0 = jnp.zeros((batch, d_inner, n_state), x.dtype)
    dA0 = jnp.zeros_like(A)
    (dh0, dA), (dx_c, ddt_c, dB_c, dC_c) = jax.lax.scan(
        chunk_bwd, (phi0, dA0),
        (dt_c, x_c, B_c, C_c, g_c, h_starts),
        reverse=True,
    )

    def merge_chunks(arr):  # (nc, K, B, ...) -> (B, L, ...)
        return (
            arr.swapaxes(1, 2)
            .swapaxes(0, 1)
            .reshape(batch, length, *arr.shape[3:])
        )

    return (
        merge_chunks(dx_c),
        merge_chunks(ddt_c),
        dA,
        merge_chunks(dB_c),
        merge_chunks(dC_c),
        dh0,
    )


_selective_scan_core.defvjp(_core_fwd, _core_bwd)


# ---- scan with an explicit initial/final state (distributed SP core) -------

@jax.custom_vjp
def selective_scan_with_state(x, dt, A, B, C, h_in):
    """Selective scan with initial state h_in (batch, d_inner, d_state);
    returns (y, h_out). The building block of the DISTRIBUTED scan
    (parallel/dim_sequence_parallel.py): each sequence shard runs this
    locally, and only the (B, D, N) state summaries cross devices.

    Differentiable via the same analytic adjoint as the main scan
    (chunked recompute, no autodiff through associative_scan combinators
    — that route blows up TPU compilation at production sizes) with the
    h_in/h_out cotangents threaded through the reverse recurrence.
    """
    return _scan_state_impl(x, dt, A, B, C, h_in)


def _scan_state_impl(x, dt, A, B, C, h_in, chunk="auto"):
    """Forward scan with initial state h_in -> (y, h_out). The ONE chunked
    scan implementation — selective_scan_xla and the distributed-SP core
    both route here (chunk: "auto" = memory-budgeted via _auto_chunk;
    None = unchunked; int = that chunk length)."""
    batch, length, d_inner = x.shape
    d_state = A.shape[1]
    # Discretize: decay a = exp(dt*A), drive b = dt*B*x  — (B, L, D, N)
    dA = jnp.exp(dt[..., None] * A[None, None])
    dBx = dt[..., None] * B[:, :, None, :] * x[..., None]
    if chunk == "auto":
        chunk = _auto_chunk(batch, length, d_inner, d_state)
    if chunk is None or length <= chunk:
        a_cum, h_free = jax.lax.associative_scan(
            _affine_combine, (dA, dBx), axis=1
        )
        # fold in the initial state: h_t += (prod a_{<=t}) * h_in
        # (XLA folds this away when h_in is a zeros constant)
        h = h_free + a_cum * h_in[:, None]
        return jnp.einsum("bldn,bln->bld", h, C), h[:, -1]
    assert length % chunk == 0, "sequence length must divide chunk_size"
    n_chunks = length // chunk
    dA_c = dA.reshape(batch, n_chunks, chunk, d_inner, d_state)
    dBx_c = dBx.reshape(batch, n_chunks, chunk, d_inner, d_state)
    C_c = C.reshape(batch, n_chunks, chunk, d_state)

    def chunk_step(h_prev, inputs):
        a, b, c = inputs  # (B, chunk, D, N), (B, chunk, D, N), (B, chunk, N)
        h = associative_affine_scan(a, b, axis=1)
        # fold in the carried state: h_t += (prod a_{<=t}) * h_prev
        a_cum = jnp.cumprod(a, axis=1)
        h = h + a_cum * h_prev[:, None]
        return h[:, -1], jnp.einsum("bldn,bln->bld", h, c)

    h_out, y = jax.lax.scan(
        chunk_step, h_in,
        (dA_c.transpose(1, 0, 2, 3, 4), dBx_c.transpose(1, 0, 2, 3, 4),
         C_c.transpose(1, 0, 2, 3)),
    )
    return y.transpose(1, 0, 2, 3).reshape(batch, length, d_inner), h_out


def _sws_fwd(x, dt, A, B, C, h_in):
    out = _scan_state_impl(x, dt, A, B, C, h_in)
    return out, (x, dt, A, B, C, h_in)


def _sws_bwd(residuals, g):
    x, dt, A, B, C, h_in = residuals
    g_y, g_hout = g
    return _analytic_bwd(x, dt, A, B, C, g_y, h0=h_in, phi0=g_hout)


selective_scan_with_state.defvjp(_sws_fwd, _sws_bwd)


def selective_scan(
    x: jnp.ndarray,
    dt: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: Optional[jnp.ndarray] = None,
    *,
    chunk_size: Optional[int] = None,
) -> jnp.ndarray:
    """Public selective scan: Pallas kernel on TPU / chunked XLA fallback,
    differentiable via recompute (see module docstring for semantics).

    `chunk_size` forces the XLA chunked path with that chunk (used by
    tests); the default dispatches automatically.
    """
    if chunk_size is not None:
        return selective_scan_xla(x, dt, A, B, C, D, chunk_size=chunk_size)
    ctx = _tp_ctx()
    if ctx is not None:
        from jax.sharding import PartitionSpec as P

        mesh, axis, batch_axis = ctx
        bld = P(batch_axis, None, axis)  # (batch, L, d_inner)
        bln = P(batch_axis, None, None)  # (batch, L, n)
        core = jax.shard_map(
            _selective_scan_core,
            mesh=mesh,
            in_specs=(
                bld,            # x: batch + d_inner sharded
                bld,            # dt
                P(axis, None),  # A: (d_inner, n)
                bln,            # B: replicated over the model axis only
                bln,            # C
            ),
            out_specs=bld,
            check_vma=False,
        )
        y = core(x, dt, A, B, C)
    else:
        y = _selective_scan_core(x, dt, A, B, C)
    if D is not None:
        y = y + x * D[None, None, :]
    return y


def selective_scan_sequential(
    x: jnp.ndarray,
    dt: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """O(L)-step sequential reference implementation (for parity tests)."""
    dA = jnp.exp(dt[..., None] * A[None, None])
    dBx = dt[..., None] * B[:, :, None, :] * x[..., None]

    def step(h, inputs):
        a, b, c = inputs
        h = a * h + b
        y = jnp.einsum("bdn,bn->bd", h, c)
        return h, y

    batch, _, d_inner = x.shape
    d_state = A.shape[1]
    h0 = jnp.zeros((batch, d_inner, d_state), x.dtype)
    _, ys = jax.lax.scan(
        step,
        h0,
        (
            dA.transpose(1, 0, 2, 3),
            dBx.transpose(1, 0, 2, 3),
            C.transpose(1, 0, 2),
        ),
    )
    y = ys.transpose(1, 0, 2)
    if D is not None:
        y = y + x * D[None, None, :]
    return y
