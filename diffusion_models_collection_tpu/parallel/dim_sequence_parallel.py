"""Sequence parallelism for the DiM (Mamba) backbone over a (data, seq) mesh.

The reference has no sequence sharding at all (SURVEY.md §2.3); its
long-sequence story is architectural — the Mamba linear-time scan
(reference models/dim.py:104-109). This module is that story's scaling
mechanism: the patch-token axis splits over a 'seq' mesh axis and the
selective-scan recurrence runs DISTRIBUTED, the TPU way —

  * everything token-local (LayerNorm, adaLN, in/out projections, the
    MLP) computes on L/S tokens per device;
  * the causal depthwise conv exchanges a (d_conv-1)-token halo with the
    left neighbor via one `ppermute` (shard 0's halo is the causal zero
    padding, which is exactly what ppermute delivers to a non-receiver);
  * the scan itself is the classic distributed prefix: each shard runs a
    local `associative_scan` over its affine (decay, drive) pairs, the
    per-shard totals (one (B, D, N) pair each) are `all_gather`ed over
    ICI, a tiny S-length scan combines them, and each shard folds its
    incoming carry back in as  h_t += (prod a_{<=t}) * h_in.  Two
    collectives per mixer, both O(B*D*N) — independent of L.

The backward: the local scans carry the codebase's ANALYTIC adjoint
(ops.selective_scan.selective_scan_with_state — custom VJP with chunked
recompute, generalized with h_in/h_out cotangents), while the cross-
shard glue (all_gather -> psum_scatter, ppermute -> reverse ppermute,
the tiny S-length combine) is plain autodiff; shard_map's transpose
psums the per-shard parameter cotangents. Params stay replicated —
checkpoints, EMA and optimizer state are byte-identical to non-SP runs.

Exactness: same math as ops.selective_scan's XLA path, just regrouped
(floating-point association differs at shard boundaries — parity tests
use the usual 2e-5 tolerances). The Pallas kernel is not used here: the
associative formulation IS the distributed algorithm.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from .sequence_parallel import (  # noqa: F401
    DATA_AXIS,
    SEQ_AXIS,
    data_seq_mesh,
    make_token_sharded_apply,
)
from ..ops.selective_scan import _affine_combine, selective_scan_with_state

# mamba_ssm parity: DiM instantiates Mamba with its default d_conv=4
# (models/dim.py — Mamba exposes d_conv as a field but DiM never sets it).
# The halo exchange reads exactly d_conv-1 tokens from the left neighbor;
# the trainer's pre-validation imports these so the bounds cannot drift,
# and mamba_mixer asserts the conv kernel's actual width against D_CONV
# at apply time in case a future DiM plumbs d_conv through.
D_CONV = 4
CONV_HALO = D_CONV - 1


def distributed_selective_scan(x, dt, A, B, C, D=None, *, axis: str):
    """Selective SSM scan with the sequence axis sharded over mesh `axis`.

    Must run INSIDE shard_map; per-shard shapes match
    ops.selective_scan.selective_scan_xla's contract with L = L/S local
    tokens. Cross-shard state flows through one all_gather of per-shard
    (decay_total, state_total) summaries plus an S-length combine.

    The local scans are `selective_scan_with_state` — the custom-VJP
    analytic adjoint with chunked recompute — so the backward neither
    autodiffs through associative_scan combinators (TPU compile blowup at
    production sizes) nor materializes unchunked (B, L/S, D, N)
    residuals. Two local passes: one from a zero state for the per-shard
    summary, one from the combined incoming carry for the outputs (the
    first pass's y is dead code XLA eliminates).
    """
    batch, _, d_inner = x.shape
    d_state = A.shape[1]
    zero_state = jnp.zeros((batch, d_inner, d_state), x.dtype)

    # per-shard totals: decay = prod_t exp(dt_t A) = exp(A * sum_t dt_t)
    # (cheap and differentiable — no (B, l, D, N) prefix needed)
    a_tot = jnp.exp(jnp.einsum("bld,dn->bdn", dt, A))
    _, h_tot = selective_scan_with_state(x, dt, A, B, C, zero_state)

    # cross-shard exclusive prefix of the summaries
    a_all = jax.lax.all_gather(a_tot, axis)                  # (S, B, D, N)
    h_all = jax.lax.all_gather(h_tot, axis)
    _, h_inc = jax.lax.associative_scan(
        _affine_combine, (a_all, h_all), axis=0
    )
    idx = jax.lax.axis_index(axis)
    # incoming state = inclusive result of the PREVIOUS shard; 0 for shard 0
    h_in = jnp.where(
        idx > 0,
        jax.lax.dynamic_index_in_dim(
            h_inc, jnp.maximum(idx - 1, 0), axis=0, keepdims=False
        ),
        zero_state,
    )

    y, _ = selective_scan_with_state(x, dt, A, B, C, h_in)
    if D is not None:
        y = y + x * D[None, None, :]
    return y


def make_dim_sequence_parallel_apply(model, mesh: Mesh):
    """Build `apply(params, x, t, y, dropout_rng=None, train=False) -> eps`
    for a DiM over a (data, seq) mesh. Same contract as
    sequence_parallel.make_sequence_parallel_apply; params are the
    STANDARD DiM param tree, replicated on the mesh. The shared SP
    scaffold (prologue, token slice, dropout streams, epilogue, wrapper
    cache) lives in sequence_parallel.make_token_sharded_apply — only
    the Mamba block body is defined here.
    """
    from ..models.dim import DiMFinalLayer, FeedForward
    from ..models.layers import AdaLNModulation, modulate

    assert not model.use_attention_fallback, (
        "DiM sequence parallelism runs the Mamba mixer; the attention "
        "fallback has no distributed path (use the DiT SP instead)"
    )
    sp = mesh.shape[SEQ_AXIS]
    img_h, img_w = model._hw()
    num_patches = (img_h // model.patch_size) * (img_w // model.patch_size)
    assert num_patches % sp == 0, (
        f"{num_patches} patch tokens not divisible by sequence_parallel={sp}"
    )
    assert num_patches // sp >= CONV_HALO, (
        f"{num_patches // sp} local tokens per shard < the causal-conv "
        f"halo ({CONV_HALO}) — the halo exchange reads the immediate "
        f"left neighbor only; lower sequence_parallel ({sp})"
    )
    hidden = model.hidden_size
    d_state = model.state_size
    d_inner = 2 * hidden  # expand=2 (models/dim.py Mamba default)
    dt_rank = math.ceil(hidden / 16)
    dtype = model.dtype

    adaln3 = AdaLNModulation(hidden, 3, dtype=dtype)
    norm = nn.LayerNorm(epsilon=1e-6, dtype=dtype)
    ff = FeedForward(hidden, model.mlp_ratio, model.dropout, dtype)
    final = DiMFinalLayer(hidden, model.patch_size, model.in_channels, dtype)
    conv = nn.Conv(
        d_inner, kernel_size=(D_CONV,), padding="VALID",
        feature_group_count=d_inner, dtype=dtype,
    )

    def dense(p, u):
        """nn.Dense.apply from a raw param dict (bias iff present)."""
        return nn.Dense(
            p["kernel"].shape[1], use_bias="bias" in p, dtype=dtype
        ).apply({"params": p}, u)

    def mamba_mixer(p, u):
        """The Mamba mixer of models/dim.py:61-158 with the sequence axis
        sharded: halo'd causal conv + distributed scan."""
        x = dense(p["in_proj_x"], u)
        z = dense(p["in_proj_z"], u)

        assert p["conv"]["kernel"].shape[0] == D_CONV, (
            f"conv kernel width {p['conv']['kernel'].shape[0]} != the "
            f"assumed d_conv={D_CONV} — the halo exchange would ship the "
            "wrong number of tokens"
        )
        # causal depthwise conv: the left neighbor supplies the halo that
        # zero-padding supplies in the unsharded model; shard 0 receives
        # zeros from ppermute (no source sends to it) == causal padding
        halo = jax.lax.ppermute(
            x[:, -CONV_HALO:], SEQ_AXIS,
            [(i, i + 1) for i in range(sp - 1)],
        )
        x = conv.apply({"params": p["conv"]},
                       jnp.concatenate([halo, x], axis=1))
        x = nn.silu(x)

        x_dbl = dense(p["x_dbl"], x)
        dt, B, C = jnp.split(x_dbl, [dt_rank, dt_rank + d_state], axis=-1)
        dt = nn.softplus(dense(p["dt_proj"], dt))

        A = -jnp.exp(p["A_log"])
        # scan in fp32 (recurrence compounds rounding — models/dim.py:140)
        y = distributed_selective_scan(
            x.astype(jnp.float32), dt.astype(jnp.float32), A,
            B.astype(jnp.float32), C.astype(jnp.float32), p["D"],
            axis=SEQ_AXIS,
        )
        if dtype is not None:
            y = y.astype(dtype)
        y = y * nn.silu(z)
        return dense(p["out_proj"], y)

    def _apply_block(blk_params, tok, c, rngs, train):
        mb = blk_params["MambaBlock_0"]
        shift, scale, gate = adaln3.apply(
            {"params": mb["AdaLNModulation_0"]}, c
        )
        h = norm.apply({"params": mb["LayerNorm_0"]}, tok)
        h = modulate(h, shift, scale)
        h = mamba_mixer(mb["Mamba_0"], h)
        tok = tok + gate[:, None, :] * h
        return ff.apply({"params": blk_params["FeedForward_0"]}, tok, c,
                        train, rngs=rngs)

    if model.remat:
        _apply_block = jax.checkpoint(_apply_block, static_argnums=(4,))

    def apply_blocks(params, tok, c, mk_rngs, train):
        for i in range(model.depth):
            tok = _apply_block(params[f"DiMBlock_{i}"], tok, c, mk_rngs(i),
                               train)
        return tok

    return make_token_sharded_apply(model, mesh, apply_blocks, final,
                                    "DiMFinalLayer_0")
