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

The backward is pure autodiff (all_gather transposes to psum_scatter,
ppermute to the reverse ppermute, and shard_map's transpose psums the
per-shard parameter cotangents). Params stay replicated — checkpoints,
EMA and optimizer state are byte-identical to non-SP runs.

Exactness: same math as ops.selective_scan's XLA path, just regrouped
(floating-point association differs at shard boundaries — parity tests
use the usual 2e-5 tolerances). The Pallas kernel is not used here: the
associative formulation IS the distributed algorithm.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P

from jax.experimental.shard_map import shard_map

from .sequence_parallel import DATA_AXIS, SEQ_AXIS, data_seq_mesh  # noqa: F401
from ..ops.selective_scan import _affine_combine


def distributed_selective_scan(x, dt, A, B, C, D=None, *, axis: str):
    """Selective SSM scan with the sequence axis sharded over mesh `axis`.

    Must run INSIDE shard_map; per-shard shapes match
    ops.selective_scan.selective_scan_xla's contract with L = L/S local
    tokens. Cross-shard state flows through one all_gather of per-shard
    (decay_total, state_total) summaries plus an S-length combine.
    """
    # local affine pairs and local all-prefix solutions (h with h_in = 0)
    dA = jnp.exp(dt[..., None] * A[None, None])              # (B, l, D, N)
    dBx = dt[..., None] * B[:, :, None, :] * x[..., None]
    a_cum, h_loc = jax.lax.associative_scan(
        _affine_combine, (dA, dBx), axis=1
    )

    # cross-shard exclusive prefix of the per-shard totals
    a_all = jax.lax.all_gather(a_cum[:, -1], axis)           # (S, B, D, N)
    h_all = jax.lax.all_gather(h_loc[:, -1], axis)
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
        jnp.zeros_like(h_loc[:, -1]),
    )

    h = h_loc + a_cum * h_in[:, None]
    y = jnp.einsum("bldn,bln->bld", h, C)
    if D is not None:
        y = y + x * D[None, None, :]
    return y


def make_dim_sequence_parallel_apply(model, mesh: Mesh):
    """Build `apply(params, x, t, y, dropout_rng=None, train=False) -> eps`
    for a DiM over a (data, seq) mesh. Same contract as
    sequence_parallel.make_sequence_parallel_apply; params are the
    STANDARD DiM param tree, replicated on the mesh.
    """
    from ..models.dim import DiMFinalLayer, FeedForward
    from ..models.layers import (
        AdaLNModulation,
        LabelEmbedder,
        PatchEmbed,
        TimestepEmbedder,
        modulate,
        unpatchify,
    )

    assert not model.use_attention_fallback, (
        "DiM sequence parallelism runs the Mamba mixer; the attention "
        "fallback has no distributed path (use the DiT SP instead)"
    )
    sp = mesh.shape[SEQ_AXIS]
    img_h, img_w = model._hw()
    h_tok = img_h // model.patch_size
    w_tok = img_w // model.patch_size
    num_patches = h_tok * w_tok
    assert num_patches % sp == 0, (
        f"{num_patches} patch tokens not divisible by sequence_parallel={sp}"
    )
    d_conv_halo = 3  # d_conv - 1 (mamba_ssm default d_conv=4)
    assert num_patches // sp >= d_conv_halo, (
        f"{num_patches // sp} local tokens per shard < the causal-conv "
        f"halo ({d_conv_halo}) — the halo exchange reads the immediate "
        f"left neighbor only; lower sequence_parallel ({sp})"
    )
    depth = model.depth
    hidden = model.hidden_size
    d_state = model.state_size
    d_conv = 4           # models/dim.py Mamba default (mamba_ssm parity)
    d_inner = 2 * hidden  # expand=2
    dt_rank = math.ceil(hidden / 16)
    dtype = model.dtype

    patch_embed = PatchEmbed(model.patch_size, hidden, dtype)
    t_embed = TimestepEmbedder(hidden, dtype=dtype)
    y_embed = (
        LabelEmbedder(model.num_classes, hidden, dtype)
        if model.num_classes is not None else None
    )
    adaln3 = AdaLNModulation(hidden, 3, dtype=dtype)
    norm = nn.LayerNorm(epsilon=1e-6, dtype=dtype)
    ff = FeedForward(hidden, model.mlp_ratio, model.dropout, dtype)
    final = DiMFinalLayer(hidden, model.patch_size, model.in_channels, dtype)
    conv = nn.Conv(
        d_inner, kernel_size=(d_conv,), padding="VALID",
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

        # causal depthwise conv: the left neighbor supplies the halo that
        # zero-padding supplies in the unsharded model; shard 0 receives
        # zeros from ppermute (no source sends to it) == causal padding
        halo = jax.lax.ppermute(
            x[:, -(d_conv - 1):], SEQ_AXIS,
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

    def sp_fn(params, x, t, y, dropout_rng, *, train, use_labels):
        """Runs INSIDE shard_map: x/t/y are the LOCAL data shard; params
        replicated; this device owns tokens [idx*l_loc, (idx+1)*l_loc)."""
        idx = jax.lax.axis_index(SEQ_AXIS)
        # distinct dropout stream per data shard (see sequence_parallel.py)
        dropout_rng = jax.random.fold_in(
            dropout_rng, jax.lax.axis_index(DATA_AXIS))

        tokens = patch_embed.apply({"params": params["PatchEmbed_0"]}, x)
        tokens = tokens + params["pos_embed"].astype(tokens.dtype)
        c = t_embed.apply({"params": params["TimestepEmbedder_0"]}, t)
        if y_embed is not None and use_labels:
            c = c + y_embed.apply({"params": params["LabelEmbedder_0"]}, y)

        l_loc = num_patches // sp
        tok = jax.lax.dynamic_slice_in_dim(tokens, idx * l_loc, l_loc, axis=1)

        for i in range(depth):
            rngs = None
            if train and model.dropout > 0:
                rngs = {"dropout": jax.random.fold_in(
                    jax.random.fold_in(dropout_rng, i), idx)}
            tok = _apply_block(params[f"DiMBlock_{i}"], tok, c, rngs, train)

        out = final.apply({"params": params["DiMFinalLayer_0"]}, tok, c)
        out = out.astype(jnp.float32)
        out = jax.lax.all_gather(out, SEQ_AXIS, axis=1, tiled=True)
        eps = unpatchify(out, h_tok, w_tok, model.patch_size,
                         model.in_channels)
        return eps.astype(jnp.float32)

    _wrappers = {}

    def _get(train: bool, use_labels: bool):
        key = (train, use_labels)
        if key not in _wrappers:
            _wrappers[key] = shard_map(
                functools.partial(sp_fn, train=train, use_labels=use_labels),
                mesh=mesh,
                in_specs=(
                    P(),            # params replicated
                    P(DATA_AXIS),   # x
                    P(DATA_AXIS),   # t
                    P(DATA_AXIS),   # y
                    P(),            # rng (replicated; folded per shard)
                ),
                out_specs=P(DATA_AXIS),
                check_rep=False,
            )
        return _wrappers[key]

    def apply_fn(params, x, t, y, dropout_rng=None, train=False):
        use_labels = y is not None
        if y is None:
            y = jnp.zeros((x.shape[0],), jnp.int32)  # placeholder, unused
        if dropout_rng is None:
            dropout_rng = jax.random.PRNGKey(0)  # unused unless train
        return _get(bool(train), use_labels)(params, x, t, y, dropout_rng)

    return apply_fn
