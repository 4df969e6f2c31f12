"""Sequence parallelism for the DiT backbone over a (data, seq) mesh.

The reference has no sequence dimension to shard (SURVEY.md §2.3) — this
is an extension, built the TPU way: the patch-token axis is split over a
'seq' mesh axis inside one `shard_map`ped SPMD program. Everything
token-local (LayerNorm, adaLN modulation, the MLP — where the (B, L, 4D)
activation lives) computes on L/S tokens per device; attention keeps Q
local and all-gathers K/V over ICI (`lax.all_gather(..., tiled=True)`,
two per block — the Megatron-SP/ring-attention trade made XLA-friendly:
no per-step ppermute schedule, one collective the compiler can overlap).
The backward is pure autodiff: all_gather transposes to psum_scatter,
and shard_map's transpose inserts the psum over 'seq' that sums the
per-shard parameter cotangents — replicated params need no layout change,
so checkpoints/EMA/optimizer state are byte-identical to non-SP runs.

Memory/FLOP scaling per device: MLP + QKV/out projections and the L×L
score matrix all shrink by S; only the tiny prologue (patchify, pos-embed,
conditioning embed) is computed redundantly on each seq shard.

Scope: forward + autodiff backward, exact equivalence with the unsharded
model when dropout is off (with dropout the mask streams are per-shard by
construction — still valid iid Bernoulli). DiM sequence parallelism would
need a distributed selective scan (cross-device carry combine); separate
work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


DATA_AXIS = "data"
SEQ_AXIS = "seq"
MODEL_AXIS = "model"


def data_seq_mesh(dp: int, sp: int, devices=None) -> Mesh:
    """2-D mesh: dp x sp over the first dp*sp devices."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(devices, (DATA_AXIS, SEQ_AXIS))


def data_seq_model_mesh(dp: int, sp: int, tp: int, devices=None) -> Mesh:
    """3-D mesh: dp x sp x tp (DP x token-sharding x Megatron).

    'model' innermost: the per-block TP all-reduces (every layer) ride
    the fastest ICI links; the SP collectives (K/V all-gather per DiT
    block, or the DiM scan's two O(B*D*N) summary collectives) take the
    next hop, and the per-step gradient psum over 'data' the longest.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: dp * sp * tp]).reshape(dp, sp, tp)
    return Mesh(devices, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))


def make_token_sharded_apply(model, mesh: Mesh, apply_blocks, final,
                             final_key: str):
    """Shared SP scaffold for token-axis-sharded backbones (DiT / DiM).

    Owns everything both backbones share — the redundant prologue
    (patchify, pos-embed, timestep/label conditioning), the per-shard
    token slice, the per-(data shard, layer, seq shard) dropout streams,
    the final layer + tiled all_gather + unpatchify epilogue, and the
    per-(train, use_labels) shard_map wrapper cache. The null-label
    gating and the dp dropout-decorrelation fold live HERE, once.

    `apply_blocks(params, tok, c, mk_rngs, train)` runs the backbone's
    block stack on the local tokens; `mk_rngs(layer)` yields the rngs
    dict for that layer (or None when dropout is inactive).
    """
    from ..models.layers import (
        LabelEmbedder,
        PatchEmbed,
        TimestepEmbedder,
        unpatchify,
    )

    sp = mesh.shape[SEQ_AXIS]
    img_h, img_w = model._hw()
    h_tok = img_h // model.patch_size
    w_tok = img_w // model.patch_size
    num_patches = h_tok * w_tok
    assert num_patches % sp == 0, (
        f"{num_patches} patch tokens not divisible by sequence_parallel={sp}"
    )
    l_loc = num_patches // sp

    patch_embed = PatchEmbed(model.patch_size, model.hidden_size, model.dtype)
    t_embed = TimestepEmbedder(model.hidden_size, dtype=model.dtype)
    y_embed = (
        LabelEmbedder(model.num_classes, model.hidden_size, model.dtype)
        if model.num_classes is not None else None
    )

    def sp_fn(params, x, t, y, dropout_rng, *, train, use_labels):
        """Runs INSIDE shard_map: x/t/y are the LOCAL data shard; params
        are replicated; this device owns tokens [idx*l_loc, (idx+1)*l_loc)."""
        idx = jax.lax.axis_index(SEQ_AXIS)
        # distinct dropout stream per data shard — without this fold every
        # dp rank applies byte-identical masks to DIFFERENT examples
        # (correlated regularization noise the unsharded model never has)
        dropout_rng = jax.random.fold_in(
            dropout_rng, jax.lax.axis_index(DATA_AXIS))

        # ---- redundant prologue (tiny next to the block matmuls) -------
        tokens = patch_embed.apply({"params": params["PatchEmbed_0"]}, x)
        tokens = tokens + params["pos_embed"].astype(tokens.dtype)
        c = t_embed.apply({"params": params["TimestepEmbedder_0"]}, t)
        # use_labels is STATIC: y=None at the call site means "skip the
        # label embedding entirely" (matching models/dit.py's
        # `y is not None` check) — the zeros placeholder array that rides
        # through shard_map must not inject the null-class embedding.
        if y_embed is not None and use_labels:
            c = c + y_embed.apply({"params": params["LabelEmbedder_0"]}, y)

        tok = jax.lax.dynamic_slice_in_dim(tokens, idx * l_loc, l_loc, axis=1)

        def mk_rngs(layer):
            if train and model.dropout > 0:
                # independent stream per (layer, seq shard)
                return {"dropout": jax.random.fold_in(
                    jax.random.fold_in(dropout_rng, layer), idx)}
            return None

        tok = apply_blocks(params, tok, c, mk_rngs, train)

        out = final.apply({"params": params[final_key]}, tok, c)
        out = out.astype(jnp.float32)
        out = jax.lax.all_gather(out, SEQ_AXIS, axis=1, tiled=True)
        eps = unpatchify(out, h_tok, w_tok, model.patch_size,
                         model.in_channels)
        return eps.astype(jnp.float32)

    # one shard_map wrapper per static (train, use_labels) combination
    # (specs are positional; use_labels gates the label embedding)
    _wrappers = {}

    def _get(train: bool, use_labels: bool):
        key = (train, use_labels)
        if key not in _wrappers:
            # Partial-manual shard_map: manual over (data, seq) — the
            # token slicing and the SP collectives — while any 'model'
            # mesh axis stays AUTO, so Megatron-sharded params (SP x TP
            # composition) keep their GSPMD sharding inside the body and
            # XLA inserts the per-block all-reduces itself. jit-wrapped
            # because jax 0.9's EAGER partial-manual impl rebuilds
            # out_specs as P(mesh.axis_names) and trips its own validator.
            _wrappers[key] = jax.jit(jax.shard_map(
                functools.partial(sp_fn, train=train, use_labels=use_labels),
                mesh=mesh,
                in_specs=(
                    P(),            # params replicated over (data, seq)
                    P(DATA_AXIS),   # x
                    P(DATA_AXIS),   # t
                    P(DATA_AXIS),   # y
                    P(),            # rng (replicated; folded per shard)
                ),
                out_specs=P(DATA_AXIS),
                axis_names={DATA_AXIS, SEQ_AXIS},
                check_vma=False,
            ))
        return _wrappers[key]

    def apply_fn(params, x, t, y, dropout_rng=None, train=False):
        use_labels = y is not None
        if y is None:
            y = jnp.zeros((x.shape[0],), jnp.int32)  # placeholder, unused
        if dropout_rng is None:
            dropout_rng = jax.random.PRNGKey(0)  # unused unless train
        return _get(bool(train), use_labels)(params, x, t, y, dropout_rng)

    return apply_fn


def make_sequence_parallel_apply(model, mesh: Mesh):
    """Build `apply(params, x, t, y, dropout_rng=None, train=False) -> eps`.

    `model` is the DiT Module (for its submodule definitions / config);
    `params` is the STANDARD DiT param tree, replicated on the mesh.
    num_patches must divide by the 'seq' axis size.
    """
    from ..models.dit import DiTBlock, FinalLayer

    block = DiTBlock(model.hidden_size, model.num_heads, model.mlp_ratio,
                     model.dropout, model.dtype, kv_axis=SEQ_AXIS)
    final = FinalLayer(model.hidden_size, model.patch_size, model.in_channels,
                       model.dtype)

    def _apply_block(blk_params, tok, c, rngs, train):
        return block.apply({"params": blk_params}, tok, c, train, rngs=rngs)

    if model.remat:
        # same HBM/FLOP trade as the non-SP remat path (models/dit.py)
        _apply_block = jax.checkpoint(_apply_block, static_argnums=(4,))

    def apply_blocks(params, tok, c, mk_rngs, train):
        for i in range(model.depth):
            tok = _apply_block(params[f"DiTBlock_{i}"], tok, c, mk_rngs(i),
                               train)
        return tok

    return make_token_sharded_apply(model, mesh, apply_blocks, final,
                                    "FinalLayer_0")
