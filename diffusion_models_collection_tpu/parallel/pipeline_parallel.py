"""Pipeline parallelism for the DiT backbone over a (data, stage) mesh.

The reference has no pipeline dimension (SURVEY.md §2.3) — this is an
extension, built the TPU way: a GPipe-style microbatch pipeline expressed
as a `shard_map` over a 'stage' mesh axis, with activations handed from
stage to stage by `lax.ppermute` over ICI. No schedulers, threads, or
NCCL groups — the whole pipeline (forward AND its transposed backward,
which autodiff derives from ppermute's transpose) is one jitted SPMD
program.

Layout:
  * The depth DiT blocks are STACKED into one (depth, ...) param tree and
    sharded over 'stage' — each stage holds depth/S consecutive blocks
    (`stack_block_params` / `shard_dit_params_pp`).
  * Embedders / pos-embed / final layer are replicated; every stage runs
    them (redundant but tiny next to the block matmuls), and the real
    output is selected from the LAST stage with a mask + psum.
  * The local batch is split into M microbatches; tick t has stage s
    processing microbatch (t - s): the classic GPipe schedule with
    M + S - 1 ticks and an (S-1)/M bubble.

Scope: forward + autodiff backward for training/inference at equivalence
with the unpipelined model (exact when dropout is off; with dropout the
mask stream differs by construction). Works for BOTH transformer-style
block stacks: DiT (DiTBlock / FinalLayer) and DiM (DiMBlock — the Mamba
mixer scans run inside each stage unchanged — / DiMFinalLayer); the
block/final modules and the param prefix are selected from the model
class.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
STAGE_AXIS = "stage"
MODEL_AXIS = "model"


def data_stage_mesh(dp: int, pp: int, devices=None) -> Mesh:
    """2-D mesh: dp x pp over the first dp*pp devices."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: dp * pp]).reshape(dp, pp)
    return Mesh(devices, (DATA_AXIS, STAGE_AXIS))


def data_stage_model_mesh(dp: int, pp: int, tp: int, devices=None) -> Mesh:
    """3-D mesh: dp x pp x tp (DP x GPipe x Megatron composition).

    The 'model' axis is innermost so TP collectives (one all-reduce per
    block half, every microbatch tick) ride the fastest ICI links, while
    the per-tick stage handoff (one ppermute) and the per-step gradient
    reduction (psum over 'data') tolerate longer hops.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: dp * pp * tp]).reshape(dp, pp, tp)
    return Mesh(devices, (DATA_AXIS, STAGE_AXIS, MODEL_AXIS))


def stack_block_params(params: dict, depth: int, prefix: str = "DiTBlock_"):
    """Split a DiT/DiM param tree into (stacked_blocks, rest).

    stacked_blocks leaves have a leading (depth,) axis; rest holds the
    embedders / pos_embed / final layer unchanged.
    """
    blocks = [params[f"{prefix}{i}"] for i in range(depth)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    rest = {k: v for k, v in params.items() if not k.startswith(prefix)}
    return stacked, rest


def unstack_block_params(stacked: dict, rest: dict, depth: int,
                         prefix: str = "DiTBlock_") -> dict:
    """Inverse of `stack_block_params` (checkpoints stay interchangeable)."""
    params = dict(rest)
    for i in range(depth):
        params[f"{prefix}{i}"] = jax.tree_util.tree_map(
            lambda x: x[i], stacked
        )
    return params


def block_prefix_for(model) -> str:
    """Param prefix of the stackable block for a supported backbone."""
    return {"DiT": "DiTBlock_", "DiM": "DiMBlock_"}[type(model).__name__]


def shard_dit_params_pp(mesh: Mesh, params: dict, depth: int,
                        prefix: str = "DiTBlock_"):
    """(stacked sharded over 'stage', rest replicated) on the mesh."""
    tree = shard_pp_param_tree(mesh, to_pp_tree(params, depth, prefix))
    return tree["blocks"], tree["rest"]


# ---- trainer integration: {"blocks": stacked, "rest": ...} param trees ----

def to_pp_tree(params: dict, depth: int, prefix: str = "DiTBlock_") -> dict:
    """Standard DiT/DiM param tree -> the PP layout the trainer's
    TrainState holds ({"blocks": (depth, ...) stacked, "rest": rest})."""
    stacked, rest = stack_block_params(params, depth, prefix)
    return {"blocks": stacked, "rest": rest}


def from_pp_tree(tree: dict, depth: int, prefix: str = "DiTBlock_") -> dict:
    """Inverse of `to_pp_tree` — used at checkpoint save so PP checkpoints
    stay byte-compatible with non-PP runs."""
    return unstack_block_params(tree["blocks"], tree["rest"], depth, prefix)


def stacked_block_spec(path_keys, leaf) -> P:
    """PartitionSpec for one stacked-block leaf: leading depth axis over
    'stage', plus — when composing PP x TP — the per-block Megatron spec
    (parallel/tensor_parallel.py rules) over 'model' on the remaining
    dims. The stacked tree's paths are the per-block paths (stacking
    strips the `DiTBlock_i` prefix), which is exactly what the Megatron
    path rules match on."""
    import types

    from .tensor_parallel import _spec_for_path

    # the rules only consult .ndim — avoid slicing the (possibly
    # device-resident) stacked leaf just to drop its depth axis
    per_block = _spec_for_path(
        path_keys, types.SimpleNamespace(ndim=leaf.ndim - 1)
    )
    tail = list(per_block) + [None] * (leaf.ndim - 1 - len(per_block))
    return P(STAGE_AXIS, *tail[: leaf.ndim - 1])


def shard_pp_param_tree(mesh: Mesh, tree: dict) -> dict:
    """blocks sharded over 'stage' (leading depth axis) — and, on a mesh
    with a 'model' axis (PP x TP), Megatron-sharded over 'model' on the
    per-block dims; rest replicated (the embedders/final layer are
    replicated under the Megatron rules too)."""
    with_tp = MODEL_AXIS in mesh.axis_names

    def _block_sharding(path, x):
        spec = (
            stacked_block_spec(path, x)
            if with_tp
            else P(STAGE_AXIS, *([None] * (x.ndim - 1)))
        )
        return jax.device_put(x, NamedSharding(mesh, spec))

    blocks = jax.tree_util.tree_map_with_path(_block_sharding, tree["blocks"])
    rest = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree["rest"]
    )
    return {"blocks": blocks, "rest": rest}


def shard_state_for_pp(mesh: Mesh, state):
    """Shard a TrainState whose params/EMA are PP trees. Optimizer moments
    are left replicated for jit to co-shard with the params (same approach
    as tensor_parallel.shard_state_for_tp)."""
    from ..utils.trainer import TrainState

    params = shard_pp_param_tree(mesh, state.params)
    ema = (
        shard_pp_param_tree(mesh, state.ema_params)
        if state.ema_params is not None
        else None
    )
    opt_state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), state.opt_state
    )
    return TrainState(params=params, opt_state=opt_state, ema_params=ema)


def make_pipeline_apply(model, mesh: Mesh, num_microbatches: Optional[int]
                        = None):
    """Build `apply(stacked, rest, x, t, y, dropout_rng, train) -> eps`.

    `model` is the DiT Module (for its submodule definitions / config);
    params come pre-sharded from `shard_dit_params_pp`. The returned
    function is jit-compatible and differentiable; batch must be
    divisible by dp * M.
    """
    from ..models.layers import (
        LabelEmbedder,
        PatchEmbed,
        TimestepEmbedder,
        unpatchify,
    )

    pp = mesh.shape[STAGE_AXIS]
    M = num_microbatches or pp
    depth = model.depth
    assert depth % pp == 0, f"depth {depth} not divisible by {pp} stages"

    img_h, img_w = model._hw()
    h_tok = img_h // model.patch_size
    w_tok = img_w // model.patch_size

    if type(model).__name__ == "DiM":
        from ..models.dim import DiMBlock, DiMFinalLayer

        assert not model.use_attention_fallback, (
            "PP for DiM runs the Mamba mixer stack; the attention "
            "fallback is not supported"
        )
        block = DiMBlock(model.hidden_size, model.state_size,
                         model.mlp_ratio, model.dropout, False, model.dtype)
        final = DiMFinalLayer(model.hidden_size, model.patch_size,
                              model.in_channels, model.dtype)
        final_key = "DiMFinalLayer_0"
    else:
        from ..models.dit import DiTBlock, FinalLayer

        block = DiTBlock(model.hidden_size, model.num_heads, model.mlp_ratio,
                         model.dropout, model.dtype)
        final = FinalLayer(model.hidden_size, model.patch_size,
                           model.in_channels, model.dtype)
        final_key = "FinalLayer_0"
    patch_embed = PatchEmbed(model.patch_size, model.hidden_size, model.dtype)
    t_embed = TimestepEmbedder(model.hidden_size, dtype=model.dtype)
    y_embed = (
        LabelEmbedder(model.num_classes, model.hidden_size, model.dtype)
        if model.num_classes is not None else None
    )

    def _stage_blocks(my_blocks, x_mb, c_mb, base_rng, layer0, train):
        """Apply this stage's depth/pp blocks (scan over stacked params)."""

        def body(carry, scanned):
            x, layer = carry
            blk_params, = scanned
            rngs = None
            if train and model.dropout > 0:
                # per-(layer, microbatch-tick) stream; base_rng is already
                # folded with the tick id by the caller
                rngs = {"dropout": jax.random.fold_in(base_rng, layer)}
            x = block.apply({"params": blk_params}, x, c_mb, train,
                            rngs=rngs)
            return (x, layer + 1), None

        (x_out, _), _ = jax.lax.scan(body, (x_mb, layer0), (my_blocks,))
        return x_out

    def pipe_fn(stacked, rest, x, t, y, dropout_rng, *, train, use_labels):
        """Runs INSIDE shard_map: x/t/y are the LOCAL data shard; stacked
        is the LOCAL (depth/pp, ...) block stack."""
        stage = jax.lax.axis_index(STAGE_AXIS)
        # distinct dropout stream per data shard — without this fold every
        # dp rank applies byte-identical masks to DIFFERENT examples
        # (correlated regularization noise the unsharded model never has)
        dropout_rng = jax.random.fold_in(
            dropout_rng, jax.lax.axis_index(DATA_AXIS))
        b_local = x.shape[0]
        mb = b_local // M

        # ---- replicated prologue: embed the whole local shard ----------
        tokens = patch_embed.apply({"params": rest["PatchEmbed_0"]}, x)
        tokens = tokens + rest["pos_embed"].astype(tokens.dtype)
        c = t_embed.apply({"params": rest["TimestepEmbedder_0"]}, t)
        # use_labels is STATIC: y=None at the call site must skip the
        # label embedding (models/dit.py semantics) — the zeros
        # placeholder must not inject the null-class embedding.
        if y_embed is not None and use_labels:
            c = c + y_embed.apply({"params": rest["LabelEmbedder_0"]}, y)

        num_patches = tokens.shape[1]
        tokens_mb = tokens.reshape(M, mb, num_patches, tokens.shape[-1])
        c_mb_all = c.reshape(M, mb, c.shape[-1])

        layer0 = stage * (depth // pp)
        state = jnp.zeros_like(tokens_mb[0])
        out_buf = jnp.zeros(
            (M, mb, num_patches,
             model.patch_size * model.patch_size * model.in_channels),
            jnp.float32,
        )

        # ---- GPipe schedule: M + pp - 1 ticks --------------------------
        def tick(carry, tk):
            state, out_buf = carry
            # microbatch index this stage works on at tick tk
            mb_id = jnp.clip(tk - stage, 0, M - 1)
            inject = jnp.take(tokens_mb, jnp.clip(tk, 0, M - 1), axis=0)
            x_in = jnp.where(stage == 0, inject, state)
            c_mb = jnp.take(c_mb_all, mb_id, axis=0)
            rng_tick = jax.random.fold_in(dropout_rng, tk)
            x_out = _stage_blocks(stacked, x_in, c_mb, rng_tick, layer0,
                                  train)
            # last stage finalizes microbatch mb_id once the pipeline is
            # full (tk >= pp - 1)
            y_mb = final.apply({"params": rest[final_key]}, x_out,
                               c_mb).astype(jnp.float32)
            is_last = stage == (pp - 1)
            valid = jnp.logical_and(is_last, tk >= pp - 1)
            out_buf = jnp.where(
                valid,
                out_buf.at[mb_id].set(y_mb),
                out_buf,
            )
            # hand activations to the next stage over ICI
            state = jax.lax.ppermute(
                x_out, STAGE_AXIS,
                [(i, (i + 1) % pp) for i in range(pp)],
            )
            return (state, out_buf), None

        (_, out_buf), _ = jax.lax.scan(
            tick, (state, out_buf), jnp.arange(M + pp - 1)
        )

        # only the last stage holds real outputs; broadcast over 'stage'
        out_buf = jnp.where(stage == pp - 1, out_buf, 0.0)
        out_buf = jax.lax.psum(out_buf, STAGE_AXIS)

        patches = out_buf.reshape(b_local, num_patches, -1)
        eps = unpatchify(patches, h_tok, w_tok, model.patch_size,
                         model.in_channels)
        return eps.astype(jnp.float32)

    # one shard_map wrapper per static (train, use_labels) combination
    _wrappers = {}

    def _get(train: bool, use_labels: bool):
        key = (train, use_labels)
        if key not in _wrappers:
            # Partial-manual shard_map: manual over (data, stage) — the
            # GPipe schedule and its ppermute handoffs — while any 'model'
            # mesh axis stays AUTO, so Megatron-sharded block params (PP x
            # TP composition) keep their GSPMD sharding inside the pipeline
            # body and XLA inserts the per-block all-reduces itself.
            # jit-wrapped: besides being how the trainer runs it anyway,
            # jax's EAGER impl of partial-manual shard_map rebuilds
            # out_specs as P(mesh.axis_names) internally and trips its own
            # manual-axes validator when the mesh has auto axes (jax 0.9).
            _wrappers[key] = jax.jit(jax.shard_map(
                functools.partial(pipe_fn, train=train,
                                  use_labels=use_labels),
                mesh=mesh,
                in_specs=(
                    P(STAGE_AXIS),  # stacked blocks (spec broadcasts tree)
                    P(),            # rest replicated
                    P(DATA_AXIS),   # x
                    P(DATA_AXIS),   # t
                    P(DATA_AXIS),   # y
                    P(),            # rng (replicated)
                ),
                out_specs=P(DATA_AXIS),
                axis_names={DATA_AXIS, STAGE_AXIS},
                check_vma=False,
            ))
        return _wrappers[key]

    def apply_fn(stacked, rest, x, t, y, dropout_rng=None, train=False):
        use_labels = y is not None
        if y is None:
            y = jnp.zeros((x.shape[0],), jnp.int32)  # placeholder, unused
        if dropout_rng is None:
            dropout_rng = jax.random.PRNGKey(0)  # unused unless train
        return _get(bool(train), use_labels)(stacked, rest, x, t, y,
                                             dropout_rng)

    return apply_fn
