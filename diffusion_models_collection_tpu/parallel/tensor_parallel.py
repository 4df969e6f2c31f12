"""Tensor parallelism for the DiT backbone over a 2-D (data, model) mesh.

The reference is data-parallel only (SURVEY.md §2.3), so this is an
extension, implemented the TPU way: Megatron-style column/row-parallel
sharding expressed purely as GSPMD parameter shardings — the attention
QKV and MLP-in projections split their OUTPUT features over the 'model'
axis, the attention-out and MLP-out projections split their INPUT
features, and XLA inserts exactly one all-reduce per block half over ICI.
No code in the model changes; sharding is metadata on the param pytree.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def data_model_mesh(dp: int, tp: int, devices=None) -> Mesh:
    """2-D mesh: dp x tp over the first dp*tp devices."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def _spec_for_path(path_keys, leaf) -> P:
    """Megatron rules for DiT and DiM params (flax path key names).

    DiT — column-parallel (shard output features): SelfAttention QKV
    (Dense_0), Mlp up-projection (Dense_0). Row-parallel (shard input
    features): SelfAttention out (Dense_1), Mlp down-projection (Dense_1).

    DiM — the Mamba mixer shards its d_inner channel axis (the selective
    scan is elementwise-independent across d_inner; the op itself runs
    under `ops.selective_scan.scan_tensor_parallel`): in_proj_x/in_proj_z
    and dt_proj column-parallel, the depthwise conv and A_log/D split
    per-channel, x_dbl and out_proj row-parallel (their outputs — the
    shared Δ/B/C features and the residual — are the two all-reduce points
    per mixer). The FeedForward half reuses the Mlp rules.

    Everything else (embedders, adaLN, norms, final layer) is replicated —
    tiny compared to the block matmuls.
    """
    keys = [getattr(k, "key", str(k)) for k in path_keys]
    path = "/".join(keys)
    is_kernel = keys[-1] == "kernel"
    is_bias = keys[-1] == "bias"

    parent = keys[-2] if len(keys) >= 2 else ""
    column = ("SelfAttention" in path or "Mlp" in path) and "Dense_0" in path
    row = ("SelfAttention" in path or "Mlp" in path) and "Dense_1" in path
    column = column or parent in ("in_proj_x", "in_proj_z", "dt_proj")
    row = row or parent in ("x_dbl", "out_proj")

    if "Mamba" in path:
        if keys[-1] == "A_log":
            return P(MODEL_AXIS, None)
        if keys[-1] == "D":
            return P(MODEL_AXIS)
        if "conv" in keys and is_kernel:  # (d_conv, 1, d_inner) depthwise
            return P(None, None, MODEL_AXIS)
        if "conv" in keys and is_bias:
            return P(MODEL_AXIS)

    if column and is_kernel and leaf.ndim == 2:
        return P(None, MODEL_AXIS)
    if column and is_bias and leaf.ndim == 1:
        return P(MODEL_AXIS)
    if row and is_kernel and leaf.ndim == 2:
        return P(MODEL_AXIS, None)
    return P()


def tp_shardings(mesh: Mesh, params, zero: bool = False,
                 zero_min_size: int = None):
    """NamedSharding pytree for a DiT/DiM param tree: Megatron TP specs,
    optionally extended with 'data'-axis ZeRO sharding on the largest
    still-free dimension of each leaf (hybrid FSDP x TP — parallel/fsdp.py)."""
    from .fsdp import DEFAULT_MIN_SIZE, extend_spec_with_data

    min_size = DEFAULT_MIN_SIZE if zero_min_size is None else zero_min_size
    dp = mesh.shape[DATA_AXIS]

    def one(path, leaf):
        spec = _spec_for_path(path, leaf)
        if zero:
            spec = extend_spec_with_data(leaf.shape, spec, dp, min_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_model_params(mesh: Mesh, params, zero: bool = False,
                       zero_min_size: int = None):
    """Place a DiT/DiM param pytree on the mesh with Megatron TP
    shardings (UNet params simply land replicated — its conv backbone is
    DP-scaled; see docs/benchmarks.md)."""
    shardings = tp_shardings(mesh, params, zero, zero_min_size)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings
    )


# Back-compat name (the rules are shared).
shard_dit_params = shard_model_params
shard_dim_params = shard_model_params


def shard_state_for_tp(mesh: Mesh, state, zero: bool = False,
                       zero_min_size: int = None):
    """Shard a TrainState's params/EMA with the Megatron TP rules.

    `zero=True` (hybrid FSDP x TP) additionally shards each leaf's
    largest TP-free dimension over 'data', including the Adam moments
    (placed leaf-for-leaf like their params), so state memory divides by
    dp x tp. Without it, optimizer moments are left for jit to lay out:
    inside the train step gradients carry the param shardings, so XLA
    keeps Adam's mu/nu co-sharded with their params without explicit
    placement here.
    """
    from ..utils.trainer import TrainState

    params = shard_model_params(mesh, state.params, zero, zero_min_size)
    ema = (
        shard_model_params(mesh, state.ema_params, zero, zero_min_size)
        if state.ema_params is not None
        else None
    )
    if zero:
        from .fsdp import place_opt_state_like_params

        opt_state = place_opt_state_like_params(
            state.opt_state, state.params,
            tp_shardings(mesh, state.params, zero, zero_min_size),
            NamedSharding(mesh, P()),
        )
    else:
        opt_state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())),
            state.opt_state,
        )
    return TrainState(params=params, opt_state=opt_state, ema_params=ema)
