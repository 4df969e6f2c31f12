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
    """Megatron rules for DiT params (flax path key names).

    Column-parallel (shard output features): SelfAttention QKV (Dense_0),
    Mlp up-projection (Dense_0). Row-parallel (shard input features):
    SelfAttention out (Dense_1), Mlp down-projection (Dense_1). Everything
    else (embedders, adaLN, final layer, norms) is replicated — they are
    tiny compared to the block matmuls.
    """
    keys = [getattr(k, "key", str(k)) for k in path_keys]
    path = "/".join(keys)
    is_kernel = keys[-1] == "kernel"
    is_bias = keys[-1] == "bias"

    column = ("SelfAttention" in path or "Mlp" in path) and "Dense_0" in path
    row = ("SelfAttention" in path or "Mlp" in path) and "Dense_1" in path

    if column and is_kernel and leaf.ndim == 2:
        return P(None, MODEL_AXIS)
    if column and is_bias and leaf.ndim == 1:
        return P(MODEL_AXIS)
    if row and is_kernel and leaf.ndim == 2:
        return P(MODEL_AXIS, None)
    return P()


def shard_dit_params(mesh: Mesh, params):
    """Place a DiT param pytree on the mesh with Megatron TP shardings."""

    def place(path, leaf):
        spec = _spec_for_path(path, leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_state_for_tp(mesh: Mesh, state):
    """Shard a TrainState's params/EMA with the DiT TP rules.

    Optimizer moments are left for jit to lay out: inside the train step
    gradients carry the param shardings, so XLA keeps Adam's mu/nu
    co-sharded with their params without explicit placement here.
    """
    from ..utils.trainer import TrainState

    params = shard_dit_params(mesh, state.params)
    ema = (
        shard_dit_params(mesh, state.ema_params)
        if state.ema_params is not None
        else None
    )
    opt_state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), state.opt_state
    )
    return TrainState(params=params, opt_state=opt_state, ema_params=ema)
