"""Expert parallelism for the MoE DiT over a 2-D (data, expert) mesh.

The reference has no MoE anywhere (SURVEY.md §2.3: "EP — NO (no MoE)"),
so both the MoE layer (models/moe.py) and this sharding are extensions,
done the TPU way: expert weights are STACKED with a leading expert axis
(w1 (E, d, h), w2 (E, h, d)), so expert parallelism is pure GSPMD
metadata — shard that leading axis over the 'expert' mesh axis and XLA
partitions the expert einsums, inserting the token all-to-alls (dispatch
in, combine out) over ICI automatically. No manual collectives, no
shard_map: the math is bit-identical to the replicated program, which is
what the EP==DP parity tests assert.

Everything that is not an expert weight (attention, router, embedders,
adaLN, final layer) stays replicated; gradients for those reduce over
BOTH mesh axes (the 'expert' axis acts as extra data parallelism for the
dense portion of the network — the standard MoE hybrid layout).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
EXPERT_AXIS = "expert"

# Leading-expert-axis param names inside a MoeMlp scope (models/moe.py).
_EXPERT_LEAF_NAMES = ("w1", "b1", "w2", "b2")


def data_expert_mesh(dp: int, ep: int, devices=None) -> Mesh:
    """2-D mesh: dp x ep over the first dp*ep devices."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: dp * ep]).reshape(dp, ep)
    return Mesh(devices, (DATA_AXIS, EXPERT_AXIS))


def _spec_for_path(path_keys, leaf) -> P:
    """Shard the leading expert axis of stacked expert weights; replicate
    the rest (router included — it is tiny and every device needs it)."""
    keys = [getattr(k, "key", str(k)) for k in path_keys]
    if any("MoeMlp" in k for k in keys) and keys[-1] in _EXPERT_LEAF_NAMES:
        return P(EXPERT_AXIS, *([None] * (leaf.ndim - 1)))
    return P()


def ep_shardings(mesh: Mesh, params):
    """NamedSharding pytree: expert-stacked leaves split over 'expert'."""
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: NamedSharding(mesh, _spec_for_path(p, leaf)), params
    )


def shard_model_params(mesh: Mesh, params):
    """Place a MoE-DiT param pytree on the mesh with EP shardings."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, ep_shardings(mesh, params)
    )


def shard_state_for_ep(mesh: Mesh, state):
    """Shard a TrainState's params/EMA over the expert axis.

    Optimizer moments are left replicated at placement time; inside the
    jitted train step the gradients carry the param shardings, so XLA
    keeps Adam's mu/nu co-sharded with their params (same treatment as
    tensor_parallel.shard_state_for_tp without ZeRO).
    """
    from ..utils.trainer import TrainState

    params = shard_model_params(mesh, state.params)
    ema = (
        shard_model_params(mesh, state.ema_params)
        if state.ema_params is not None
        else None
    )
    opt_state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())),
        state.opt_state,
    )
    return TrainState(params=params, opt_state=opt_state, ema_params=ema)
