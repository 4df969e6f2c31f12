"""Exponential moving average of parameters — on-device pytree lerp.

Replaces the reference's rank-0-only state-dict walk
(utils/trainer.py:156-202) with a jit-fusable tree lerp that lives inside
the train step: under data-parallel sharding the EMA is computed once on
replicated params by XLA, no host sync, and serializes to the same logical
"ema_model_state" checkpoint entry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, decay: float):
    """ema <- ema*decay + params*(1-decay) (parity: trainer.py:199-202)."""
    d = jnp.asarray(decay, dtype=jnp.float32)
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, params
    )
