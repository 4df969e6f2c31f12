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


def gated_ema_update(optimizer, new_opt_state, ema_params, params,
                     decay: float):
    """`ema_update` that freezes on optax.MultiSteps micro-steps.

    With gradient accumulation the params only move every k-th call;
    lerping on the k-1 no-op calls would compound the decay to
    decay^k per real update (0.95 -> ~0.81 at k=4). Gating on
    `has_updated` keeps one lerp per real optimizer update, matching
    the non-accumulated semantics.
    """
    import optax

    lerped = ema_update(ema_params, params, decay)
    if isinstance(optimizer, optax.MultiSteps):
        applied = optimizer.has_updated(new_opt_state)
        return jax.tree_util.tree_map(
            lambda new, old: jnp.where(applied, new, old),
            lerped, ema_params,
        )
    return lerped
