"""Learning-rate schedules (parity target: reference train.py:153-209).

The reference steps its torch scheduler once per *epoch*
(utils/trainer.py:381-382). Here each schedule is a pure function of the
optimizer update count; the per-epoch semantics are recovered by dividing
the count by `updates_per_epoch`, so resume needs no scheduler state — the
restored optimizer count reproduces the exact LR (simpler than torch's
stateful scheduler serialization at trainer.py:347-348).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp

ETA_MIN = 1e-6


def cosine_epoch_lr(base_lr: float, t_max: int):
    """torch CosineAnnealingLR(T_max, eta_min=1e-6) evaluated at epoch e."""

    def fn(epoch):
        return ETA_MIN + (base_lr - ETA_MIN) * (
            1 + jnp.cos(jnp.pi * jnp.minimum(epoch, t_max) / t_max)
        ) / 2

    return fn


def linear_epoch_lr(base_lr: float, total_iters: int, start_factor=1.0,
                    end_factor=0.1):
    """torch LinearLR: factor interpolates start->end over total_iters."""

    def fn(epoch):
        frac = jnp.clip(epoch / total_iters, 0.0, 1.0)
        return base_lr * (start_factor + (end_factor - start_factor) * frac)

    return fn


def step_epoch_lr(base_lr: float, step_size: int, gamma: float):
    """torch StepLR: lr * gamma^(epoch // step_size)."""

    def fn(epoch):
        return base_lr * gamma ** jnp.floor(epoch / step_size)

    return fn


def warmup_cosine_epoch_lr(
    base_lr: float, epochs: int, warmup_epochs: int, warmup_start_factor: float
):
    """torch SequentialLR(LinearLR warmup, CosineAnnealingLR) parity
    (train.py:179-205)."""
    cosine_epochs = max(1, epochs - warmup_epochs)
    cosine = cosine_epoch_lr(base_lr, cosine_epochs)
    if warmup_epochs <= 0:
        return cosine
    warm = linear_epoch_lr(
        base_lr, max(1, warmup_epochs), warmup_start_factor, 1.0
    )

    def fn(epoch):
        return jnp.where(
            epoch < warmup_epochs, warm(epoch), cosine(epoch - warmup_epochs)
        )

    return fn


def build_lr_schedule(
    config: dict, updates_per_epoch: int
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build an optax-compatible schedule fn of the update count.

    Returns constant base LR when `use_scheduler` is false (train.py:154-156).
    """
    base_lr = float(config["learning_rate"])
    upe = max(1, int(updates_per_epoch))

    if not config.get("use_scheduler", False):
        return lambda count: jnp.asarray(base_lr, jnp.float32)

    stype = config.get("scheduler_type", "cosine").lower()
    epochs = int(config["epochs"])
    if stype == "cosine":
        epoch_fn = cosine_epoch_lr(base_lr, epochs)
    elif stype == "linear":
        epoch_fn = linear_epoch_lr(base_lr, epochs)
    elif stype == "step":
        epoch_fn = step_epoch_lr(
            base_lr, int(config.get("step_size", 50)), float(config.get("gamma", 0.5))
        )
    elif stype == "warmup_cosine":
        epoch_fn = warmup_cosine_epoch_lr(
            base_lr,
            epochs,
            max(0, int(config.get("warmup_epochs", 0))),
            float(config.get("warmup_start_factor", 0.01)),
        )
    else:
        raise ValueError(f"Unknown scheduler: {stype}")

    def schedule(count):
        epoch = jnp.floor_divide(count, upe)
        return jnp.asarray(epoch_fn(epoch), jnp.float32)

    return schedule
