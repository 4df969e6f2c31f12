"""Progressive distillation (Salimans & Ho 2022) — extension beyond the
reference: halve the deterministic sampler's step count repeatedly by
teaching a student to match TWO teacher DDIM steps with ONE of its own.

Math (x_t = a_t x0 + b_t eps; teacher pair (eps, x0) via
`base.wrap_model_as_eps_x0`): from z at grid time t, run the teacher's
deterministic DDIM update t -> t_mid -> t_next to z''. The student's one
eta=0 step from (z, t) to t_next lands on

    z'' = a_next * x0 + b_next * eps,   eps = (z - a_t * x0) / b_t

so the unique x0-space target the student must predict at (z, t) is

    x0_target = (z'' - (b_next / b_t) * z) / (a_next - (b_next / b_t) * a_t)

(eq. 8-10 of the paper, with the t_next = -1 terminal convention
a_next = 1, b_next = 0 giving simply x0_target = z''). The student
regresses onto it with the paper's truncated-SNR weighting
w(t) = max(SNR(t), 1) on the x0-space error, then becomes the next
stage's teacher at half the step count.

TPU-native: targets are two fused teacher forwards inside the SAME
jitted/donated train step as the student's forward/backward — no host
round trips; the teacher rides as frozen jit-closure constants.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .ddim import ddim_step
from .schedule import NoiseSchedule, ddim_timesteps, extract


def distill_grids(num_timesteps: int, student_steps: int):
    """(t, t_mid, t_next) int32 arrays for a `student_steps`-step student
    distilled from a 2x-step teacher: the teacher's 2N-step DDIM grid
    interleaves the student's N-step one — t takes the even entries,
    t_mid the odd ones, t_next the even entries shifted (terminal -1).
    """
    if student_steps < 1:
        raise ValueError("student_steps must be >= 1")
    teacher = np.asarray(ddim_timesteps(num_timesteps, 2 * student_steps))
    t = teacher[0::2]
    t_mid = teacher[1::2]
    t_next = np.concatenate([teacher[2::2], [-1]])
    return (
        jnp.asarray(t, jnp.int32),
        jnp.asarray(t_mid, jnp.int32),
        jnp.asarray(t_next, jnp.int32),
    )


def _ab(schedule: NoiseSchedule, t, ndim):
    """(a, b) = (sqrt(acp), sqrt(1-acp)) at t, with the t < 0 terminal
    convention a = 1, b = 0 applied via `where` (trace-safe)."""
    a = extract(schedule.sqrt_alphas_cumprod, jnp.clip(t, 0), ndim)
    b = extract(schedule.sqrt_one_minus_alphas_cumprod, jnp.clip(t, 0), ndim)
    mask = (t >= 0).reshape(-1, *((1,) * (ndim - 1)))
    return (
        jnp.where(mask, a, jnp.ones_like(a)),
        jnp.where(mask, b, jnp.zeros_like(b)),
    )


def two_step_teacher_target(
    schedule: NoiseSchedule,
    teacher_pair_fn,
    z: jnp.ndarray,
    t: jnp.ndarray,
    t_mid: jnp.ndarray,
    t_next: jnp.ndarray,
    y=None,
):
    """The x0-space regression target for one student step t -> t_next
    matching two teacher DDIM steps t -> t_mid -> t_next.

    All timesteps are per-sample int arrays; t_next may be -1 (terminal).
    Deterministic (eta = 0); the teacher's x0 is NOT clipped — clipping
    would teach the student a bent trajectory.
    """
    eps1, x01 = teacher_pair_fn(z, t, y)
    z_mid = ddim_step(schedule, z, t, t_mid, eps1, x01, 0.0, None)
    eps2, x02 = teacher_pair_fn(z_mid, jnp.clip(t_mid, 0), y)
    z2 = ddim_step(schedule, z_mid, t_mid, t_next, eps2, x02, 0.0, None)

    a_t, b_t = _ab(schedule, t, z.ndim)
    a_n, b_n = _ab(schedule, t_next, z.ndim)
    ratio = b_n / jnp.maximum(b_t, 1e-12)
    denom = a_n - ratio * a_t
    # denom = 0 would need two grid points at the same noise level —
    # impossible on a strictly descending grid; guard regardless
    safe = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    return (z2 - ratio * z) / safe


def student_distill_loss(
    schedule: NoiseSchedule,
    student_pair_fn,
    x0_target: jnp.ndarray,
    z: jnp.ndarray,
    t: jnp.ndarray,
    y=None,
):
    """Truncated-SNR-weighted x0-space regression (paper §4:
    w(t) = max(SNR(t), 1)) — defined on the x0 error directly, so it is
    exact for any student parameterization routed through the pair
    wrapper."""
    _, x0_pred = student_pair_fn(z, t, y)
    acp = extract(schedule.alphas_cumprod, t, 1).astype(jnp.float32)
    snr = acp / jnp.maximum(1.0 - acp, 1e-12)
    w = jnp.maximum(snr, 1.0)
    diff = x0_pred - x0_target
    per_sample = jnp.mean(diff**2, axis=tuple(range(1, diff.ndim)))
    return jnp.mean(w * per_sample)
