"""DDPM (Ho et al., 2020) — TPU-native ancestral sampler.

Behavioral parity with reference `diffusion/ddpm.py` (class DDPM:15): same
schedule math, posterior coefficients, CFG-on-epsilon and Imagen dynamic
thresholding. The rebuild replaces the reference's per-step Python loop
(ddpm.py:243,288) with a single `lax.scan` compiled once under `jax.jit`:
1000 denoising steps execute on-device with zero host round-trips, and CFG
runs as one fused [cond; uncond] batch per step instead of two model calls.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from . import base
from .schedule import NoiseSchedule, extract


def posterior_step(
    schedule: NoiseSchedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    x0_pred: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """One ancestral step x_t -> x_{t-1} (parity: ddpm.py:183-220).

    posterior mean = c1[t]*x0 + c2[t]*x_t ; adds exp(0.5*logvar)*noise
    masked out at t == 0 (branch-free `where` instead of the reference's
    float mask — identical numerics, scan-friendly).
    """
    c1 = extract(schedule.posterior_mean_coef1, t, x.ndim)
    c2 = extract(schedule.posterior_mean_coef2, t, x.ndim)
    mean = c1 * x0_pred + c2 * x
    logvar = extract(schedule.posterior_log_variance_clipped, t, x.ndim)
    nonzero = (t != 0).reshape(-1, *((1,) * (x.ndim - 1))).astype(x.dtype)
    return mean + nonzero * jnp.exp(0.5 * logvar) * noise


@functools.partial(
    jax.jit,
    static_argnames=("shape", "return_all_timesteps", "clip_denoised"),
)
def _sample_impl(
    schedule: NoiseSchedule,
    model_fn,
    shape: Sequence[int],
    rng: jax.Array,
    y: Optional[jnp.ndarray],
    init_noise: Optional[jnp.ndarray] = None,
    *,
    return_all_timesteps: bool,
    clip_denoised: bool = True,
):
    """Unconditional/conditional ancestral sampling (parity: ddpm.py:222-252).

    `init_noise` optionally injects the starting x_T — the cross-framework
    golden-test hook (SURVEY.md §7: PyTorch and JAX RNG streams differ
    irreducibly, so parity tests feed identical noise from a file).
    """
    num_timesteps = schedule.betas.shape[0]
    batch = shape[0]
    rng, init_rng = jax.random.split(rng)
    img = (
        init_noise
        if init_noise is not None
        else jax.random.normal(init_rng, tuple(shape), dtype=jnp.float32)
    )

    def step(carry, i):
        img = carry
        t = jnp.full((batch,), i, dtype=jnp.int32)
        eps = model_fn(img, t, y)
        x0 = base.predict_x0_from_eps(schedule, img, t, eps)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        noise = jax.random.normal(jax.random.fold_in(rng, i), img.shape, img.dtype)
        img = posterior_step(schedule, img, t, x0, noise)
        return img, (img if return_all_timesteps else None)

    ts = jnp.arange(num_timesteps - 1, -1, -1)
    img, all_imgs = jax.lax.scan(step, img, ts)
    return all_imgs if return_all_timesteps else img


@functools.partial(
    jax.jit,
    static_argnames=("shape", "return_all_timesteps", "p_threshold"),
)
def _sample_cfg_impl(
    schedule: NoiseSchedule,
    model_fn,
    shape: Sequence[int],
    rng: jax.Array,
    y: jnp.ndarray,
    cfg_scale: jnp.ndarray,
    init_noise: Optional[jnp.ndarray] = None,
    *,
    p_threshold: Optional[float],
    return_all_timesteps: bool,
):
    """CFG + dynamic-thresholding sampling (parity: ddpm.py:254-332)."""
    num_timesteps = schedule.betas.shape[0]
    batch = shape[0]
    rng, init_rng = jax.random.split(rng)
    img = (
        init_noise
        if init_noise is not None
        else jax.random.normal(init_rng, tuple(shape), dtype=jnp.float32)
    )

    def step(carry, i):
        img = carry
        t = jnp.full((batch,), i, dtype=jnp.int32)
        eps = base.cfg_eps(model_fn, img, t, y, cfg_scale)
        x0 = base.predict_x0_from_eps(schedule, img, t, eps)
        x0 = base.apply_x0_constraint(x0, p_threshold)
        noise = jax.random.normal(jax.random.fold_in(rng, i), img.shape, img.dtype)
        img = posterior_step(schedule, img, t, x0, noise)
        return img, (img if return_all_timesteps else None)

    ts = jnp.arange(num_timesteps - 1, -1, -1)
    img, all_imgs = jax.lax.scan(step, img, ts)
    return all_imgs if return_all_timesteps else img


class DDPM:
    """DDPM diffusion process (API parity: reference ddpm.py:15-332).

    Differences from the reference, by design (TPU-native):
      * no `device` argument — placement is controlled by jax sharding;
      * all sampling entry points take an explicit PRNG key;
      * the model is any callable `(x, t, y) -> eps` on NHWC arrays.
    """

    def __init__(
        self,
        num_timesteps: int = 1000,
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
    ):
        self.num_timesteps = num_timesteps
        self.schedule = NoiseSchedule.create(
            num_timesteps, beta_start, beta_end, beta_schedule
        )

    # -- training-side API -------------------------------------------------
    def q_sample(self, x_start, t, noise):
        return base.q_sample(self.schedule, x_start, t, noise)

    def p_losses(self, model_fn, x_start, t, noise, y=None, loss_type="l2"):
        return base.p_losses(
            self.schedule, model_fn, x_start, t, noise, y=y, loss_type=loss_type
        )

    # -- single-step API (parity: ddpm.py:197-220) --------------------------
    def p_sample(self, model_fn, x, t, rng, y=None, clip_denoised=True, eps=None,
                 x0_pred=None):
        if eps is None:
            eps = model_fn(x, t, y)
        if x0_pred is None:
            x0_pred = base.predict_x0_from_eps(self.schedule, x, t, eps)
        if clip_denoised:
            x0_pred = jnp.clip(x0_pred, -1.0, 1.0)
        noise = jax.random.normal(rng, x.shape, x.dtype)
        return posterior_step(self.schedule, x, t, x0_pred, noise)

    # -- whole-trajectory samplers ------------------------------------------
    def sample(self, model_fn, shape, rng, y=None, return_all_timesteps=False,
               init_noise=None):
        """Generate samples; one jit-compiled scan over all T steps."""
        return _sample_impl(
            self.schedule,
            base.as_pytree_fn(model_fn),
            tuple(shape),
            rng,
            y,
            init_noise,
            return_all_timesteps=return_all_timesteps,
        )

    def sample_with_cfg(
        self,
        model_fn,
        shape,
        y,
        rng,
        cfg_scale: float = 3.0,
        p_threshold: Optional[float] = 0.995,
        return_all_timesteps: bool = False,
        init_noise=None,
    ):
        """CFG sampling (parity: ddpm.py:254-332). `cfg_scale` is dynamic —
        changing it does not retrigger compilation."""
        if y is None:
            raise ValueError("CFG sampling requires class labels y.")
        if p_threshold is not None and not (0.0 < float(p_threshold) < 1.0):
            raise ValueError("p_threshold must be in (0, 1) or None")
        return _sample_cfg_impl(
            self.schedule,
            base.as_pytree_fn(model_fn),
            tuple(shape),
            rng,
            jnp.asarray(y),
            jnp.float32(cfg_scale),
            init_noise,
            p_threshold=p_threshold,
            return_all_timesteps=return_all_timesteps,
        )
