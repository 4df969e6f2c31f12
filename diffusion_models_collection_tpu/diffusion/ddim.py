"""DDIM (Song et al., 2020) — TPU-native accelerated sampler.

Behavioral parity with reference `diffusion/ddim.py` (class DDIM:13): same
timestep grid `round(linspace(T-1, 0, S))`, same eta-sigma stochasticity,
same final-step semantics (t_next = -1 ⇒ alpha_bar_next = 1). The rebuild
runs the S-step loop as one `lax.scan` under jit with fused-batch CFG; the
reference's data-dependent branch at ddim.py:176-179 becomes a branch-free
`jnp.where` so the whole trajectory compiles to a single XLA program.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from . import base
from .schedule import NoiseSchedule, ddim_timesteps, extract


def ddim_step(
    schedule: NoiseSchedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    t_next: jnp.ndarray,
    eps: jnp.ndarray,
    x0_pred: jnp.ndarray,
    eta: float,
    noise: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """One DDIM update (parity: reference ddim.py:154-208).

    `t_next` entries of -1 select alpha_bar = 1 via `where` (the reference's
    host-side `t_next.min() >= 0` branch, made trace-safe).
    """
    alpha_t = extract(schedule.alphas_cumprod, t, x.ndim)
    alpha_next = jnp.where(
        (t_next >= 0).reshape(-1, *((1,) * (x.ndim - 1))),
        extract(schedule.alphas_cumprod, jnp.clip(t_next, 0), x.ndim),
        jnp.ones_like(alpha_t),
    )
    sigma = eta * jnp.sqrt(
        jnp.clip(
            (1 - alpha_next) / (1 - alpha_t) * (1 - alpha_t / alpha_next),
            min=0.0,
        )
    )
    dir_xt = jnp.sqrt(jnp.clip(1 - alpha_next - sigma**2, min=0.0)) * eps
    x_prev = jnp.sqrt(alpha_next) * x0_pred + dir_xt
    if eta > 0:
        x_prev = x_prev + sigma * noise
    return x_prev


@functools.partial(
    jax.jit,
    static_argnames=(
        "shape",
        "eta",
        "return_all_timesteps",
        "use_cfg",
        "p_threshold",
        "clip_denoised",
    ),
)
def _sample_impl(
    schedule: NoiseSchedule,
    model_fn,
    shape: Sequence[int],
    rng: jax.Array,
    y: Optional[jnp.ndarray],
    timesteps: jnp.ndarray,
    cfg_scale: jnp.ndarray,
    init_noise: Optional[jnp.ndarray] = None,
    *,
    eta: float,
    use_cfg: bool,
    p_threshold: Optional[float],
    clip_denoised: bool,
    return_all_timesteps: bool,
):
    """DDIM trajectory as a single scan (parity: ddim.py:210-346)."""
    batch = shape[0]
    rng, init_rng = jax.random.split(rng)
    img = (
        init_noise
        if init_noise is not None
        else jax.random.normal(init_rng, tuple(shape), dtype=jnp.float32)
    )

    t_next_seq = jnp.concatenate(
        [timesteps[1:], jnp.full((1,), -1, dtype=timesteps.dtype)]
    )

    def step(carry, scan_in):
        img = carry
        i, t_scalar, t_next_scalar = scan_in
        t = jnp.full((batch,), t_scalar, dtype=jnp.int32)
        t_next = jnp.full((batch,), t_next_scalar, dtype=jnp.int32)
        if use_cfg:
            eps = base.cfg_eps(model_fn, img, t, y, cfg_scale)
            x0 = base.predict_x0_from_eps(schedule, img, t, eps)
            x0 = base.apply_x0_constraint(x0, p_threshold)
        else:
            eps = model_fn(img, t, y)
            x0 = base.predict_x0_from_eps(schedule, img, t, eps)
            if clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
        noise = (
            jax.random.normal(jax.random.fold_in(rng, i), img.shape, img.dtype)
            if eta > 0
            else None
        )
        img = ddim_step(schedule, img, t, t_next, eps, x0, eta, noise)
        return img, (img if return_all_timesteps else None)

    idx = jnp.arange(timesteps.shape[0])
    img, all_imgs = jax.lax.scan(step, img, (idx, timesteps, t_next_seq))
    return all_imgs if return_all_timesteps else img


class DDIM:
    """DDIM diffusion process (API parity: reference ddim.py:13-352).

    Training-side methods (`q_sample`, `p_losses`) are identical to DDPM,
    as in the reference (ddim.py:87-143).
    """

    def __init__(
        self,
        num_timesteps: int = 1000,
        num_inference_steps: int = 50,
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        eta: float = 0.0,
    ):
        self.num_timesteps = num_timesteps
        self.num_inference_steps = num_inference_steps
        self.eta = float(eta)
        self.schedule = NoiseSchedule.create(
            num_timesteps, beta_start, beta_end, beta_schedule
        )
        self._setup_inference_timesteps()

    def _setup_inference_timesteps(self):
        self.inference_timesteps = ddim_timesteps(
            self.num_timesteps, self.num_inference_steps
        )

    def set_inference_steps(self, num_inference_steps: int):
        """Update the inference step count (parity: ddim.py:348-351)."""
        self.num_inference_steps = num_inference_steps
        self._setup_inference_timesteps()

    # -- training-side API ---------------------------------------------------
    def q_sample(self, x_start, t, noise):
        return base.q_sample(self.schedule, x_start, t, noise)

    def p_losses(self, model_fn, x_start, t, noise, y=None, loss_type="l2"):
        return base.p_losses(
            self.schedule, model_fn, x_start, t, noise, y=y, loss_type=loss_type
        )

    # -- single-step API (parity: ddim.py:154-208) ----------------------------
    def p_sample(self, model_fn, x, t, t_next, rng=None, y=None,
                 clip_denoised=True, eps=None, x0_pred=None):
        if eps is None:
            eps = model_fn(x, t, y)
        if x0_pred is None:
            x0_pred = base.predict_x0_from_eps(self.schedule, x, t, eps)
        if clip_denoised:
            x0_pred = jnp.clip(x0_pred, -1.0, 1.0)
        noise = (
            jax.random.normal(rng, x.shape, x.dtype) if self.eta > 0 else None
        )
        return ddim_step(self.schedule, x, t, t_next, eps, x0_pred, self.eta, noise)

    # -- whole-trajectory samplers --------------------------------------------
    def sample(self, model_fn, shape, rng, y=None, return_all_timesteps=False,
               init_noise=None):
        return _sample_impl(
            self.schedule,
            base.as_pytree_fn(model_fn),
            tuple(shape),
            rng,
            y,
            self.inference_timesteps,
            jnp.float32(0.0),
            init_noise,
            eta=self.eta,
            use_cfg=False,
            p_threshold=None,
            clip_denoised=True,
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
        if y is None:
            raise ValueError("CFG sampling requires class labels y.")
        if p_threshold is not None and not (0.0 < float(p_threshold) < 1.0):
            raise ValueError("p_threshold must be in (0, 1) or None")
        return _sample_impl(
            self.schedule,
            base.as_pytree_fn(model_fn),
            tuple(shape),
            rng,
            jnp.asarray(y),
            self.inference_timesteps,
            jnp.float32(cfg_scale),
            init_noise,
            eta=self.eta,
            use_cfg=True,
            p_threshold=p_threshold,
            clip_denoised=False,
            return_all_timesteps=return_all_timesteps,
        )
