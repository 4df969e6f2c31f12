"""Consistency distillation (Song et al. 2023; discrete-time boundary
scalings as in Latent Consistency Models, Luo et al. 2023) — extension
beyond the reference (which only ships DDPM/DDIM training + sampling,
reference diffusion/ddpm.py, ddim.py).

The consistency function maps any point of the probability-flow ODE
trajectory straight to its origin:

    f(x_t, t) = c_skip(t) * x_t + c_out(t) * x0_hat(x_t, t)

with the discrete-time boundary scalings (s = t / timestep_scaling)

    c_skip(t) = sd^2 / (s^2 + sd^2),    c_out(t) = s / sqrt(s^2 + sd^2)

so f(x, 0) = x exactly (c_skip(0) = 1, c_out(0) = 0) — the boundary
condition of the paper, satisfied by construction rather than by
parameter pinning. x0_hat is the student's x0-view through
`base.wrap_model_as_eps_x0`, so any `prediction_type` ('eps'/'v'/'x0')
distills without special cases.

Consistency-distillation loss (paper Alg. 2, DDIM as the ODE solver):
sample adjacent grid times (t, t_next), forward-noise data to z_t, take
ONE teacher DDIM step z_t -> z_hat at t_next, and regress

    d( f_theta(z_t, t),  f_{theta^-}(z_hat, t_next) )

where theta^- is the EMA "target" network (stop-gradient). d is the
pseudo-Huber distance sqrt(||.||^2 + c^2) - c (Song & Dhariwal 2023),
or plain L2. Guided distillation: with `distill_cfg_scale` = w > 0 the
teacher step uses CFG-guided (eps, x0) at fixed w, baking the guidance
into the student (as in LCM) — the student then samples WITHOUT CFG.

Sampling (paper Alg. 1, multistep): x0 = f(x_T, T-1); then repeatedly
re-noise to the next grid time and map back: z = a_t x0 + b_t eps,
x0 = f(z, t). One to four steps. TPU-native: the whole loop is one
jitted `lax.scan` like every other sampler here; the first step runs
outside the scan (its input is the raw init noise, not a re-noised x0).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from . import base
from .schedule import NoiseSchedule, ddim_timesteps, extract


def consistency_scalings(
    t: jnp.ndarray,
    ndim: int,
    sigma_data: float = 0.5,
    timestep_scaling: float = 10.0,
):
    """(c_skip, c_out) at integer timesteps t, broadcast to ndim.

    Exact boundary at t = 0: c_skip = 1, c_out = 0 — f(x, 0) = x holds
    identically, no learned component leaks through.
    """
    s = (t.astype(jnp.float32) / float(timestep_scaling)).reshape(
        -1, *((1,) * (ndim - 1))
    )
    sd2 = float(sigma_data) ** 2
    c_skip = sd2 / (s**2 + sd2)
    c_out = s / jnp.sqrt(s**2 + sd2)
    return c_skip, c_out


def consistency_apply(
    pair_fn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    y,
    sigma_data: float,
    timestep_scaling: float,
):
    """f(x, t) = c_skip * x + c_out * x0_hat — the consistency function
    built on the model's x0 view (any prediction_type)."""
    _, x0 = pair_fn(x, t, y)
    c_skip, c_out = consistency_scalings(
        t, x.ndim, sigma_data, timestep_scaling
    )
    return c_skip * x + c_out * x0


def cd_grids(num_timesteps: int, grid_size: int):
    """Adjacent (t, t_next) pairs on the DDIM grid for CD training.

    The grid is `round(linspace(T-1, 0, grid_size))` (the house DDIM
    spacing); pairs are consecutive entries, so t_next >= 0 always and
    the last pair ends at the t = 0 boundary anchor.
    """
    if grid_size < 2:
        raise ValueError("consistency grid needs >= 2 points")
    grid = ddim_timesteps(num_timesteps, grid_size)
    t = grid[:-1]
    t_next = grid[1:]
    return jnp.asarray(t, jnp.int32), jnp.asarray(t_next, jnp.int32)


def pseudo_huber(diff: jnp.ndarray, c: float) -> jnp.ndarray:
    """Per-sample pseudo-Huber sqrt(mean(d^2) + c^2) - c (Song &
    Dhariwal 2023 eq. 9, on the per-sample mean square)."""
    ms = jnp.mean(diff**2, axis=tuple(range(1, diff.ndim)))
    return jnp.sqrt(ms + c * c) - c


def consistency_distill_loss(
    schedule: NoiseSchedule,
    student_pair_fn,
    target_pair_fn,
    teacher_pair_fn,
    z: jnp.ndarray,
    t: jnp.ndarray,
    t_next: jnp.ndarray,
    y,
    *,
    sigma_data: float,
    timestep_scaling: float,
    distill_cfg_scale: float = 0.0,
    loss_type: str = "huber",
    huber_c: float = 0.03,
):
    """One CD step's loss (paper Alg. 2).

    `target_pair_fn` is theta^- (already parameter-frozen by the caller;
    stop_gradient is applied to its output regardless). The teacher ODE
    step uses guided (eps, x0) when distill_cfg_scale > 0 (requires y).
    """
    from .ddim import ddim_step  # local import: ddim imports base only

    if distill_cfg_scale and distill_cfg_scale > 0.0:
        if y is None:
            raise ValueError("guided distillation needs labels y")
        eps, x0 = base.cfg_eps_x0(
            teacher_pair_fn, z, t, y, float(distill_cfg_scale)
        )
    else:
        eps, x0 = teacher_pair_fn(z, t, y)
    z_hat = ddim_step(schedule, z, t, t_next, eps, x0, 0.0, None)

    f_target = jax.lax.stop_gradient(
        consistency_apply(
            target_pair_fn, z_hat, t_next, y, sigma_data, timestep_scaling
        )
    )
    f_student = consistency_apply(
        student_pair_fn, z, t, y, sigma_data, timestep_scaling
    )
    diff = f_student - f_target
    if loss_type == "huber":
        return jnp.mean(pseudo_huber(diff, float(huber_c)))
    if loss_type == "l2":
        return jnp.mean(diff**2)
    raise ValueError(f"Unknown consistency loss_type: {loss_type!r}")


def consistency_training_loss(
    schedule: NoiseSchedule,
    student_pair_fn,
    target_pair_fn,
    x0: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,
    t_next: jnp.ndarray,
    y,
    *,
    sigma_data: float,
    timestep_scaling: float,
    loss_type: str = "huber",
    huber_c: float = 0.03,
    weighting: str = "uniform",
):
    """One consistency-TRAINING step's loss (Song et al. 2023 Alg. 3;
    pseudo-Huber + optional 1/Δs weighting from Song & Dhariwal 2023).

    Teacher-free: instead of a frozen teacher's ODE step, the adjacent
    grid times are noised from the SAME data point with the SAME noise
    draw — z_t = a_t x0 + b_t n and z_next = a_next x0 + b_next n share
    eps = n, which is exactly the quantity the probability-flow ODE
    preserves, so the pair is an unbiased surrogate for one ODE step
    (exact in the point-mass limit, where both lie on one trajectory).

        d( f_theta(z_t, t),  f_{theta^-}(z_next, t_next) )

    `weighting='inverse_gap'` applies the iCT per-pair weight
    lambda = 1/(s_t - s_next) (s = t / timestep_scaling): small gaps —
    where the two f's are nearly equal and the gradient signal is weak —
    are amplified so every grid pair contributes comparably.
    """
    z_t = base.q_sample(schedule, x0, t, noise)
    z_next = base.q_sample(schedule, x0, t_next, noise)
    f_target = jax.lax.stop_gradient(
        consistency_apply(
            target_pair_fn, z_next, t_next, y, sigma_data, timestep_scaling
        )
    )
    f_student = consistency_apply(
        student_pair_fn, z_t, t, y, sigma_data, timestep_scaling
    )
    diff = f_student - f_target
    if loss_type == "huber":
        per_sample = pseudo_huber(diff, float(huber_c))
    elif loss_type == "l2":
        per_sample = jnp.mean(diff**2, axis=tuple(range(1, diff.ndim)))
    else:
        raise ValueError(f"Unknown consistency loss_type: {loss_type!r}")
    if weighting == "inverse_gap":
        gap = (t - t_next).astype(jnp.float32) / float(timestep_scaling)
        per_sample = per_sample / jnp.maximum(gap, 1e-8)
    elif weighting != "uniform":
        raise ValueError(
            f"Unknown ct weighting: {weighting!r} "
            "(expected 'uniform' or 'inverse_gap')"
        )
    return jnp.mean(per_sample)


@functools.partial(
    jax.jit,
    static_argnames=(
        "use_cfg", "clip_denoised", "p_threshold", "sigma_data",
        "timestep_scaling", "return_all_timesteps",
    ),
)
def _cm_sample(
    schedule: NoiseSchedule,
    pair_fn,
    img: jnp.ndarray,
    timesteps: jnp.ndarray,
    y: Optional[jnp.ndarray],
    cfg_scale: jnp.ndarray,
    rng: jax.Array,
    *,
    use_cfg: bool,
    clip_denoised: bool,
    p_threshold: Optional[float],
    sigma_data: float,
    timestep_scaling: float,
    return_all_timesteps: bool,
):
    batch = img.shape[0]

    def f(x, t_scalar):
        t = jnp.full((batch,), t_scalar, jnp.int32)
        if use_cfg:
            # f-space CFG: f is affine in the model's x0 output at fixed
            # (x, t), so guiding f equals guiding x0 — consistent with
            # cfg_eps_x0. Fused [cond; uncond] batch.
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            y2 = jnp.concatenate([y, jnp.zeros_like(y)], axis=0)
            f2 = consistency_apply(
                pair_fn, x2, t2, y2, sigma_data, timestep_scaling
            )
            f_c, f_u = jnp.split(f2, 2, axis=0)
            out = f_u + cfg_scale * (f_c - f_u)
        else:
            out = consistency_apply(
                pair_fn, x, t, y, sigma_data, timestep_scaling
            )
        return base.constrain_x0(out, p_threshold, clip_denoised)

    x0 = f(img, timesteps[0])

    first = x0

    def step(carry, t_scalar):
        x0_prev, step_rng = carry
        step_rng, noise_rng = jax.random.split(step_rng)
        noise = jax.random.normal(noise_rng, x0_prev.shape, x0_prev.dtype)
        t = jnp.full((batch,), t_scalar, jnp.int32)
        a = extract(schedule.sqrt_alphas_cumprod, t, x0_prev.ndim)
        b = extract(schedule.sqrt_one_minus_alphas_cumprod, t, x0_prev.ndim)
        z = a * x0_prev + b * noise
        x0_new = f(z, t_scalar)
        return (x0_new, step_rng), (x0_new if return_all_timesteps else 0)

    (x0, _), frames = jax.lax.scan(step, (x0, rng), timesteps[1:])
    if return_all_timesteps:
        # one frame per consistency application: the first mapping plus
        # each re-noise-and-map step, [S, B, H, W, C]
        return jnp.concatenate([jnp.expand_dims(first, 0), frames], axis=0)
    return x0


class ConsistencyModel:
    """Consistency-model process (sampling side; same API as DDIM).

    Built by `factory.get_diffusion` for checkpoints whose embedded
    config carries `diffusion_type: 'consistency'` (written by
    `tools/distill.py --config <cfg with distill_method: 'consistency'>`).
    `num_inference_steps` is the multistep-sampling step count (1-4
    typical). Training-side q_sample/p_losses are intentionally absent —
    a consistency model is distilled, not fit with the diffusion loss.
    """

    def __init__(
        self,
        num_timesteps: int = 1000,
        num_inference_steps: int = 2,
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        prediction_type: str = "eps",
        sigma_data: float = 0.5,
        timestep_scaling: float = 10.0,
        zero_terminal_snr: bool = False,
        clip_sample: bool = True,
    ):
        if prediction_type not in base.VALID_PREDICTION_TYPES:
            raise ValueError(
                f"Unknown prediction type: {prediction_type!r} "
                f"(expected one of {base.VALID_PREDICTION_TYPES})"
            )
        self.num_timesteps = num_timesteps
        self.num_inference_steps = int(num_inference_steps)
        self.prediction_type = prediction_type
        self.sigma_data = float(sigma_data)
        self.timestep_scaling = float(timestep_scaling)
        self.clip_sample = bool(clip_sample)
        self.schedule = NoiseSchedule.create(
            num_timesteps, beta_start, beta_end, beta_schedule,
            zero_terminal_snr=zero_terminal_snr,
        )
        self._setup_inference_timesteps()

    def _setup_inference_timesteps(self):
        if self.num_inference_steps < 1:
            raise ValueError("num_inference_steps must be >= 1")
        # multistep grid EXCLUDING the t=0 anchor (f(x, 0) = x would be
        # an identity step): S interior points of the (S+1)-point grid.
        grid = ddim_timesteps(self.num_timesteps,
                              self.num_inference_steps + 1)
        self.inference_timesteps = jnp.asarray(grid[:-1], jnp.int32)

    def set_inference_steps(self, num_inference_steps: int):
        self.num_inference_steps = int(num_inference_steps)
        self._setup_inference_timesteps()

    def _pair_fn(self, model_fn):
        return base.wrap_model_as_eps_x0(
            self.schedule, model_fn, self.prediction_type
        )

    def _run(self, model_fn, shape, rng, y, cfg_scale, init_noise, *,
             use_cfg, p_threshold, clip_denoised, return_all_timesteps,
             progress, desc):
        if progress:
            print(f"{desc}: {self.num_inference_steps} steps")
        rng, init_rng = jax.random.split(rng)
        img = (
            init_noise
            if init_noise is not None
            else jax.random.normal(init_rng, tuple(shape), dtype=jnp.float32)
        )
        out = _cm_sample(
            self.schedule, self._pair_fn(model_fn), img,
            self.inference_timesteps, y,
            jnp.asarray(cfg_scale, jnp.float32), rng,
            use_cfg=use_cfg, clip_denoised=clip_denoised,
            p_threshold=p_threshold, sigma_data=self.sigma_data,
            timestep_scaling=self.timestep_scaling,
            return_all_timesteps=return_all_timesteps,
        )
        return out

    def sample(self, model_fn, shape, rng, y=None, init_noise=None,
               return_all_timesteps=False, progress=False):
        return self._run(
            model_fn, shape, rng, y, 0.0, init_noise,
            use_cfg=False, p_threshold=None,
            clip_denoised=self.clip_sample,
            return_all_timesteps=return_all_timesteps, progress=progress,
            desc="Consistency sampling",
        )

    def sample_with_cfg(self, model_fn, shape, y, rng, cfg_scale=1.0,
                        p_threshold=base.AUTO_THRESHOLD, init_noise=None,
                        return_all_timesteps=False, progress=False):
        """f-space CFG. NOTE: guided distillation (`distill_cfg_scale`)
        bakes the guidance in — sample with cfg_scale <= 1 (or via
        `sample`) for those checkpoints; extra CFG on top compounds."""
        if cfg_scale is None or float(cfg_scale) == 1.0:
            return self._run(
                model_fn, shape, rng, y, 1.0, init_noise,
                use_cfg=False,
                p_threshold=base.resolve_p_threshold(
                    p_threshold, self.clip_sample
                ),
                clip_denoised=self.clip_sample,
                return_all_timesteps=return_all_timesteps,
                progress=progress, desc="Consistency sampling (cond)",
            )
        return self._run(
            model_fn, shape, rng, y, float(cfg_scale), init_noise,
            use_cfg=True,
            p_threshold=base.resolve_p_threshold(
                p_threshold, self.clip_sample
            ),
            clip_denoised=self.clip_sample,
            return_all_timesteps=return_all_timesteps, progress=progress,
            desc=f"Consistency sampling with CFG scale {cfg_scale}",
        )
