"""UniPC sampler (Zhao et al. 2023) — extension beyond the reference
(whose fast sampler is 50-step DDIM, reference diffusion/ddim.py).

Unified predictor-corrector in the x0 (data-prediction) formulation,
order 2:

- Predictor (UniP-2): the multistep exponential-integrator update with
  linear x0 extrapolation from the previous model output — identical in
  form to DPM-Solver++(2M) (`dpm_solver.py`), anchored at the CORRECTED
  current sample.
- Corrector (UniC-2): once the model has been evaluated at the
  predicted point, the step that produced it is re-integrated with the
  EXACT exponential trapezoid — x0(lambda) modeled linearly between the
  two endpoint evaluations:

      x_i^c = (sigma_i / sigma_{i-1}) x_{i-1}
              + alpha_i [ (phi1 - c2) x0_{i-1} + c2 x0_i ]

      phi1 = 1 - e^{-h},   c2 = phi1 - (1 - (h + 1) e^{-h}) / h

  (both integrals closed-form, so the corrector is exact for any x0
  affine in lambda — where the paper's B(h) variants approximate).

The corrector costs NOTHING extra: the model evaluation at the
predicted point is exactly the one the next predictor step needs, so
UniPC does one model call per step like DDIM/DPM++ while substantially
improving low-step (<10) accuracy — each x_i is effectively recomputed
with a 2-point quadrature instead of an extrapolation.

TPU-native: the whole trajectory is ONE jitted `lax.scan`; the carry
holds (predicted sample, corrected previous sample, previous x0,
previous lambda/t). CFG is the fused [cond; uncond] batch; dynamic
thresholding / guidance rescale / cfg interval as everywhere else.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from . import base
from .dpm_solver import make_x0_fn, multistep_D
from .schedule import NoiseSchedule, ddim_timesteps, karras_timesteps


@functools.partial(
    jax.jit,
    static_argnames=("use_cfg", "p_threshold", "clip_denoised",
                     "guidance_rescale", "cfg_interval",
                     "return_all_timesteps"),
)
def _solve(
    schedule: NoiseSchedule,
    model_fn,
    img: jnp.ndarray,
    timesteps: jnp.ndarray,
    y: Optional[jnp.ndarray],
    cfg_scale: jnp.ndarray,
    *,
    use_cfg: bool,
    p_threshold: Optional[float],
    clip_denoised: bool,
    guidance_rescale: float = 0.0,
    cfg_interval=None,
    return_all_timesteps: bool,
):
    batch = img.shape[0]

    alpha_bar = schedule.alphas_cumprod
    a = jnp.sqrt(alpha_bar)
    s = jnp.sqrt(1.0 - alpha_bar)
    lam = jnp.log(jnp.clip(a, min=1e-12) / jnp.clip(s, min=1e-12))

    t_next_seq = jnp.concatenate(
        [timesteps[1:], jnp.full((1,), -1, dtype=timesteps.dtype)]
    )

    x0_at = make_x0_fn(
        schedule, model_fn, y, cfg_scale, use_cfg=use_cfg,
        p_threshold=p_threshold, clip_denoised=clip_denoised,
        guidance_rescale=guidance_rescale, cfg_interval=cfg_interval,
    )

    def step(carry, scan_in):
        x_pred, x_prev, x0_prev, lam_prev, t_prev, have_prev = carry
        t_scalar, t_next_scalar = scan_in
        t = jnp.full((batch,), t_scalar, dtype=jnp.int32)
        # the model evaluates at the PREDICTED point (standard UniPC:
        # this evaluation both corrects the current sample and feeds the
        # next predictor — one call per step)
        x0 = x0_at(x_pred, t)

        lam_t = lam[t_scalar]
        h_prev = lam_t - lam_prev
        hp = jnp.clip(h_prev, min=1e-12)

        # UniC-2: exact exponential trapezoid over [t_prev, t], anchored
        # at the corrected previous sample
        phi1p = 1.0 - jnp.exp(-hp)
        c2 = phi1p - (1.0 - (hp + 1.0) * jnp.exp(-hp)) / hp
        x_corr = (
            s[t_scalar] / jnp.clip(s[t_prev], min=1e-12) * x_prev
            + a[t_scalar] * ((phi1p - c2) * x0_prev + c2 * x0)
        )
        x_cur = jnp.where(have_prev, x_corr, x_pred)

        # UniP-2 (the shared DPM-Solver++(2M) combination), anchored at
        # the corrected current sample
        final = t_next_scalar < 0
        tn = jnp.clip(t_next_scalar, 0)
        lam_next = jnp.where(final, lam_t + 1.0, lam[tn])  # finite dummy
        h = lam_next - lam_t
        D = multistep_D(x0, x0_prev, h, h_prev, have_prev, final)

        sig_ratio = s[tn] / jnp.clip(s[t_scalar], min=1e-12)
        x_new = sig_ratio * x_cur - a[tn] * (jnp.exp(-h) - 1.0) * D
        x_new = jnp.where(final, D, x_new)

        new_carry = (x_new, x_cur, x0, lam_t, t_scalar, jnp.bool_(True))
        return new_carry, (x_new if return_all_timesteps else None)

    carry0 = (
        img, jnp.zeros_like(img), jnp.zeros_like(img),
        jnp.float32(0.0), jnp.int32(0), jnp.bool_(False),
    )
    (x, _, _, _, _, _), ys = jax.lax.scan(
        step, carry0,
        (timesteps.astype(jnp.int32), t_next_seq.astype(jnp.int32)),
    )
    return (ys if return_all_timesteps else x)


class UniPC:
    """UniPC process (same API as DDIM/DPMSolverPP; deterministic)."""

    def __init__(
        self,
        num_timesteps: int = 1000,
        num_inference_steps: int = 10,
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        eta: float = 0.0,  # accepted for API symmetry; solver is an ODE
        prediction_type: str = "eps",
        loss_weighting: str = "uniform",
        min_snr_gamma: float = 5.0,
        zero_terminal_snr: bool = False,
        timestep_spacing: str = "uniform",
        karras_rho: float = 7.0,
        guidance_rescale: float = 0.0,
        clip_sample: bool = True,
        cfg_interval=None,
    ):
        del eta
        if prediction_type not in base.VALID_PREDICTION_TYPES:
            raise ValueError(
                f"Unknown prediction type: {prediction_type!r} "
                f"(expected one of {base.VALID_PREDICTION_TYPES})"
            )
        if loss_weighting not in base.VALID_LOSS_WEIGHTINGS:
            raise ValueError(
                f"Unknown loss weighting: {loss_weighting!r} "
                f"(expected one of {base.VALID_LOSS_WEIGHTINGS})"
            )
        if zero_terminal_snr and prediction_type == "eps":
            raise ValueError(
                "zero_terminal_snr requires prediction_type 'v' or 'x0': "
                "at SNR = 0 the terminal step is pure noise, so an "
                "eps-prediction carries no signal to denoise from"
            )
        if timestep_spacing not in ("uniform", "karras"):
            raise ValueError(
                f"Unknown timestep spacing: {timestep_spacing!r} "
                "(expected 'uniform' or 'karras')"
            )
        self.num_timesteps = num_timesteps
        self.num_inference_steps = num_inference_steps
        self.prediction_type = prediction_type
        self.loss_weighting = loss_weighting
        self.min_snr_gamma = float(min_snr_gamma)
        self.zero_terminal_snr = bool(zero_terminal_snr)
        self.timestep_spacing = timestep_spacing
        self.karras_rho = float(karras_rho)
        self.guidance_rescale = base.validate_guidance_rescale(guidance_rescale)
        self.clip_sample = bool(clip_sample)
        self.cfg_interval = base.validate_cfg_interval(
            cfg_interval, num_timesteps
        )
        self.schedule = NoiseSchedule.create(
            num_timesteps, beta_start, beta_end, beta_schedule,
            zero_terminal_snr=zero_terminal_snr,
        )
        self._setup_inference_timesteps()

    def _pair_fn(self, model_fn):
        return base.wrap_model_as_eps_x0(
            self.schedule, model_fn, self.prediction_type
        )

    def _setup_inference_timesteps(self):
        if self.timestep_spacing == "karras":
            self.inference_timesteps = karras_timesteps(
                self.schedule, self.num_inference_steps, self.karras_rho
            )
        else:
            self.inference_timesteps = ddim_timesteps(
                self.num_timesteps, self.num_inference_steps
            )

    def set_inference_steps(self, num_inference_steps: int):
        self.num_inference_steps = num_inference_steps
        self._setup_inference_timesteps()

    # training-side API mirrors DDPM/DDIM
    def q_sample(self, x_start, t, noise):
        return base.q_sample(self.schedule, x_start, t, noise)

    def p_losses(self, model_fn, x_start, t, noise, y=None, loss_type="l2"):
        return base.p_losses(
            self.schedule, model_fn, x_start, t, noise, y=y,
            loss_type=loss_type, prediction_type=self.prediction_type,
            weighting=self.loss_weighting, snr_gamma=self.min_snr_gamma,
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
        return _solve(
            self.schedule, self._pair_fn(model_fn), img,
            self.inference_timesteps, y, cfg_scale,
            use_cfg=use_cfg, p_threshold=p_threshold,
            clip_denoised=clip_denoised,
            guidance_rescale=self.guidance_rescale,
            cfg_interval=self.cfg_interval,
            return_all_timesteps=return_all_timesteps,
        )

    def sample(self, model_fn, shape, rng, y=None, init_noise=None,
               return_all_timesteps=False, progress=False):
        return self._run(
            model_fn, shape, rng, y, 0.0, init_noise,
            use_cfg=False, p_threshold=None,
            clip_denoised=self.clip_sample,
            return_all_timesteps=return_all_timesteps, progress=progress,
            desc="UniPC Sampling",
        )

    def sample_with_cfg(self, model_fn, shape, y, rng, cfg_scale=1.0,
                        p_threshold=base.AUTO_THRESHOLD, init_noise=None,
                        return_all_timesteps=False, progress=False):
        return self._run(
            model_fn, shape, rng, y, jnp.asarray(cfg_scale, jnp.float32),
            init_noise,
            use_cfg=True,
            p_threshold=base.resolve_p_threshold(
                p_threshold, self.clip_sample
            ),
            clip_denoised=self.clip_sample,
            return_all_timesteps=return_all_timesteps, progress=progress,
            desc=f"UniPC sampling with CFG scale {cfg_scale}",
        )
