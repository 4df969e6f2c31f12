"""DPM-Solver++(2M) — deterministic multistep ODE sampler (Lu et al. 2022).

Extension beyond the reference (which ships DDPM + DDIM only): a
second-order multistep solver in the data-prediction (x0) formulation,
the standard production choice for high quality at very low step counts
(10–20 steps ≈ DDIM-50 quality). Same API surface as `DDIM`
(`sample` / `sample_with_cfg` / `set_inference_steps`, init_noise hook),
same timestep grid, so the CLIs expose it as `--sampling_method dpm++`.

Math (x0-parameterization, order 2 multistep):
    alpha_t  = sqrt(alpha_bar_t),  sigma_t = sqrt(1 - alpha_bar_t)
    lambda_t = log(alpha_t / sigma_t)                (half log-SNR)
    h_i      = lambda_{t_{i+1}} - lambda_{t_i}
    r_i      = h_{i-1} / h_i
    D_i      = (1 + 1/(2 r_i)) x0_i - 1/(2 r_i) x0_{i-1}   (first step: x0_i)
    x_{t_{i+1}} = (sigma_{t_{i+1}} / sigma_{t_i}) x_{t_i}
                  - alpha_{t_{i+1}} (exp(-h_i) - 1) D_i
The final transition (reference convention t_next = -1 ⇒ alpha_bar = 1,
sigma = 0) uses the FIRST-order update, i.e. returns the current x0
prediction — the standard `lower_order_final` convention (k-diffusion,
diffusers): the second-order correction has no well-defined h there, so
extrapolating would make the sample depend on an arbitrary step size.
Selected branch-free with `where`, like DDIM's final step.

SDE variant (`sde=True`, CLI `--sampling_method dpm++sde`): the
SDE-DPM-Solver++(2M) midpoint update (Lu et al. 2022b §5 / the
`sde-dpmsolver++` algorithm in k-diffusion and diffusers) — an exact
exponential integrator for the reverse SDE between grid points, sharing
the same multistep data-prediction combination D:

    x_{t_{i+1}} = (sigma_{t_{i+1}} / sigma_{t_i}) e^{-h_i} x_{t_i}
                  + alpha_{t_{i+1}} (1 - e^{-2 h_i}) D_i
                  + sigma_{t_{i+1}} sqrt(1 - e^{-2 h_i}) z_i,  z_i ~ N(0, I)

Stochasticity re-injects noise each step (ancestral-style), which
empirically improves sample quality at moderate step counts for
imperfect models; h -> infinity recovers the terminal x0 like the ODE.
The per-step noise folds the step's timestep into the trajectory RNG, so
results are reproducible given the seed and independent of progress
segmentation. The final transition returns D (no noise at sigma = 0).

TPU-native: the whole trajectory is ONE jitted `lax.scan`; the multistep
history (x0_prev, lambda_prev) rides in the scan carry. CFG is the fused
[cond; uncond] batch from `base.cfg_eps`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from . import base
from .schedule import NoiseSchedule, ddim_timesteps, karras_timesteps


def make_x0_fn(schedule, model_fn, y, cfg_scale, *, use_cfg, p_threshold,
               clip_denoised, guidance_rescale, cfg_interval):
    """Constrained-x0 view of the model — the per-step evaluation shared
    by the multistep ODE solvers (DPM-Solver++ and UniPC)."""

    def x0_at(x, t):
        if use_cfg:
            _, x0 = base.cfg_eps_x0(
                model_fn, x, t, y, cfg_scale,
                guidance_rescale=guidance_rescale, schedule=schedule,
                cfg_interval=cfg_interval,
            )
            return base.constrain_x0(x0, p_threshold, clip_denoised)
        _, x0 = model_fn(x, t, y)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    return x0_at


def multistep_D(x0, x0_prev, h, h_prev, have_prev, final):
    """DPM-Solver++(2M) extrapolated data combination (shared with
    UniPC's predictor): first step, degenerate h, and the FINAL step (no
    well-defined h there — lower_order_final) use first order."""
    r = h_prev / jnp.clip(h, min=1e-12)
    coef = 1.0 / jnp.clip(2.0 * r, min=1e-12)
    use_ms = have_prev & (h > 1e-12) & jnp.logical_not(final)
    return jnp.where(use_ms, (1.0 + coef) * x0 - coef * x0_prev, x0)


@functools.partial(
    jax.jit,
    static_argnames=("use_cfg", "p_threshold", "clip_denoised",
                     "guidance_rescale", "cfg_interval", "sde",
                     "return_all_timesteps"),
)
def _solve(
    schedule: NoiseSchedule,
    model_fn,
    img: jnp.ndarray,
    timesteps: jnp.ndarray,
    y: Optional[jnp.ndarray],
    cfg_scale: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    *,
    use_cfg: bool,
    p_threshold: Optional[float],
    clip_denoised: bool,
    guidance_rescale: float = 0.0,
    cfg_interval=None,
    sde: bool = False,
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
        x, x0_prev, lam_prev, have_prev = carry
        t_scalar, t_next_scalar = scan_in
        t = jnp.full((batch,), t_scalar, dtype=jnp.int32)
        x0 = x0_at(x, t)

        lam_t = lam[t_scalar]
        final = t_next_scalar < 0
        tn = jnp.clip(t_next_scalar, 0)
        lam_next = jnp.where(final, lam_t + 1.0, lam[tn])  # finite dummy
        h = lam_next - lam_t
        h_prev = lam_t - lam_prev

        D = multistep_D(x0, x0_prev, h, h_prev, have_prev, final)

        sig_ratio = s[tn] / jnp.clip(s[t_scalar], min=1e-12)
        if sde:
            # exact exponential integrator for the reverse SDE between
            # grid points (sde-dpmsolver++ midpoint): extra e^{-h} decay
            # on the x term, (1 - e^{-2h}) on D, matched injected noise.
            # Folding the step's timestep (unique along the grid) keeps
            # trajectories reproducible and segmentation-invariant.
            z = jax.random.normal(
                jax.random.fold_in(rng, t_scalar), x.shape, x.dtype
            )
            decay = jnp.exp(-h)
            x_new = (
                sig_ratio * decay * x
                + a[tn] * (1.0 - decay**2) * D
                + s[tn] * jnp.sqrt(jnp.clip(1.0 - decay**2, min=0.0)) * z
            )
        else:
            x_new = sig_ratio * x - a[tn] * (jnp.exp(-h) - 1.0) * D
        x_new = jnp.where(final, D, x_new)

        new_carry = (x_new, x0, lam_t, jnp.bool_(True))
        return new_carry, (x_new if return_all_timesteps else None)

    carry0 = (img, jnp.zeros_like(img), jnp.float32(0.0), jnp.bool_(False))
    (x, _, _, _), ys = jax.lax.scan(
        step, carry0,
        (timesteps.astype(jnp.int32), t_next_seq.astype(jnp.int32)),
    )
    return (ys if return_all_timesteps else x)


class DPMSolverPP:
    """DPM-Solver++(2M) process (same API as DDIM; deterministic by
    default, stochastic SDE-DPM-Solver++(2M) with `sde=True`)."""

    def __init__(
        self,
        num_timesteps: int = 1000,
        num_inference_steps: int = 20,
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
        sde: bool = False,
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
        self.num_timesteps = num_timesteps
        self.num_inference_steps = num_inference_steps
        self.prediction_type = prediction_type
        self.loss_weighting = loss_weighting
        self.min_snr_gamma = float(min_snr_gamma)
        if zero_terminal_snr and prediction_type == "eps":
            raise ValueError(
                "zero_terminal_snr requires prediction_type 'v' or 'x0': "
                "at SNR = 0 the terminal step is pure noise, so an "
                "eps-prediction carries no signal to denoise from "
                "(Lin et al. 2023 pair it with v-prediction)"
            )
        self.zero_terminal_snr = bool(zero_terminal_snr)
        if timestep_spacing not in ("uniform", "karras"):
            raise ValueError(
                f"Unknown timestep spacing: {timestep_spacing!r} "
                "(expected 'uniform' or 'karras')"
            )
        self.timestep_spacing = timestep_spacing
        self.karras_rho = float(karras_rho)
        self.guidance_rescale = base.validate_guidance_rescale(guidance_rescale)
        # False for unbounded prediction spaces (latent diffusion)
        self.clip_sample = bool(clip_sample)
        self.cfg_interval = base.validate_cfg_interval(
            cfg_interval, num_timesteps
        )
        self.sde = bool(sde)
        self.schedule = NoiseSchedule.create(
            num_timesteps, beta_start, beta_end, beta_schedule,
            zero_terminal_snr=zero_terminal_snr,
        )
        self._setup_inference_timesteps()

    def _pair_fn(self, model_fn):
        """(eps, x0) view of the model under this parameterization."""
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
        fn = self._pair_fn(model_fn)
        return _solve(
            self.schedule, fn, img, self.inference_timesteps, y, cfg_scale,
            rng if self.sde else None,
            use_cfg=use_cfg, p_threshold=p_threshold,
            clip_denoised=clip_denoised,
            guidance_rescale=self.guidance_rescale,
            cfg_interval=self.cfg_interval,
            sde=self.sde,
            return_all_timesteps=return_all_timesteps,
        )

    def sample(self, model_fn, shape, rng, y=None, return_all_timesteps=False,
               init_noise=None, progress=False):
        return self._run(
            model_fn, shape, rng, y, jnp.float32(0.0), init_noise,
            use_cfg=False, p_threshold=None,
            clip_denoised=self.clip_sample,
            return_all_timesteps=return_all_timesteps, progress=progress,
            desc=("SDE-" if self.sde else "") + "DPM-Solver++ Sampling",
        )

    def sample_with_cfg(
        self,
        model_fn,
        shape,
        y,
        rng,
        cfg_scale: float = 3.0,
        p_threshold=base.AUTO_THRESHOLD,
        return_all_timesteps: bool = False,
        init_noise=None,
        progress: bool = False,
    ):
        if y is None:
            raise ValueError("CFG sampling requires class labels y.")
        p_threshold = base.resolve_p_threshold(p_threshold, self.clip_sample)
        return self._run(
            model_fn, shape, rng, jnp.asarray(y), jnp.float32(cfg_scale),
            init_noise, use_cfg=True, p_threshold=p_threshold,
            clip_denoised=self.clip_sample,
            return_all_timesteps=return_all_timesteps,
            progress=progress,
            desc=("SDE-" if self.sde else "")
            + f"DPM-Solver++ sampling with CFG scale {cfg_scale}",
        )
