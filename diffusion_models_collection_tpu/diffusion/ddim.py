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
from typing import Optional

import jax
import jax.numpy as jnp

from . import base
from .schedule import NoiseSchedule, ddim_timesteps, extract, karras_timesteps


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
        "eta",
        "return_all_timesteps",
        "use_cfg",
        "p_threshold",
        "clip_denoised",
        "guidance_rescale",
        "cfg_interval",
    ),
)
def _scan_segment(
    schedule: NoiseSchedule,
    model_fn,
    img: jnp.ndarray,
    scan_ins,  # (idx, timesteps, t_next) arrays for this segment
    rng: jax.Array,
    y: Optional[jnp.ndarray],
    cfg_scale: jnp.ndarray,
    known=None,
    *,
    eta: float,
    use_cfg: bool,
    p_threshold: Optional[float],
    clip_denoised: bool,
    guidance_rescale: float = 0.0,
    cfg_interval=None,
    return_all_timesteps: bool,
):
    """A segment of the DDIM trajectory (parity: ddim.py:210-346);
    segments exist only for host progress reporting — RNG folds the
    global position index, so boundaries don't affect trajectories.
    `known = (known_x0, mask)` enables inpainting projection after each
    update (None keeps the pytree structure, hence the compiled program,
    identical to the plain sampler)."""
    from .ddpm import _project_known

    batch = img.shape[0]

    def step(carry, scan_in):
        img = carry
        i, t_scalar, t_next_scalar = scan_in
        t = jnp.full((batch,), t_scalar, dtype=jnp.int32)
        t_next = jnp.full((batch,), t_next_scalar, dtype=jnp.int32)
        if use_cfg:
            eps, x0 = base.cfg_eps_x0(
                model_fn, img, t, y, cfg_scale,
                guidance_rescale=guidance_rescale, schedule=schedule,
                cfg_interval=cfg_interval,
            )
            x0 = base.constrain_x0(x0, p_threshold, clip_denoised)
        else:
            eps, x0 = model_fn(img, t, y)
            if clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
        noise = (
            jax.random.normal(jax.random.fold_in(rng, i), img.shape, img.dtype)
            if eta > 0
            else None
        )
        img = ddim_step(schedule, img, t, t_next, eps, x0, eta, noise)
        if known is not None:
            img = _project_known(
                schedule, img, t_next, known, rng, i + 1_000_000
            )
        return img, (img if return_all_timesteps else None)

    return jax.lax.scan(step, img, scan_ins)


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
        self.eta = float(eta)
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
        """Update the inference step count (parity: ddim.py:348-351)."""
        self.num_inference_steps = num_inference_steps
        self._setup_inference_timesteps()

    # -- training-side API ---------------------------------------------------
    def q_sample(self, x_start, t, noise):
        return base.q_sample(self.schedule, x_start, t, noise)

    def p_losses(self, model_fn, x_start, t, noise, y=None, loss_type="l2"):
        return base.p_losses(
            self.schedule, model_fn, x_start, t, noise, y=y,
            loss_type=loss_type, prediction_type=self.prediction_type,
            weighting=self.loss_weighting, snr_gamma=self.min_snr_gamma,
        )

    # -- single-step API (parity: ddim.py:154-208) ----------------------------
    def p_sample(self, model_fn, x, t, t_next, rng=None, y=None,
                 clip_denoised=True, eps=None, x0_pred=None):
        if eps is None:
            eps, pair_x0 = self._pair_fn(model_fn)(x, t, y)
            if x0_pred is None:
                x0_pred = pair_x0
        if x0_pred is None:
            x0_pred = base.predict_x0_from_eps(self.schedule, x, t, eps)
        if clip_denoised:
            x0_pred = jnp.clip(x0_pred, -1.0, 1.0)
        noise = (
            jax.random.normal(rng, x.shape, x.dtype) if self.eta > 0 else None
        )
        return ddim_step(self.schedule, x, t, t_next, eps, x0_pred, self.eta, noise)

    # -- whole-trajectory samplers --------------------------------------------
    def _run(self, model_fn, shape, rng, y, cfg_scale, init_noise, *, eta,
             use_cfg, p_threshold, clip_denoised, return_all_timesteps,
             progress, desc, timesteps=None, start_img=None, known=None):
        from .ddpm import _run_segments  # shared progress segmentation

        rng, init_rng = jax.random.split(rng)
        if start_img is not None:
            img = start_img
        else:
            img = (
                init_noise
                if init_noise is not None
                else jax.random.normal(init_rng, tuple(shape), dtype=jnp.float32)
            )
        if timesteps is None:
            timesteps = self.inference_timesteps
        t_next_seq = jnp.concatenate(
            [timesteps[1:], jnp.full((1,), -1, dtype=timesteps.dtype)]
        )
        idx = jnp.arange(timesteps.shape[0])
        fn = self._pair_fn(model_fn)

        # Stack scan inputs so the shared segment runner can slice them
        # along axis 0 together.
        packed = jnp.stack(
            [idx.astype(jnp.int32), timesteps.astype(jnp.int32),
             t_next_seq.astype(jnp.int32)],
            axis=1,
        )

        def segment(img, packed_seg):
            scan_ins = (
                packed_seg[:, 0], packed_seg[:, 1], packed_seg[:, 2]
            )
            return _scan_segment(
                self.schedule, fn, img, scan_ins, rng, y, cfg_scale, known,
                eta=eta, use_cfg=use_cfg, p_threshold=p_threshold,
                clip_denoised=clip_denoised,
                guidance_rescale=self.guidance_rescale,
                cfg_interval=self.cfg_interval,
                return_all_timesteps=return_all_timesteps,
            )

        return _run_segments(
            segment, img, packed, return_all_timesteps, progress, desc
        )

    def sample(self, model_fn, shape, rng, y=None, return_all_timesteps=False,
               init_noise=None, progress=False):
        return self._run(
            model_fn, shape, rng, y, jnp.float32(0.0), init_noise,
            eta=self.eta, use_cfg=False, p_threshold=None,
            clip_denoised=self.clip_sample,
            return_all_timesteps=return_all_timesteps, progress=progress,
            desc="DDIM Sampling",
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
            init_noise, eta=self.eta, use_cfg=True, p_threshold=p_threshold,
            clip_denoised=self.clip_sample,
            return_all_timesteps=return_all_timesteps,
            progress=progress,
            desc=f"DDIM sampling with CFG scale {cfg_scale}",
        )

    def invert(
        self,
        model_fn,
        images,
        y=None,
        num_steps: Optional[int] = None,
        progress: bool = False,
    ):
        """DDIM inversion (extension): run the deterministic update with
        the grid ASCENDING, mapping a clean image to the noise latent
        whose forward DDIM trajectory reproduces it (exactly in the
        continuum limit; O(1/S) discretization error at S steps). The
        basis of prompt/label-preserving editing: `sample(init_noise=
        invert(x))` returns ~x. Unguided or conditional (y passed to the
        model directly — CFG is intentionally not applied: guided
        inversion diverges from the guided sampling trajectory).
        eta must be 0 (the stochastic update has no deterministic
        inverse)."""
        if self.eta != 0.0:
            raise ValueError("DDIM inversion requires eta = 0")
        images = jnp.asarray(images, jnp.float32)
        if num_steps is None:
            grid = self.inference_timesteps
        else:
            grid = ddim_timesteps(self.num_timesteps, int(num_steps))
        # ascending pairs (t_i -> t_{i+1}); the first move leaves t = -1
        # ("clean") through the model evaluated at the smallest grid t,
        # mirroring the last step of sampling in reverse
        asc = grid[::-1]
        t_from = jnp.concatenate(
            [jnp.full((1,), -1, asc.dtype), asc[:-1]]
        )
        # ddim_step reads alpha at `t` (clip to 0: alpha_bar[0] ~ 1 is
        # the t = -1 convention) and targets alpha at t_next
        packed = jnp.stack(
            [jnp.arange(asc.shape[0], dtype=jnp.int32),
             jnp.clip(t_from, 0).astype(jnp.int32),
             asc.astype(jnp.int32)],
            axis=1,
        )
        fn = self._pair_fn(model_fn)
        rng = jax.random.PRNGKey(0)  # eta = 0: never used

        def segment(img, packed_seg):
            scan_ins = (
                packed_seg[:, 0], packed_seg[:, 1], packed_seg[:, 2]
            )
            return _scan_segment(
                self.schedule, fn, img, scan_ins, rng, y,
                jnp.float32(0.0), None,
                eta=0.0, use_cfg=False, p_threshold=None,
                clip_denoised=False,  # inversion must not bend x0
                return_all_timesteps=False,
            )

        from .ddpm import _run_segments

        return _run_segments(
            segment, images, packed, False, progress, "DDIM inversion"
        )

    def sample_restart(
        self,
        model_fn,
        shape,
        rng,
        y=None,
        cfg_scale: Optional[float] = None,
        restart_interval=(1, 300),
        restarts: int = 2,
        p_threshold=base.AUTO_THRESHOLD,
        init_noise=None,
        return_all_timesteps: bool = False,
        progress: bool = False,
    ):
        """Restart Sampling (extension — Xu et al. 2023 "Restart Sampling
        for Improving Generative Processes"): deterministic DDIM (ODE)
        integration with K large noise re-injections inside a
        [t_min, t_max] timestep interval — after the ODE first reaches
        the interval's bottom, the state is renoised back to the top
        (one forward-marginal hop; the forward process is
        Markov-Gaussian) and the interval re-integrated, `restarts`
        times, then the ODE continues to 0. The repeated
        contract-and-expand cycles shrink accumulated discretization +
        approximation error faster than either pure ODE (no noise) or
        SDE (small noise) sampling.

        `restart_interval` is a (t_min, t_max) pair on the TRAINING
        timestep axis (like `cfg_interval`); the interval must contain
        at least two inference-grid points. `restarts=0` is bit-exact
        plain DDIM sampling. Requires eta = 0 (the ODE regime the paper
        restarts).
        """
        import numpy as np

        if self.eta != 0.0:
            raise ValueError(
                "restart sampling re-injects noise itself — it requires "
                "the deterministic eta = 0 DDIM ODE between restarts"
            )
        restarts = int(restarts)
        if restarts < 0:
            raise ValueError("restarts must be >= 0")
        t_min, t_max = (int(v) for v in restart_interval)
        if not (0 <= t_min < t_max < self.num_timesteps):
            raise ValueError(
                f"restart_interval must satisfy 0 <= t_min < t_max < "
                f"{self.num_timesteps}, got ({t_min}, {t_max})"
            )
        use_cfg = cfg_scale is not None
        if use_cfg and y is None:
            raise ValueError("CFG restart sampling requires labels y.")
        p_resolved = (
            base.resolve_p_threshold(p_threshold, self.clip_sample)
            if use_cfg else None
        )

        grid = np.asarray(self.inference_timesteps)
        # i_hi: first grid index inside the interval (top); i_bot: index
        # of the LAST grid point still >= t_min (the interval's bottom)
        inside = np.nonzero((grid <= t_max) & (grid >= t_min))[0]
        if restarts > 0 and inside.size < 2:
            raise ValueError(
                f"restart_interval ({t_min}, {t_max}) contains "
                f"{inside.size} inference-grid point(s); need >= 2 "
                "(widen the interval or raise num_inference_steps)"
            )
        from .ddpm import _run_segments

        rng, init_rng = jax.random.split(rng)
        img = (
            init_noise if init_noise is not None
            else jax.random.normal(init_rng, tuple(shape), jnp.float32)
        )
        t_next_full = np.concatenate([grid[1:], [-1]])
        fn = self._pair_fn(model_fn)
        scale = jnp.float32(cfg_scale if use_cfg else 0.0)
        yj = jnp.asarray(y) if y is not None else None

        def run_slice(img, a, b, outs):
            """Integrate grid pairs [a, b) (ends AT grid point b, or -1
            past the end)."""
            if a >= b:
                return img
            packed = jnp.stack([
                jnp.arange(a, b, dtype=jnp.int32),
                jnp.asarray(grid[a:b], jnp.int32),
                jnp.asarray(t_next_full[a:b], jnp.int32),
            ], axis=1)

            def segment(img, packed_seg):
                scan_ins = (
                    packed_seg[:, 0], packed_seg[:, 1], packed_seg[:, 2]
                )
                return _scan_segment(
                    self.schedule, fn, img, scan_ins, rng, yj, scale,
                    None, eta=0.0, use_cfg=use_cfg,
                    p_threshold=p_resolved,
                    clip_denoised=self.clip_sample,
                    guidance_rescale=self.guidance_rescale,
                    cfg_interval=self.cfg_interval,
                    return_all_timesteps=return_all_timesteps,
                )

            out = _run_segments(
                segment, img, packed, return_all_timesteps, False, ""
            )
            if return_all_timesteps:
                outs.append(out)
                return out[-1]
            return out

        outs = []
        if restarts == 0 or inside.size < 2:
            img = run_slice(img, 0, len(grid), outs)
        else:
            i_hi, i_bot = int(inside[0]), int(inside[-1])
            acp = self.schedule.alphas_cumprod
            img = run_slice(img, 0, i_bot, outs)  # down to grid[i_bot]
            for k in range(restarts):
                # forward-marginal hop grid[i_bot] -> grid[i_hi]
                ratio = acp[int(grid[i_hi])] / acp[int(grid[i_bot])]
                noise = jax.random.normal(
                    jax.random.fold_in(rng, 7_000_000 + k),
                    img.shape, img.dtype,
                )
                img = (jnp.sqrt(ratio) * img
                       + jnp.sqrt(1.0 - ratio) * noise)
                img = run_slice(img, i_hi, i_bot, outs)  # re-integrate
                if progress:
                    jax.block_until_ready(img)
                    print(f"Restart {k + 1}/{restarts} done", flush=True)
            img = run_slice(img, i_bot, len(grid), outs)  # to clean
        if return_all_timesteps:
            return jnp.concatenate(outs, axis=0)
        return img

    def img2img(
        self,
        model_fn,
        init_image,
        rng,
        strength: float = 0.8,
        y=None,
        cfg_scale: Optional[float] = None,
        p_threshold=base.AUTO_THRESHOLD,
        mask=None,
        return_all_timesteps: bool = False,
        progress: bool = False,
    ):
        """SDEdit image-to-image + optional inpainting on the DDIM grid
        (extension; see DDPM.img2img for semantics).

        Uses the inference grid truncated to timesteps <= round(strength
        * (T-1)) and forward-noises the input to the first kept grid
        point, so `--num_inference_steps` controls cost exactly as in
        plain sampling (an S-step grid runs ~strength*S steps).
        """
        import numpy as np

        if not (0.0 <= float(strength) <= 1.0):
            raise ValueError("strength must be in [0, 1]")
        init_image = jnp.asarray(init_image, jnp.float32)
        known = None
        if mask is not None:
            mask_b = jnp.broadcast_to(
                jnp.asarray(mask, jnp.float32), init_image.shape
            )
            known = (init_image, mask_b)
        t0 = int(round(float(strength) * (self.num_timesteps - 1)))
        if t0 <= 0 and known is None:
            return init_image
        grid = np.asarray(self.inference_timesteps)
        sub = grid[grid <= t0]
        if sub.size == 0:
            return init_image
        rng, noise_rng = jax.random.split(rng)
        t_start = jnp.full((init_image.shape[0],), int(sub[0]), jnp.int32)
        start_img = self.q_sample(
            init_image, t_start,
            jax.random.normal(noise_rng, init_image.shape, jnp.float32),
        ) if int(sub[0]) > 0 else init_image
        use_cfg = cfg_scale is not None
        if use_cfg and y is None:
            raise ValueError("CFG img2img requires class labels y.")
        return self._run(
            model_fn, init_image.shape, rng,
            jnp.asarray(y) if use_cfg else y,
            jnp.float32(cfg_scale if use_cfg else 0.0), None,
            eta=self.eta, use_cfg=use_cfg,
            p_threshold=(
                base.resolve_p_threshold(p_threshold, self.clip_sample)
                if use_cfg else None
            ),
            clip_denoised=self.clip_sample,
            return_all_timesteps=return_all_timesteps, progress=progress,
            desc=f"DDIM img2img (strength {strength})",
            timesteps=jnp.asarray(sub, jnp.int32), start_img=start_img,
            known=known,
        )
