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
from typing import Optional

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


def _project_known(schedule, img, t_next, known, rng, fold):
    """Inpainting projection (RePaint-style single pass): outside the
    mask, overwrite with the forward-noised known image at the step we
    just arrived at (t_next = -1 on the final step -> the clean image).
    `known = (known_x0, mask)`, mask 1 = generate, 0 = keep."""
    known_x0, mask = known
    noise = jax.random.normal(
        jax.random.fold_in(rng, fold), img.shape, img.dtype
    )
    keep_t = jnp.clip(t_next, 0)
    x_known = base.q_sample(schedule, known_x0, keep_t, noise)
    x_known = jnp.where(
        (t_next >= 0).reshape(-1, *((1,) * (img.ndim - 1))),
        x_known, known_x0,
    )
    return mask * img + (1.0 - mask) * x_known


@functools.partial(
    jax.jit,
    static_argnames=("return_all_timesteps", "clip_denoised"),
)
def _scan_segment(
    schedule: NoiseSchedule,
    model_fn,
    img: jnp.ndarray,
    ts: jnp.ndarray,
    rng: jax.Array,
    y: Optional[jnp.ndarray],
    known=None,
    *,
    return_all_timesteps: bool,
    clip_denoised: bool = True,
):
    """Scan a segment of descending timesteps (parity: ddpm.py:222-252).
    Segmentation exists only to surface host-side progress (the tqdm
    analog); per-step RNG folds the timestep value, so trajectories are
    identical regardless of segment boundaries. `known` (inpainting)
    changes the pytree structure, so the no-inpaint path compiles
    byte-identically to before."""
    batch = img.shape[0]

    def step(carry, i):
        img = carry
        t = jnp.full((batch,), i, dtype=jnp.int32)
        _, x0 = model_fn(img, t, y)  # (eps, x0) pair; DDPM needs x0 only
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        noise = jax.random.normal(jax.random.fold_in(rng, i), img.shape, img.dtype)
        img = posterior_step(schedule, img, t, x0, noise)
        if known is not None:
            img = _project_known(schedule, img, t - 1, known, rng, i + 1_000_000)
        return img, (img if return_all_timesteps else None)

    return jax.lax.scan(step, img, ts)


@functools.partial(
    jax.jit,
    static_argnames=("p_threshold", "guidance_rescale", "clip_denoised",
                     "cfg_interval", "return_all_timesteps"),
)
def _scan_segment_cfg(
    schedule: NoiseSchedule,
    model_fn,
    img: jnp.ndarray,
    ts: jnp.ndarray,
    rng: jax.Array,
    y: jnp.ndarray,
    cfg_scale: jnp.ndarray,
    known=None,
    *,
    p_threshold: Optional[float],
    guidance_rescale: float = 0.0,
    clip_denoised: bool = True,
    cfg_interval=None,
    return_all_timesteps: bool,
):
    """CFG + dynamic-thresholding segment (parity: ddpm.py:254-332)."""
    batch = img.shape[0]

    def step(carry, i):
        img = carry
        t = jnp.full((batch,), i, dtype=jnp.int32)
        _, x0 = base.cfg_eps_x0(
            model_fn, img, t, y, cfg_scale,
            guidance_rescale=guidance_rescale, schedule=schedule,
            cfg_interval=cfg_interval,
        )
        x0 = base.constrain_x0(x0, p_threshold, clip_denoised)
        noise = jax.random.normal(jax.random.fold_in(rng, i), img.shape, img.dtype)
        img = posterior_step(schedule, img, t, x0, noise)
        if known is not None:
            img = _project_known(schedule, img, t - 1, known, rng, i + 1_000_000)
        return img, (img if return_all_timesteps else None)

    return jax.lax.scan(step, img, ts)


# Very long single-program scans (e.g. DDPM-1000 over a 12-layer Pallas
# backbone = 12k kernel invocations in one XLA program) have crashed the
# TPU runtime; cap steps per compiled segment. Segmentation never changes
# trajectories (per-step RNG folds global indices).
_MAX_STEPS_PER_SEGMENT = 250


def _segment_starts(total: int, progress: bool):
    """Segment sizes: ~10 equal segments for progress mode, else whole
    trajectory capped at _MAX_STEPS_PER_SEGMENT per compiled program
    (at most two distinct compiled shapes)."""
    if total < 2:
        return [total]
    if progress:
        for k in range(min(10, total), 0, -1):
            if total % k == 0:
                return [total // k] * k
        return [total]
    if total <= _MAX_STEPS_PER_SEGMENT:
        return [total]
    n_full, rem = divmod(total, _MAX_STEPS_PER_SEGMENT)
    return [_MAX_STEPS_PER_SEGMENT] * n_full + ([rem] if rem else [])


def _run_segments(segment_fn, img, ts, return_all_timesteps, progress,
                  desc: str):
    sizes = _segment_starts(int(ts.shape[0]), progress)
    outs = []
    done = 0
    for size in sizes:
        img, all_imgs = segment_fn(img, ts[done : done + size])
        if return_all_timesteps:
            outs.append(all_imgs)
        done += size
        if progress and len(sizes) > 1:
            jax.block_until_ready(img)
            print(f"{desc}: step {done}/{int(ts.shape[0])}", flush=True)
    if return_all_timesteps:
        return jnp.concatenate(outs, axis=0)
    return img


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
        prediction_type: str = "eps",
        loss_weighting: str = "uniform",
        min_snr_gamma: float = 5.0,
        zero_terminal_snr: bool = False,
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
        # extension: CFG contrast rescale (Lin et al. 2023 §3.4); static
        # per-process so phi=0 keeps the compiled programs byte-identical
        self.guidance_rescale = base.validate_guidance_rescale(guidance_rescale)
        # False for unbounded prediction spaces (latent diffusion): the
        # pixel [-1, 1] clamp / dynamic thresholding would corrupt latents
        self.clip_sample = bool(clip_sample)
        # extension: guidance limited to a (t_lo, t_hi) noise interval
        # (Kynkaanniemi et al. 2024); None = guide everywhere (parity)
        self.cfg_interval = base.validate_cfg_interval(
            cfg_interval, num_timesteps
        )
        self.schedule = NoiseSchedule.create(
            num_timesteps, beta_start, beta_end, beta_schedule,
            zero_terminal_snr=zero_terminal_snr,
        )

    def _pair_fn(self, model_fn):
        """(eps, x0) view of the model under this parameterization."""
        return base.wrap_model_as_eps_x0(
            self.schedule, model_fn, self.prediction_type
        )

    # -- training-side API -------------------------------------------------
    def q_sample(self, x_start, t, noise):
        return base.q_sample(self.schedule, x_start, t, noise)

    def p_losses(self, model_fn, x_start, t, noise, y=None, loss_type="l2"):
        return base.p_losses(
            self.schedule, model_fn, x_start, t, noise, y=y,
            loss_type=loss_type, prediction_type=self.prediction_type,
            weighting=self.loss_weighting, snr_gamma=self.min_snr_gamma,
        )

    # -- single-step API (parity: ddpm.py:197-220) --------------------------
    def p_sample(self, model_fn, x, t, rng, y=None, clip_denoised=True, eps=None,
                 x0_pred=None):
        if x0_pred is None:
            if eps is None:
                _, x0_pred = self._pair_fn(model_fn)(x, t, y)
            else:
                x0_pred = base.predict_x0_from_eps(self.schedule, x, t, eps)
        if clip_denoised:
            x0_pred = jnp.clip(x0_pred, -1.0, 1.0)
        noise = jax.random.normal(rng, x.shape, x.dtype)
        return posterior_step(self.schedule, x, t, x0_pred, noise)

    def _initial_image(self, shape, rng, init_noise):
        """Split rng exactly as the jitted impl used to — trajectories are
        bit-identical to the pre-refactor single-scan version."""
        rng, init_rng = jax.random.split(rng)
        img = (
            init_noise
            if init_noise is not None
            else jax.random.normal(init_rng, tuple(shape), dtype=jnp.float32)
        )
        return img, rng

    # -- whole-trajectory samplers ------------------------------------------
    def sample(self, model_fn, shape, rng, y=None, return_all_timesteps=False,
               init_noise=None, progress=False):
        """Generate samples; jit-compiled scan(s) over all T steps.

        `progress=True` runs in ~10 equal segments with a host progress
        line between them (the tqdm analog at reference ddpm.py:243);
        trajectories are identical either way.
        """
        img, rng = self._initial_image(shape, rng, init_noise)
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        fn = self._pair_fn(model_fn)

        def segment(img, ts_seg):
            return _scan_segment(
                self.schedule, fn, img, ts_seg, rng, y,
                return_all_timesteps=return_all_timesteps,
                clip_denoised=self.clip_sample,
            )

        return _run_segments(
            segment, img, ts, return_all_timesteps, progress, "Sampling"
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
        """CFG sampling (parity: ddpm.py:254-332). `cfg_scale` is dynamic —
        changing it does not retrigger compilation. `p_threshold` defaults
        to 0.995 in pixel space and None under clip_sample=False (latent)."""
        if y is None:
            raise ValueError("CFG sampling requires class labels y.")
        p_threshold = base.resolve_p_threshold(p_threshold, self.clip_sample)
        img, rng = self._initial_image(shape, rng, init_noise)
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        fn = self._pair_fn(model_fn)
        y = jnp.asarray(y)
        scale = jnp.float32(cfg_scale)

        def segment(img, ts_seg):
            return _scan_segment_cfg(
                self.schedule, fn, img, ts_seg, rng, y, scale,
                p_threshold=p_threshold,
                guidance_rescale=self.guidance_rescale,
                clip_denoised=self.clip_sample,
                cfg_interval=self.cfg_interval,
                return_all_timesteps=return_all_timesteps,
            )

        return _run_segments(
            segment, img, ts, return_all_timesteps, progress,
            f"DDPM Sampling with CFG scale {cfg_scale}",
        )

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
        repaint_jump: int = 0,
        repaint_resample: int = 1,
        return_all_timesteps: bool = False,
        progress: bool = False,
    ):
        """SDEdit image-to-image + optional inpainting (extension; the
        reference samples from pure noise only).

        Forward-noises `init_image` to t0 = round(strength * (T-1)) and
        denoises from there: strength 1.0 ~ a fresh sample, 0.0 returns
        the input. `mask` (1 = regenerate, 0 = keep; broadcastable to the
        image shape) enables inpainting — after every ancestral step the
        kept pixels are re-imposed as the forward-noised original
        (RePaint single-pass projection), ending exactly at the original
        values. `cfg_scale=None` runs unguided; a float runs fused-batch
        CFG (requires labels y).

        `repaint_resample > 1` (with `repaint_jump = j >= 1`) enables
        RePaint's full resampling schedule (Lugmayr et al. 2022 Alg. 2):
        after every j denoising steps the image is renoised j levels back
        up (one-shot — the forward process is Markov-Gaussian, so the
        composed j-step kernel equals its marginal) and the j steps rerun,
        `repaint_resample` times total, harmonizing the inpainted region
        with the kept pixels. Requires a mask.
        """
        if not (0.0 <= float(strength) <= 1.0):
            raise ValueError("strength must be in [0, 1]")
        repaint_jump = int(repaint_jump)
        repaint_resample = int(repaint_resample)
        if repaint_resample < 1:
            raise ValueError("repaint_resample must be >= 1")
        if repaint_resample > 1:
            if mask is None:
                raise ValueError(
                    "repaint_resample > 1 is the RePaint inpainting "
                    "schedule — it requires a mask"
                )
            if repaint_jump < 1:
                raise ValueError(
                    "repaint_resample > 1 requires repaint_jump >= 1 "
                    "(the jump length j in RePaint Alg. 2)"
                )
        init_image = jnp.asarray(init_image, jnp.float32)
        known = None
        if mask is not None:
            mask = jnp.broadcast_to(
                jnp.asarray(mask, jnp.float32), init_image.shape
            )
            known = (init_image, mask)
        t0 = int(round(float(strength) * (self.num_timesteps - 1)))
        if t0 <= 0 and known is None:
            return init_image
        rng, noise_rng = jax.random.split(rng)
        t_batch = jnp.full((init_image.shape[0],), t0, jnp.int32)
        img = self.q_sample(
            init_image, t_batch,
            jax.random.normal(noise_rng, init_image.shape, jnp.float32),
        ) if t0 > 0 else init_image
        ts = jnp.arange(t0, -1, -1)
        fn = self._pair_fn(model_fn)

        if cfg_scale is None:
            def segment(img, ts_seg, seg_rng=rng):
                return _scan_segment(
                    self.schedule, fn, img, ts_seg, seg_rng, y, known,
                    return_all_timesteps=return_all_timesteps,
                    clip_denoised=self.clip_sample,
                )
            desc = f"DDPM img2img (strength {strength})"
        else:
            if y is None:
                raise ValueError("CFG img2img requires class labels y.")
            yj = jnp.asarray(y)
            scale = jnp.float32(cfg_scale)
            p_resolved = base.resolve_p_threshold(
                p_threshold, self.clip_sample
            )

            def segment(img, ts_seg, seg_rng=rng):
                return _scan_segment_cfg(
                    self.schedule, fn, img, ts_seg, seg_rng, yj, scale,
                    known,
                    p_threshold=p_resolved,
                    guidance_rescale=self.guidance_rescale,
                    clip_denoised=self.clip_sample,
                    cfg_interval=self.cfg_interval,
                    return_all_timesteps=return_all_timesteps,
                )
            desc = f"DDPM img2img CFG {cfg_scale} (strength {strength})"

        if repaint_resample > 1:
            return self._run_repaint(
                segment, img, ts, rng,
                jump=repaint_jump, resample=repaint_resample,
                return_all_timesteps=return_all_timesteps,
                progress=progress, desc=desc + " [RePaint]",
            )
        return _run_segments(
            segment, img, ts, return_all_timesteps, progress, desc
        )

    def _renoise(self, img, t_lo: int, t_hi: int, rng, fold: int):
        """One-shot forward hop x_{t_lo} -> x_{t_hi} (t_lo may be -1 =
        clean). The forward process is Markov-Gaussian, so the composed
        per-step kernel equals this marginal: x_hi = sqrt(acp_hi/acp_lo)
        * x_lo + sqrt(1 - acp_hi/acp_lo) * eps."""
        acp = self.schedule.alphas_cumprod
        a_hi = acp[t_hi]
        a_lo = jnp.float32(1.0) if t_lo < 0 else acp[t_lo]
        ratio = a_hi / a_lo
        noise = jax.random.normal(
            jax.random.fold_in(rng, 3_000_000 + fold), img.shape, img.dtype
        )
        return jnp.sqrt(ratio) * img + jnp.sqrt(1.0 - ratio) * noise

    def _run_repaint(self, segment, img, ts, rng, *, jump, resample,
                     return_all_timesteps, progress, desc):
        """RePaint resampling driver: denoise j steps, renoise j levels,
        repeat `resample` times, then advance (Lugmayr et al. 2022
        Alg. 2). Per-repeat RNG offsets decorrelate the reruns; chunks
        reuse the compiled segment scans (at most two distinct shapes)."""
        total = int(ts.shape[0])
        outs = []
        pos = 0
        hop = 0
        while pos < total:
            size = min(jump, total - pos)
            chunk = ts[pos : pos + size]
            for rep in range(resample):
                seg_rng = jax.random.fold_in(rng, 5_000_000 + hop)
                hop += 1
                # honor the per-program scan cap for very large jumps
                # (same TPU program-size limit as _run_segments)
                for sub in range(0, size, _MAX_STEPS_PER_SEGMENT):
                    img, all_imgs = segment(
                        img, chunk[sub : sub + _MAX_STEPS_PER_SEGMENT],
                        seg_rng,
                    )
                    if return_all_timesteps:
                        outs.append(all_imgs)
                if rep < resample - 1:
                    # back up from the level we arrived at (chunk[-1]-1,
                    # possibly -1 = clean) to the chunk's top level
                    img = self._renoise(
                        img, int(chunk[-1]) - 1, int(chunk[0]), rng, hop
                    )
                    hop += 1
            pos += size
            if progress:
                jax.block_until_ready(img)
                print(f"{desc}: step {pos}/{total}", flush=True)
        if return_all_timesteps:
            return jnp.concatenate(outs, axis=0)
        return img
