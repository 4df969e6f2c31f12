"""EDM (Karras et al. 2022, "Elucidating the Design Space of
Diffusion-Based Generative Models") — extension beyond the reference.

The reference ships the DDPM/DDIM VP formulation only (reference
`diffusion/__init__.py:6-9`); EDM is the VE-style design-space framing a
diffusion collection is expected to carry: network preconditioning,
log-normal sigma training, and the 2nd-order Heun sampler with optional
stochastic churn.

Math (sigma_data = s_d):
    preconditioning   D(y; sigma) = c_skip * y + c_out * F(c_in * y, t(sigma))
        c_skip = s_d^2 / (sigma^2 + s_d^2)
        c_out  = sigma * s_d / sqrt(sigma^2 + s_d^2)
        c_in   = 1 / sqrt(sigma^2 + s_d^2)
    training          y = x0 + sigma * n,  ln sigma ~ N(P_mean, P_std^2)
        loss = lambda(sigma) * ||D(y; sigma) - x0||^2,
        lambda = (sigma^2 + s_d^2) / (sigma * s_d)^2 = 1 / c_out^2
        (so the loss is exactly unit-weight in F-space — tested).
    sampling          Karras sigma grid (eq. 5) + Heun; optional churn
        (S_churn/S_min/S_max/S_noise) re-noises each step before the ODE
        move; S_churn = 0 is the deterministic sampler.

Discrete-time contract: the backbones embed a scalar "timestep" via
sinusoidal features tuned for [0, num_timesteps), so the network's noise
input t(sigma) maps ln sigma affinely onto that range
(t = (ln sigma - ln sigma_min)/(ln sigma_max - ln sigma_min) * (T-1) —
our design choice, equivalent to EDM's c_noise = ln(sigma)/4 up to the
affine reparameterization the embedding MLP absorbs). Training draws
integer t uniformly (trainer contract) and maps it through the log-normal
inverse CDF, giving a stratified draw of the paper's ln-normal sigma.

TPU-native: the trajectory is one jitted `lax.scan` (segmented only for
host progress, like DDPM); CFG guides D — already x0-space — with the
fused [cond; uncond] batch; `guidance_rescale` (Lin et al. 2023) applies
directly to D.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import base


def _t_of_sigma(sigma, sigma_min, sigma_max, num_timesteps):
    """Network noise-conditioning input for a given sigma (see module
    docstring); works on scalars or per-sample arrays."""
    lo, hi = math.log(sigma_min), math.log(sigma_max)
    return (jnp.log(sigma) - lo) / (hi - lo) * (num_timesteps - 1)


def _cfg_denoised(d_fn, x, sigma, y, cfg_scale, guidance_rescale):
    """Classifier-free guidance on the denoised prediction D (x0-space),
    fused [cond; uncond] batch; optional contrast rescale (Lin et al.
    2023 §3.4) applies directly since D already lives in x0 space."""
    x2 = jnp.concatenate([x, x], axis=0)
    s2 = jnp.concatenate([sigma, sigma], axis=0)
    y2 = jnp.concatenate([y, jnp.zeros_like(y)], axis=0)
    d2 = d_fn(x2, s2, y2)
    d_c, d_u = jnp.split(d2, 2, axis=0)
    d_g = d_u + cfg_scale * (d_c - d_u)
    if float(guidance_rescale) > 0.0:
        d_g = base.rescale_guided(d_g, d_c, guidance_rescale)
    return d_g


@functools.partial(
    jax.jit,
    static_argnames=(
        "use_cfg", "p_threshold", "clip_denoised", "guidance_rescale",
        "s_noise", "return_all_timesteps",
    ),
)
def _scan_segment(
    d_fn,
    img: jnp.ndarray,
    scan_ins,  # (idx i32, sigma f32, sigma_hat f32, sigma_next f32)
    rng: jax.Array,
    y: Optional[jnp.ndarray],
    cfg_scale: jnp.ndarray,
    known=None,  # (known_x0, mask): inpainting projection after each step
    *,
    use_cfg: bool,
    p_threshold: Optional[float],
    clip_denoised: bool,
    guidance_rescale: float = 0.0,
    s_noise: float = 1.0,
    return_all_timesteps: bool,
):
    """A segment of the EDM Heun trajectory (alg. 2 of the paper).

    sigma_hat = sigma * (1 + gamma) is precomputed host-side from the
    static grid; per-step churn RNG folds the global step index, so
    segment boundaries never change trajectories."""
    batch = img.shape[0]

    def denoise(x, sigma_scalar):
        sigma = jnp.full((batch,), sigma_scalar, jnp.float32)
        if use_cfg:
            d = _cfg_denoised(d_fn, x, sigma, y, cfg_scale, guidance_rescale)
            return base.constrain_x0(d, p_threshold, clip_denoised)
        d = d_fn(x, sigma, y)
        if clip_denoised:
            d = jnp.clip(d, -1.0, 1.0)
        return d

    def step(carry, scan_in):
        x = carry
        i, sigma, sigma_hat, sigma_next = scan_in
        # churn: lift sigma -> sigma_hat by adding matched noise
        churn_std = jnp.sqrt(jnp.clip(sigma_hat**2 - sigma**2, min=0.0))
        eps = jax.random.normal(jax.random.fold_in(rng, i), x.shape, x.dtype)
        x_hat = x + churn_std * jnp.float32(s_noise) * eps
        # Euler predictor from sigma_hat
        d1 = (x_hat - denoise(x_hat, sigma_hat)) / sigma_hat
        h = sigma_next - sigma_hat
        x_euler = x_hat + h * d1
        # Heun corrector, skipped on the final (sigma_next = 0) step
        # where D would be evaluated at sigma = 0 (alg. 2 line 9)
        sig_next_safe = jnp.maximum(sigma_next, 1e-12)
        d2 = (x_euler - denoise(x_euler, sig_next_safe)) / sig_next_safe
        x_heun = x_hat + h * 0.5 * (d1 + d2)
        x = jnp.where(sigma_next > 0.0, x_heun, x_euler)
        if known is not None:
            known_x0, mask = known
            noise_k = jax.random.normal(
                jax.random.fold_in(rng, i + 1_000_000), x.shape, x.dtype
            )
            x_known = known_x0 + sigma_next * noise_k
            x = mask * x + (1.0 - mask) * x_known
        return x, (x if return_all_timesteps else None)

    return jax.lax.scan(step, img, scan_ins)


class EDM:
    """EDM process with the DDPM/DDIM API surface.

    Drop-in for the trainer/CLIs/serving via `diffusion_type: 'edm'`:
    `q_sample` adds sigma(t)-scaled noise, `p_losses` is the
    preconditioned weighted denoising loss, `sample`/`sample_with_cfg`
    run Heun over the Karras grid (deterministic when s_churn = 0).
    """

    def __init__(
        self,
        num_timesteps: int = 1000,
        num_inference_steps: int = 18,
        sigma_data: float = 0.5,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        rho: float = 7.0,
        p_mean: float = -1.2,
        p_std: float = 1.2,
        s_churn: float = 0.0,
        s_min: float = 0.0,
        s_max: float = float("inf"),
        s_noise: float = 1.0,
        guidance_rescale: float = 0.0,
        clip_sample: bool = True,
    ):
        if num_timesteps < 2:
            raise ValueError("EDM needs num_timesteps >= 2")
        if not (0.0 < sigma_min < sigma_max):
            raise ValueError("need 0 < sigma_min < sigma_max")
        if sigma_data <= 0.0:
            raise ValueError("sigma_data must be positive")
        if s_churn < 0.0 or s_noise <= 0.0:
            raise ValueError("s_churn must be >= 0 and s_noise > 0")
        self.num_timesteps = int(num_timesteps)
        self.num_inference_steps = int(num_inference_steps)
        self.sigma_data = float(sigma_data)
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)
        self.rho = float(rho)
        self.p_mean = float(p_mean)
        self.p_std = float(p_std)
        self.s_churn = float(s_churn)
        self.s_min = float(s_min)
        self.s_max = float(s_max)
        self.s_noise = float(s_noise)
        self.guidance_rescale = base.validate_guidance_rescale(guidance_rescale)
        # False for unbounded prediction spaces (latent diffusion)
        self.clip_sample = bool(clip_sample)
        # the denoiser predicts x0 directly (D is x0-space)
        self.prediction_type = "edm_denoised"
        # preconditioning constants bound STATICALLY (functools.partial,
        # not Partial args — Partial args are pytree leaves and would be
        # traced); built once per instance so the callable identity is
        # stable across sampler calls (no retraces)
        self._precond = functools.partial(
            _denoiser_call,
            sigma_data=self.sigma_data,
            sigma_min=self.sigma_min,
            sigma_max=self.sigma_max,
            num_timesteps=self.num_timesteps,
        )
        self._setup_grid()

    # -- sigma machinery -----------------------------------------------------
    def sigma_of_t(self, t):
        """Stratified log-normal training sigma for integer t in [0, T):
        the inverse CDF of ln sigma ~ N(P_mean, P_std^2) evaluated at the
        bin centers u = (t + 1/2) / T — uniform t gives the paper's
        ln-normal sigma draw with per-batch stratification."""
        u = (t.astype(jnp.float32) + 0.5) / self.num_timesteps
        z = jax.scipy.special.ndtri(jnp.clip(u, 1e-7, 1.0 - 1e-7))
        return jnp.exp(self.p_mean + self.p_std * z)

    def _setup_grid(self):
        """Karras grid (eq. 5), host-side numpy, plus per-step churn
        lift sigma_hat = sigma * (1 + gamma) (alg. 2 line 5)."""
        n = self.num_inference_steps
        if n < 1:
            raise ValueError("num_inference_steps must be >= 1")
        i = np.arange(n, dtype=np.float64)
        inv = 1.0 / self.rho
        sig = (
            self.sigma_max**inv
            + i / max(n - 1, 1) * (self.sigma_min**inv - self.sigma_max**inv)
        ) ** self.rho
        sig_next = np.concatenate([sig[1:], [0.0]])
        gamma = np.where(
            (sig >= self.s_min) & (sig <= self.s_max),
            min(self.s_churn / n, math.sqrt(2.0) - 1.0),
            0.0,
        )
        self.sigmas = jnp.asarray(sig, jnp.float32)
        self._scan_rows = (
            jnp.arange(n, dtype=jnp.int32),
            jnp.asarray(sig, jnp.float32),
            jnp.asarray(sig * (1.0 + gamma), jnp.float32),
            jnp.asarray(sig_next, jnp.float32),
        )

    def set_inference_steps(self, num_inference_steps: int):
        """Update the sampler step count (API parity with DDIM)."""
        self.num_inference_steps = int(num_inference_steps)
        self._setup_grid()

    # -- preconditioning -----------------------------------------------------
    def denoiser_fn(self, model_fn):
        """(x, sigma, y) -> D(x; sigma): the preconditioned denoiser view
        of a raw backbone F (same Partial identity-stability contract as
        `base.wrap_model_as_eps`, scoped to this EDM instance)."""
        return jax.tree_util.Partial(
            self._precond, base.as_pytree_fn(model_fn)
        )

    # -- training-side API ---------------------------------------------------
    def q_sample(self, x_start, t, noise):
        """Forward corruption y = x0 + sigma(t) * n (VE — no signal decay)."""
        s = self.sigma_of_t(t).reshape(-1, *((1,) * (x_start.ndim - 1)))
        return x_start + s * noise

    def p_losses(self, model_fn, x_start, t, noise, y=None, loss_type="l2"):
        """Preconditioned weighted denoising loss (eq. 8 of the paper);
        lambda(sigma) = 1/c_out^2 makes it unit-weight in F-space. For
        l1/huber (accepted for API parity) the same per-sample weight
        applies to the chosen metric."""
        sigma = self.sigma_of_t(t)
        x_noisy = self.q_sample(x_start, t, noise)
        d = self.denoiser_fn(model_fn)(x_noisy, sigma, y)
        lam = (sigma**2 + self.sigma_data**2) / (
            (sigma * self.sigma_data) ** 2
        )
        per_sample = base.per_sample_loss(x_start, d, loss_type)
        return jnp.mean(lam * per_sample)

    # -- whole-trajectory samplers --------------------------------------------
    def _run(self, model_fn, shape, rng, y, cfg_scale, init_noise, *,
             use_cfg, p_threshold, clip_denoised, return_all_timesteps,
             progress, desc, scan_rows=None, start_img=None, known=None):
        from .ddpm import _run_segments  # shared progress segmentation

        rng, init_rng = jax.random.split(rng)
        if scan_rows is None:
            scan_rows = self._scan_rows
        if start_img is not None:
            img = start_img
        else:
            # x_T ~ N(0, sigma_max^2); an explicit init_noise is unit
            # Gaussian by CLI convention and gets scaled here
            sigma0 = scan_rows[1][0]
            img = sigma0 * (
                init_noise
                if init_noise is not None
                else jax.random.normal(init_rng, tuple(shape), jnp.float32)
            )
        d_fn = self.denoiser_fn(model_fn)

        def segment(img, rows):
            return _scan_segment(
                d_fn, img, rows, rng, y, cfg_scale, known,
                use_cfg=use_cfg, p_threshold=p_threshold,
                clip_denoised=clip_denoised,
                guidance_rescale=self.guidance_rescale,
                s_noise=self.s_noise,
                return_all_timesteps=return_all_timesteps,
            )

        # _run_segments slices a single array along axis 0; pack the four
        # per-step columns into one (S, 4) float32 block (int index
        # round-trips exactly through f32 for any realistic step count)
        packed = jnp.stack(
            [scan_rows[0].astype(jnp.float32), scan_rows[1],
             scan_rows[2], scan_rows[3]],
            axis=1,
        )

        def seg_packed(img, rows):
            return segment(
                img,
                (rows[:, 0].astype(jnp.int32), rows[:, 1], rows[:, 2],
                 rows[:, 3]),
            )

        return _run_segments(
            seg_packed, img, packed, return_all_timesteps, progress, desc
        )

    def sample(self, model_fn, shape, rng, y=None, return_all_timesteps=False,
               init_noise=None, progress=False):
        return self._run(
            model_fn, shape, rng, y, jnp.float32(0.0), init_noise,
            use_cfg=False, p_threshold=None,
            clip_denoised=self.clip_sample,
            return_all_timesteps=return_all_timesteps, progress=progress,
            desc="EDM (Heun) sampling",
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
            desc=f"EDM (Heun) sampling with CFG scale {cfg_scale}",
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
        return_all_timesteps: bool = False,
        progress: bool = False,
    ):
        """SDEdit image-to-image + optional inpainting on the EDM grid
        (see DDPM.img2img for the shared semantics).

        `strength` selects the entry point on the Karras grid
        geometrically: sigma0 = sigma_min * (sigma_max/sigma_min)^strength
        (the grid is ~log-spaced, so cost scales roughly with strength);
        the input is corrupted to x + sigma0 * n and denoised from the
        first grid sigma <= sigma0.
        """
        if not (0.0 <= float(strength) <= 1.0):
            raise ValueError("strength must be in [0, 1]")
        init_image = jnp.asarray(init_image, jnp.float32)
        known = None
        if mask is not None:
            mask_b = jnp.broadcast_to(
                jnp.asarray(mask, jnp.float32), init_image.shape
            )
            known = (init_image, mask_b)
        if float(strength) <= 0.0 and known is None:
            return init_image
        sigma0 = self.sigma_min * (
            self.sigma_max / self.sigma_min
        ) ** float(strength)
        idx, sig, sig_hat, sig_next = self._scan_rows
        keep = np.asarray(sig) <= sigma0 + 1e-12
        if not keep.any():
            return init_image
        first = int(np.argmax(keep))
        rows = tuple(c[first:] for c in (idx, sig, sig_hat, sig_next))
        rng, noise_rng = jax.random.split(rng)
        start_img = init_image + float(np.asarray(sig)[first]) * (
            jax.random.normal(noise_rng, init_image.shape, jnp.float32)
        )
        use_cfg = cfg_scale is not None
        if use_cfg and y is None:
            raise ValueError("CFG img2img requires class labels y.")
        return self._run(
            model_fn, init_image.shape, rng,
            jnp.asarray(y) if use_cfg else y,
            jnp.float32(cfg_scale if use_cfg else 0.0), None,
            use_cfg=use_cfg,
            p_threshold=(
                base.resolve_p_threshold(p_threshold, self.clip_sample)
                if use_cfg else None
            ),
            clip_denoised=self.clip_sample,
            return_all_timesteps=return_all_timesteps, progress=progress,
            desc=f"EDM img2img (strength {strength})",
            scan_rows=rows, start_img=start_img, known=known,
        )


def _denoiser_call(inner, x, sigma, y=None, *, sigma_data, sigma_min,
                   sigma_max, num_timesteps):
    """Module-level body of `EDM.denoiser_fn` (stable Partial identity;
    the scalar constants are keyword-bound statics, not pytree leaves)."""
    s = sigma.reshape(-1, *((1,) * (x.ndim - 1)))
    sd2 = sigma_data**2
    denom = s**2 + sd2
    c_skip = sd2 / denom
    c_out = s * sigma_data / jnp.sqrt(denom)
    c_in = 1.0 / jnp.sqrt(denom)
    t_in = _t_of_sigma(sigma, sigma_min, sigma_max, num_timesteps)
    return c_skip * x + c_out * inner(c_in * x, t_in, y)
