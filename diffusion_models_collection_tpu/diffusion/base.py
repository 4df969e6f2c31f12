"""Shared diffusion-process pieces: losses, thresholding, forward noising.

Behavioral parity targets: reference `diffusion/ddpm.py:84-140` (q_sample,
p_losses) and `ddpm.py:306-314` / `ddim.py:319-327` (Imagen-style dynamic
thresholding). Everything here is a pure function of jnp arrays so it can
be traced once under `jax.jit` and fused by XLA.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .schedule import NoiseSchedule, extract

ModelFn = Callable[..., jnp.ndarray]  # model_fn(x, t, y) -> predicted eps

VALID_LOSS_TYPES = ("l1", "l2", "huber")

# What the network regresses. The reference is eps-only (ddpm.py:106-140);
# 'v' (Salimans & Ho 2022, progressive distillation) and 'x0' are
# extensions. All three are affine reparameterizations of each other at a
# given (x_t, t), so the samplers stay eps-based internally and convert.
VALID_PREDICTION_TYPES = ("eps", "v", "x0")

# SNR-based per-timestep loss weightings (extension; the reference trains
# unweighted eps-MSE only). See `loss_weight` for the exact semantics.
VALID_LOSS_WEIGHTINGS = ("uniform", "snr", "min_snr")


def as_pytree_fn(fn: Callable) -> Callable:
    """Wrap a plain callable so it can be passed through `jax.jit` boundaries.

    `jax.tree_util.Partial` makes the callable a pytree: closures over
    parameter pytrees stay dynamic (no retrace when weights change), while
    the code pointer is static.
    """
    if isinstance(fn, jax.tree_util.Partial):
        return fn
    return jax.tree_util.Partial(fn)


def q_sample(
    schedule: NoiseSchedule,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Forward diffusion q(x_t | x_0) (parity: reference ddpm.py:84-104)."""
    a = extract(schedule.sqrt_alphas_cumprod, t, x_start.ndim)
    b = extract(schedule.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
    return a * x_start + b * noise


def diffusion_loss(
    noise: jnp.ndarray, predicted_noise: jnp.ndarray, loss_type: str = "l2"
) -> jnp.ndarray:
    """Epsilon-prediction loss (parity: reference ddpm.py:131-138).

    'huber' matches torch smooth_l1_loss with beta=1.0.
    """
    diff = predicted_noise - noise
    if loss_type == "l1":
        return jnp.mean(jnp.abs(diff))
    if loss_type == "l2":
        return jnp.mean(diff**2)
    if loss_type == "huber":
        absd = jnp.abs(diff)
        return jnp.mean(jnp.where(absd < 1.0, 0.5 * diff**2, absd - 0.5))
    raise ValueError(
        f"Unknown loss type: {loss_type!r} (expected one of {VALID_LOSS_TYPES})"
    )


def per_sample_loss(
    target: jnp.ndarray, predicted: jnp.ndarray, loss_type: str = "l2"
) -> jnp.ndarray:
    """Per-sample reduction of `diffusion_loss`, shape (batch,).

    `mean(per_sample_loss(...)) == diffusion_loss(...)` exactly (samples
    all have the same element count), so weighting with uniform weights
    reproduces the unweighted loss bit-for-bit.
    """
    diff = predicted - target
    axes = tuple(range(1, diff.ndim))
    if loss_type == "l1":
        return jnp.mean(jnp.abs(diff), axis=axes)
    if loss_type == "l2":
        return jnp.mean(diff**2, axis=axes)
    if loss_type == "huber":
        absd = jnp.abs(diff)
        return jnp.mean(jnp.where(absd < 1.0, 0.5 * diff**2, absd - 0.5), axis=axes)
    raise ValueError(
        f"Unknown loss type: {loss_type!r} (expected one of {VALID_LOSS_TYPES})"
    )


def prediction_target(
    schedule: NoiseSchedule,
    x_start: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,
    prediction_type: str = "eps",
) -> jnp.ndarray:
    """The regression target for a given parameterization.

    eps: the noise itself (reference parity). x0: the clean image.
    v = sqrt(acp_t) * eps - sqrt(1 - acp_t) * x0 (Salimans & Ho 2022, eq. 11).
    """
    if prediction_type == "eps":
        return noise
    if prediction_type == "x0":
        return x_start
    if prediction_type == "v":
        a = extract(schedule.sqrt_alphas_cumprod, t, x_start.ndim)
        b = extract(schedule.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
        return a * noise - b * x_start
    raise ValueError(
        f"Unknown prediction type: {prediction_type!r} "
        f"(expected one of {VALID_PREDICTION_TYPES})"
    )


def eps_from_prediction(
    schedule: NoiseSchedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    out: jnp.ndarray,
    prediction_type: str,
) -> jnp.ndarray:
    """Convert a model output in any parameterization to epsilon.

    With x_t = a*x0 + b*eps (a = sqrt(acp_t), b = sqrt(1-acp_t)):
      v-pred:  eps = b*x_t + a*v        (inverse of the v definition)
      x0-pred: eps = (c1*x_t - x0)/c2   (inverse of predict_x0_from_eps)
    Both are affine in `out` at fixed (x_t, t), so CFG guidance commutes
    with this conversion — guiding raw outputs then converting equals
    converting both branches then guiding on eps.
    """
    if prediction_type == "eps":
        return out
    if prediction_type == "v":
        a = extract(schedule.sqrt_alphas_cumprod, t, x.ndim)
        b = extract(schedule.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        return b * x + a * out
    if prediction_type == "x0":
        c1 = extract(schedule.sqrt_recip_alphas_cumprod, t, x.ndim)
        c2 = extract(schedule.sqrt_recipm1_alphas_cumprod, t, x.ndim)
        return (c1 * x - out) / c2
    raise ValueError(
        f"Unknown prediction type: {prediction_type!r} "
        f"(expected one of {VALID_PREDICTION_TYPES})"
    )


def _eps_model_call_v(schedule, inner, x, t, y=None):
    return eps_from_prediction(schedule, x, t, inner(x, t, y), "v")


def _eps_model_call_x0(schedule, inner, x, t, y=None):
    return eps_from_prediction(schedule, x, t, inner(x, t, y), "x0")


def wrap_model_as_eps(
    schedule: NoiseSchedule, model_fn: ModelFn, prediction_type: str
) -> Callable:
    """An eps-space view of a model trained under any parameterization.

    Returns a `jax.tree_util.Partial` built from module-level functions so
    the callable's identity is stable across sampler calls (no retraces);
    the schedule and inner model ride through jit as pytree leaves.
    """
    fn = as_pytree_fn(model_fn)
    if prediction_type == "eps":
        return fn
    if prediction_type == "v":
        return jax.tree_util.Partial(_eps_model_call_v, schedule, fn)
    if prediction_type == "x0":
        return jax.tree_util.Partial(_eps_model_call_x0, schedule, fn)
    raise ValueError(
        f"Unknown prediction type: {prediction_type!r} "
        f"(expected one of {VALID_PREDICTION_TYPES})"
    )


def _pair_call_eps(schedule, inner, x, t, y=None):
    eps = inner(x, t, y)
    # the c1/c2 form is bit-identical to round 1 (reference parity path)
    return eps, predict_x0_from_eps(schedule, x, t, eps)


def _pair_call_v(schedule, inner, x, t, y=None):
    v = inner(x, t, y)
    a = extract(schedule.sqrt_alphas_cumprod, t, x.ndim)
    b = extract(schedule.sqrt_one_minus_alphas_cumprod, t, x.ndim)
    return b * x + a * v, a * x - b * v


def _pair_call_x0(schedule, inner, x, t, y=None):
    x0 = inner(x, t, y)
    a = extract(schedule.sqrt_alphas_cumprod, t, x.ndim)
    b = extract(schedule.sqrt_one_minus_alphas_cumprod, t, x.ndim)
    return (x - a * x0) / jnp.maximum(b, 1e-12), x0


def wrap_model_as_eps_x0(
    schedule: NoiseSchedule, model_fn: ModelFn, prediction_type: str
) -> Callable:
    """A `(x, t, y) -> (eps, x0)` view of a model in any parameterization.

    The samplers need BOTH eps (direction term) and x0 (mean / clipping /
    thresholding); converting the raw model output to each directly is
    both cheaper than funneling v/x0 -> eps -> x0 (one conversion instead
    of two) and the only finite route under zero-terminal-SNR schedules:
    at SNR = 0 (a = 0) eps carries no x0 information, so the eps->x0
    funnel is 0/0 there while v/x0 outputs convert exactly
    (eps = b*x + a*v, x0 = a*x - b*v; a^2 + b^2 = 1).
    Same `jax.tree_util.Partial` identity-stability contract as
    `wrap_model_as_eps`.
    """
    fn = as_pytree_fn(model_fn)
    if prediction_type == "eps":
        return jax.tree_util.Partial(_pair_call_eps, schedule, fn)
    if prediction_type == "v":
        return jax.tree_util.Partial(_pair_call_v, schedule, fn)
    if prediction_type == "x0":
        return jax.tree_util.Partial(_pair_call_x0, schedule, fn)
    raise ValueError(
        f"Unknown prediction type: {prediction_type!r} "
        f"(expected one of {VALID_PREDICTION_TYPES})"
    )


# Sentinel default for sampler p_threshold arguments: resolves to 0.995
# (reference parity) in bounded pixel space, None in unbounded latent space.
AUTO_THRESHOLD = "auto"


def resolve_p_threshold(p_threshold, clip_sample: bool):
    """Resolve a sampler's p_threshold argument against the process's
    clip_sample policy: the AUTO_THRESHOLD sentinel becomes 0.995 for
    bounded (pixel) spaces and None for unbounded (latent) ones; explicit
    floats/None pass through validated."""
    if isinstance(p_threshold, str):
        if p_threshold != AUTO_THRESHOLD:
            raise ValueError(f"Unknown p_threshold: {p_threshold!r}")
        return 0.995 if clip_sample else None
    if p_threshold is not None and not (0.0 < float(p_threshold) < 1.0):
        raise ValueError("p_threshold must be in (0, 1) or None")
    return p_threshold


def constrain_x0(
    x0: jnp.ndarray, p_threshold: Optional[float], clip_denoised: bool
) -> jnp.ndarray:
    """The CFG-path x0 constraint honoring BOTH knobs: dynamic threshold
    when p_threshold is set, else clamp to [-1, 1] when clip_denoised,
    else pass through untouched — latent-diffusion spaces are unbounded,
    so clipping there corrupts every sample."""
    if p_threshold is not None:
        if not (0.0 < float(p_threshold) < 1.0):
            raise ValueError("p_threshold must be in (0, 1) or None")
        return dynamic_threshold(x0, float(p_threshold))
    if clip_denoised:
        return jnp.clip(x0, -1.0, 1.0)
    return x0


def rescale_guided(
    x_g: jnp.ndarray, x_c: jnp.ndarray, phi: float
) -> jnp.ndarray:
    """Guidance contrast rescale (Lin et al. 2023 §3.4): pull the guided
    prediction's per-sample std back toward the conditional branch's and
    blend with factor phi. Shared by the VP samplers (`cfg_eps_x0`) and
    EDM (`edm._cfg_denoised`)."""
    axes = tuple(range(1, x_g.ndim))
    std_c = jnp.std(x_c, axis=axes, keepdims=True)
    std_g = jnp.std(x_g, axis=axes, keepdims=True)
    res = x_g * (std_c / jnp.maximum(std_g, 1e-12))
    p = jnp.float32(phi)
    return p * res + (1.0 - p) * x_g


def validate_guidance_rescale(value) -> float:
    """Validate the guidance_rescale blend factor phi (must be in [0, 1])."""
    v = float(value)
    if not (0.0 <= v <= 1.0):
        raise ValueError(
            f"guidance_rescale must be in [0, 1], got {value!r}"
        )
    return v


def validate_cfg_interval(value, num_timesteps: int):
    """Validate a `cfg_interval: [t_lo, t_hi]` config value (static
    int pair, 0 <= lo <= hi < T) or None."""
    if value is None:
        return None
    lo, hi = (int(value[0]), int(value[1]))
    if not (0 <= lo <= hi < num_timesteps):
        raise ValueError(
            f"cfg_interval must satisfy 0 <= lo <= hi < {num_timesteps}, "
            f"got {value!r}"
        )
    return (lo, hi)


def cfg_eps_x0(
    pair_fn: Callable,
    x: jnp.ndarray,
    t: jnp.ndarray,
    y: jnp.ndarray,
    cfg_scale: float,
    guidance_rescale: float = 0.0,
    schedule: Optional[NoiseSchedule] = None,
    cfg_interval=None,
):
    """Classifier-free guidance on an (eps, x0) pair, fused batch.

    Guiding each component independently is exactly consistent: both are
    affine in the raw model output with coefficients that don't depend on
    the conditioning branch, so guided_x0 == x0_implied(guided_eps).
    Fused [cond; uncond] forward as in `cfg_eps`.

    `guidance_rescale` (extension; Lin et al. 2023 §3.4, phi in [0, 1])
    counteracts CFG's per-sample contrast blow-up: the guided x0 is
    rescaled toward the conditional branch's per-sample std
    (x0_res = x0_g * std(x0_c)/std(x0_g)) and blended
    (phi*x0_res + (1-phi)*x0_g). We define the rescale in x0 space — the
    space the paper's zero-terminal-SNR v-models effectively predict at
    high noise — and re-derive eps from the rescaled x0
    (eps = (x - a*x0)/b) so the pair stays self-consistent for samplers
    that use both. phi must be a static Python float; 0 is bit-exact with
    the unrescaled path.

    `cfg_interval` (extension; Kynkaanniemi et al. 2024): a static
    (t_lo, t_hi) pair limiting guidance to that noise range — outside it
    the CONDITIONAL prediction is used unguided (the scale-1 limit).
    Guiding only the middle noise levels improves FID at high scales in
    the paper; None (default) guides everywhere (reference parity).
    """
    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    y2 = jnp.concatenate([y, jnp.zeros_like(y)], axis=0)
    eps2, x02 = pair_fn(x2, t2, y2)
    eps_c, eps_u = jnp.split(eps2, 2, axis=0)
    x0_c, x0_u = jnp.split(x02, 2, axis=0)
    eps_g = eps_u + cfg_scale * (eps_c - eps_u)
    x0_g = x0_u + cfg_scale * (x0_c - x0_u)
    if float(guidance_rescale) > 0.0:
        if schedule is None:
            raise ValueError("guidance_rescale needs the noise schedule")
        x0_g = rescale_guided(x0_g, x0_c, guidance_rescale)
        a = extract(schedule.sqrt_alphas_cumprod, t, x.ndim)
        b = extract(schedule.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        eps_g = (x - a * x0_g) / jnp.maximum(b, 1e-12)
    if cfg_interval is not None:
        lo, hi = cfg_interval
        gate = ((t >= lo) & (t <= hi)).reshape(
            -1, *((1,) * (x.ndim - 1))
        )
        eps_g = jnp.where(gate, eps_g, eps_c)
        x0_g = jnp.where(gate, x0_g, x0_c)
    return eps_g, x0_g


def loss_weight(
    schedule: NoiseSchedule,
    t: jnp.ndarray,
    prediction_type: str = "eps",
    weighting: str = "uniform",
    snr_gamma: float = 5.0,
) -> jnp.ndarray:
    """Per-sample timestep loss weights, shape (batch,).

    Weightings are defined as the EFFECTIVE weight W(t) on the x0-space
    squared error, then mapped into the network's target space using the
    exact conversion factors at fixed (x_t, t) — with a = sqrt(acp),
    b = sqrt(1-acp), SNR = acp/(1-acp) = a^2/b^2:

        ||eps_err||^2 = SNR       * ||x0_err||^2
        ||v_err||^2   = (SNR + 1) * ||x0_err||^2

    so the applied weight is W(t) / conversion. Options:
      'uniform': 1 in target space (reference parity for eps; each
                 parameterization keeps its naive objective).
      'snr':     W(t) = SNR — the standard DDPM eps objective expressed in
                 any parameterization (eps weights become exactly 1; use
                 this to train v/x0 models with eps-equivalent emphasis).
      'min_snr': W(t) = min(SNR, gamma) — Min-SNR-gamma (Hang et al.
                 2023): clips the huge low-noise weights so late
                 timesteps stop dominating; faster convergence, better
                 FID in the paper (gamma = 5 recommended).
    """
    if weighting == "uniform":
        return jnp.ones_like(t, dtype=jnp.float32)
    acp = extract(schedule.alphas_cumprod, t, 1).astype(jnp.float32)
    snr = acp / (1.0 - acp)
    if weighting == "snr":
        w_x0 = snr
    elif weighting == "min_snr":
        w_x0 = jnp.minimum(snr, jnp.float32(snr_gamma))
    else:
        raise ValueError(
            f"Unknown loss weighting: {weighting!r} "
            f"(expected one of {VALID_LOSS_WEIGHTINGS})"
        )
    if prediction_type == "eps":
        return w_x0 / snr
    if prediction_type == "v":
        return w_x0 / (snr + 1.0)
    if prediction_type == "x0":
        return w_x0
    raise ValueError(
        f"Unknown prediction type: {prediction_type!r} "
        f"(expected one of {VALID_PREDICTION_TYPES})"
    )


def p_losses(
    schedule: NoiseSchedule,
    model_fn: ModelFn,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    y: Optional[jnp.ndarray] = None,
    loss_type: str = "l2",
    prediction_type: str = "eps",
    weighting: str = "uniform",
    snr_gamma: float = 5.0,
) -> jnp.ndarray:
    """Training loss (parity: reference ddpm.py:106-140).

    Unlike the reference, `noise` is explicit (JAX functional RNG): callers
    draw it from their PRNG stream. The model is a callable argument —
    diffusion never imports models (the reference's key invariant).
    `prediction_type` selects the regression target (eps/v/x0; eps is
    reference parity); `weighting` an SNR-based per-timestep loss weight
    (see `loss_weight`; 'uniform' is reference parity — the weighted path
    reduces per-sample first, which equals the global mean when uniform).
    """
    x_noisy = q_sample(schedule, x_start, t, noise)
    predicted = model_fn(x_noisy, t, y)
    target = prediction_target(schedule, x_start, noise, t, prediction_type)
    if weighting == "uniform":
        return diffusion_loss(target, predicted, loss_type)
    w = loss_weight(schedule, t, prediction_type, weighting, snr_gamma)
    per_sample = per_sample_loss(target, predicted, loss_type)
    return jnp.mean(w * per_sample)


def predict_x0_from_eps(
    schedule: NoiseSchedule, x: jnp.ndarray, t: jnp.ndarray, eps: jnp.ndarray
) -> jnp.ndarray:
    """x0 = sqrt(1/acp_t) * x_t - sqrt(1/acp_t - 1) * eps (ddpm.py:169-178)."""
    c1 = extract(schedule.sqrt_recip_alphas_cumprod, t, x.ndim)
    c2 = extract(schedule.sqrt_recipm1_alphas_cumprod, t, x.ndim)
    return c1 * x - c2 * eps


def dynamic_threshold(x0: jnp.ndarray, p_threshold: float) -> jnp.ndarray:
    """Imagen-style dynamic thresholding (parity: ddpm.py:306-314).

    Per-sample quantile of |x0| at `p_threshold`, floored at 1, then clamp
    to [-s, s] and rescale by s. `jnp.quantile` uses linear interpolation,
    matching torch.quantile defaults.
    """
    batch = x0.shape[0]
    flat = jnp.abs(x0.reshape(batch, -1))
    s = jnp.quantile(flat, p_threshold, axis=1)
    s = jnp.maximum(s, 1.0)
    s = s.reshape(batch, *((1,) * (x0.ndim - 1)))
    return jnp.clip(x0, -s, s) / s


def apply_x0_constraint(
    x0: jnp.ndarray, p_threshold: Optional[float]
) -> jnp.ndarray:
    """Dynamic thresholding if p_threshold given, else clamp to [-1, 1]."""
    if p_threshold is not None:
        if not (0.0 < float(p_threshold) < 1.0):
            raise ValueError("p_threshold must be in (0, 1) or None")
        return dynamic_threshold(x0, float(p_threshold))
    return jnp.clip(x0, -1.0, 1.0)


def cfg_eps(
    model_fn: ModelFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    y: jnp.ndarray,
    cfg_scale: float,
) -> jnp.ndarray:
    """Classifier-free-guided epsilon with a fused batched forward.

    The reference makes two model calls per step (ddpm.py:292-294). On TPU
    one call on the concatenated [cond; uncond] batch keeps the MXU busy
    with a single larger matmul set and halves kernel launch/dispatch
    overhead — numerically identical.
    """
    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    y2 = jnp.concatenate([y, jnp.zeros_like(y)], axis=0)
    eps2 = model_fn(x2, t2, y2)
    eps_cond, eps_uncond = jnp.split(eps2, 2, axis=0)
    return eps_uncond + cfg_scale * (eps_cond - eps_uncond)
