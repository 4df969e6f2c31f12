"""Noise schedules for diffusion processes.

Behavioral parity with the reference schedule construction
(`/root/reference/diffusion/ddpm.py:38-71` and `ddim.py:42-57`): linear /
cosine / quadratic beta schedules and every derived coefficient array,
precomputed once in float32 exactly as the reference does with torch ops.

TPU-first design: the schedule is a frozen, pytree-registered dataclass of
`jnp` arrays so it can be closed over by `jax.jit`-compiled samplers and
donated/replicated freely across a device mesh. Per-timestep coefficient
lookup (`extract`) is a gather that XLA fuses into the surrounding
elementwise work — no host round-trips in the hot loop.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp

VALID_SCHEDULES = ("linear", "cosine", "quadratic")


def make_betas(
    num_timesteps: int,
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
    beta_schedule: str = "linear",
) -> jnp.ndarray:
    """Build the beta schedule (parity: reference ddpm.py:38-46,73-82)."""
    if beta_schedule == "linear":
        return jnp.linspace(beta_start, beta_end, num_timesteps, dtype=jnp.float32)
    if beta_schedule == "quadratic":
        return (
            jnp.linspace(
                beta_start**0.5, beta_end**0.5, num_timesteps, dtype=jnp.float32
            )
            ** 2
        )
    if beta_schedule == "cosine":
        return _cosine_betas(num_timesteps)
    raise ValueError(
        f"Unknown beta schedule: {beta_schedule!r} (expected one of {VALID_SCHEDULES})"
    )


def _cosine_betas(num_timesteps: int, s: float = 0.008) -> jnp.ndarray:
    """Cosine schedule (Nichol & Dhariwal 2021; parity: reference ddpm.py:73-82)."""
    steps = num_timesteps + 1
    x = jnp.linspace(0.0, num_timesteps, steps, dtype=jnp.float32)
    alphas_cumprod = jnp.cos(((x / num_timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return jnp.clip(betas, 0.0001, 0.9999)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """All precomputed diffusion coefficients (reference ddpm.py:48-71).

    Every field is a float32 array of shape (T,). Registered as a pytree so
    the whole schedule can live inside jitted functions and train state.
    """

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])

    @classmethod
    def create(
        cls,
        num_timesteps: int = 1000,
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        zero_terminal_snr: bool = False,
    ) -> "NoiseSchedule":
        betas = make_betas(num_timesteps, beta_start, beta_end, beta_schedule)
        alphas = 1.0 - betas
        alphas_cumprod = jnp.cumprod(alphas, axis=0)
        if zero_terminal_snr:
            # Lin et al. 2023 ("Common Diffusion Noise Schedules and Sample
            # Steps are Flawed"): rescale sqrt(acp) affinely so the TERMINAL
            # step is pure noise (acp[T-1] = 0, SNR exactly 0) while acp[0]
            # is unchanged. betas/alphas are rebuilt from the rescaled
            # cumprod so the ancestral posterior stays self-consistent
            # (alpha_T = 0 -> beta_T = 1). sqrt_recip_* are inf at the
            # terminal step — eps-parameterized x0 recovery is undefined at
            # SNR 0, which is why the process classes reject
            # prediction_type 'eps' under this flag; the samplers' (eps,
            # x0) pair conversion never touches those arrays for v/x0.
            s = jnp.sqrt(alphas_cumprod)
            s = (s - s[-1]) * (s[0] / (s[0] - s[-1]))
            alphas_cumprod = s**2
            alphas = jnp.concatenate(
                [alphas_cumprod[:1], alphas_cumprod[1:] / alphas_cumprod[:-1]]
            )
            betas = 1.0 - alphas
        alphas_cumprod_prev = jnp.concatenate(
            [jnp.ones((1,), dtype=jnp.float32), alphas_cumprod[:-1]]
        )
        posterior_variance = (
            betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        )
        return cls(
            betas=betas,
            alphas=alphas,
            alphas_cumprod=alphas_cumprod,
            alphas_cumprod_prev=alphas_cumprod_prev,
            sqrt_alphas_cumprod=jnp.sqrt(alphas_cumprod),
            sqrt_one_minus_alphas_cumprod=jnp.sqrt(1.0 - alphas_cumprod),
            sqrt_recip_alphas=jnp.sqrt(1.0 / alphas),
            sqrt_recip_alphas_cumprod=jnp.sqrt(1.0 / alphas_cumprod),
            sqrt_recipm1_alphas_cumprod=jnp.sqrt(1.0 / alphas_cumprod - 1.0),
            posterior_variance=posterior_variance,
            posterior_log_variance_clipped=jnp.log(
                jnp.clip(posterior_variance, min=1e-20)
            ),
            posterior_mean_coef1=(
                betas * jnp.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            ),
            posterior_mean_coef2=(
                (1.0 - alphas_cumprod_prev)
                * jnp.sqrt(alphas)
                / (1.0 - alphas_cumprod)
            ),
        )


def extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and reshape for broadcasting.

    Parity with reference `_extract` (ddpm.py:142-149): returns shape
    (B, 1, ..., 1) with `ndim - 1` trailing singleton axes.
    """
    out = a[t]
    return out.reshape(t.shape[0], *((1,) * (ndim - 1)))


def ddim_timesteps(num_timesteps: int, num_inference_steps: int) -> jnp.ndarray:
    """DDIM inference timestep grid (parity: reference ddim.py:71-85).

    `round(linspace(T-1, 0, S))` — descending, endpoints included, banker's
    rounding matching torch/numpy `.round()` semantics.
    """
    ts = jnp.linspace(
        num_timesteps - 1, 0, num_inference_steps, dtype=jnp.float32
    )
    return jnp.round(ts).astype(jnp.int32)


def karras_timesteps(
    schedule: "NoiseSchedule",
    num_inference_steps: int,
    rho: float = 7.0,
) -> jnp.ndarray:
    """Karras-spaced inference grid (Karras et al. 2022, eq. 5) — extension.

    sigma_i = (smax^(1/rho) + i/(S-1) * (smin^(1/rho) - smax^(1/rho)))^rho
    over the discrete schedule's VP sigma range (sigma_t =
    sqrt(1-acp)/sqrt(acp)), mapped back to the NEAREST integer timestep
    and deduped (descending order preserved). Front-loads steps into the
    low-noise region where the ODE solution curves most — better quality
    per step at small S for DDIM/DPM++ grids. Returned length can be
    < `num_inference_steps` after dedup at small T; computed host-side
    with numpy at setup (static scan length per compile, like
    `ddim_timesteps`).
    """
    import numpy as np

    if num_inference_steps < 2:
        return jnp.asarray([schedule.num_timesteps - 1], jnp.int32)
    acp = np.asarray(schedule.alphas_cumprod, np.float64)
    sigmas = np.sqrt((1.0 - acp) / acp)  # ascending in t
    smin, smax = sigmas[0], sigmas[-1]
    i = np.arange(num_inference_steps, dtype=np.float64)
    grid = (
        smax ** (1.0 / rho)
        + i / (num_inference_steps - 1)
        * (smin ** (1.0 / rho) - smax ** (1.0 / rho))
    ) ** rho  # descending sigma: noise -> data
    # nearest timestep per sigma (sigmas ascending -> searchsorted)
    idx = np.searchsorted(sigmas, grid, side="left")
    idx = np.clip(idx, 1, len(sigmas) - 1)
    left_closer = np.abs(grid - sigmas[idx - 1]) <= np.abs(sigmas[idx] - grid)
    ts = np.where(left_closer, idx - 1, idx)
    # dedupe; ts is monotone non-increasing, so unique + reverse = grid
    ts = np.unique(ts)[::-1]
    return jnp.asarray(np.ascontiguousarray(ts), jnp.int32)
