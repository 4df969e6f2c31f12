"""Karras-spaced inference grids (Karras et al. 2022) — extension.

The reference's only grid is `round(linspace(T-1, 0, S))` (reference
ddim.py:71-85). `timestep_spacing: 'karras'` spaces the DDIM/DPM++ steps
geometrically in sigma^(1/rho) — denser near the data end, where the
probability-flow ODE curves most. Both spacings discretize the SAME ODE,
so they must converge to the same dense solution; the grid itself has
checkable shape/monotonicity/density properties.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.diffusion import (
    DDIM, DPMSolverPP, karras_timesteps,
)
from diffusion_models_collection_tpu.factory import get_diffusion

KW = dict(num_timesteps=200, beta_start=1e-4, beta_end=0.02,
          beta_schedule="linear")


def _analytic_model(schedule):
    """Smooth analytic denoiser (same family as test_samplers' DPM++)."""
    ab = schedule.alphas_cumprod

    def fn(x, t, y):
        a = jnp.sqrt(ab[t]).reshape(-1, 1, 1, 1)
        s = jnp.sqrt(1.0 - ab[t]).reshape(-1, 1, 1, 1)
        x0 = 0.5 * jnp.tanh(x)
        return (x - a * x0) / jnp.clip(s, min=1e-6)

    return jax.tree_util.Partial(fn)


def test_grid_endpoints_and_monotonicity():
    sched = DDIM(**KW).schedule
    ts = np.asarray(karras_timesteps(sched, 20))
    assert ts[0] == KW["num_timesteps"] - 1  # starts at max noise
    assert ts[-1] == 0  # ends at the data end
    assert (np.diff(ts) < 0).all()  # strictly decreasing after dedup
    assert ts.min() >= 0 and ts.max() < KW["num_timesteps"]


def test_grid_is_denser_at_low_noise_than_uniform():
    """rho=7 front-loads steps into the low-t (low-sigma) region: more
    than half the karras steps land in the bottom quarter of t."""
    sched = DDIM(**KW).schedule
    ts = np.asarray(karras_timesteps(sched, 20))
    frac_low = np.mean(ts < KW["num_timesteps"] // 4)
    assert frac_low > 0.5, ts
    # and larger rho pushes even harder toward low noise
    ts_rho2 = np.asarray(karras_timesteps(sched, 20, rho=2.0))
    assert np.mean(ts < KW["num_timesteps"] // 4) >= np.mean(
        ts_rho2 < KW["num_timesteps"] // 4
    )


def test_grid_dedup_never_repeats_and_single_step():
    sched = DDIM(num_timesteps=10, beta_start=1e-4, beta_end=0.02,
                 beta_schedule="linear").schedule
    ts = np.asarray(karras_timesteps(sched, 50))  # S >> T forces dedup
    assert len(np.unique(ts)) == len(ts)
    assert len(ts) <= 10
    assert ts[0] == 9 and ts[-1] == 0
    np.testing.assert_array_equal(np.asarray(karras_timesteps(sched, 1)), [9])


@pytest.mark.parametrize("cls", [DDIM, DPMSolverPP])
def test_karras_converges_to_same_ode_solution(cls):
    """Karras and uniform spacing discretize the same probability-flow
    ODE: at dense step counts they agree; karras self-converges."""
    fn = _analytic_model(DDIM(**KW).schedule)
    noise = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 3))
    shape = (2, 8, 8, 3)

    def solve(spacing, steps):
        d = cls(num_inference_steps=steps, timestep_spacing=spacing, **KW)
        return d.sample(fn, shape, jax.random.PRNGKey(0), init_noise=noise)

    dense_uniform = solve("uniform", 200)
    dense_karras = solve("karras", 200)
    assert float(jnp.max(jnp.abs(dense_karras - dense_uniform))) < 0.05

    err_k12 = float(jnp.max(jnp.abs(solve("karras", 12) - dense_uniform)))
    err_k48 = float(jnp.max(jnp.abs(solve("karras", 48) - dense_uniform)))
    assert err_k48 < err_k12  # monotone self-convergence
    assert err_k48 < 0.05


def test_set_inference_steps_regenerates_karras_grid():
    d = DDIM(num_inference_steps=10, timestep_spacing="karras", **KW)
    g10 = np.asarray(d.inference_timesteps)
    d.set_inference_steps(25)
    g25 = np.asarray(d.inference_timesteps)
    assert len(g25) > len(g10)
    assert g25[0] == KW["num_timesteps"] - 1 and g25[-1] == 0


def test_factory_passes_timestep_spacing():
    cfg = {
        "num_timesteps": 100, "beta_start": 1e-4, "beta_end": 0.02,
        "beta_schedule": "linear", "timestep_spacing": "karras",
        "karras_rho": 5.0, "num_inference_steps": 12,
    }
    for method in ("ddim", "dpm++"):
        d = get_diffusion(cfg, method)
        assert d.timestep_spacing == "karras" and d.karras_rho == 5.0
        ts = np.asarray(d.inference_timesteps)
        assert ts[0] == 99 and ts[-1] == 0
    # DDPM ignores the key (always full-step)
    assert get_diffusion(cfg, "ddpm").num_timesteps == 100
    cfg.pop("timestep_spacing")
    assert get_diffusion(cfg, "ddim").timestep_spacing == "uniform"


def test_invalid_spacing_rejected():
    for cls in (DDIM, DPMSolverPP):
        with pytest.raises(ValueError):
            cls(num_timesteps=16, timestep_spacing="leading")
