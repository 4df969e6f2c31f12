"""Schedule math vs closed form (SURVEY.md §4 unit-test plan)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.diffusion import (
    NoiseSchedule,
    ddim_timesteps,
    make_betas,
)


def _np_linear(T, b0, b1):
    return np.linspace(b0, b1, T, dtype=np.float32)


def test_linear_betas_match_closed_form():
    betas = make_betas(1000, 1e-4, 0.02, "linear")
    np.testing.assert_allclose(betas, _np_linear(1000, 1e-4, 0.02), rtol=1e-6)


def test_quadratic_betas():
    betas = make_betas(100, 1e-4, 0.02, "quadratic")
    expected = np.linspace(1e-4**0.5, 0.02**0.5, 100, dtype=np.float32) ** 2
    np.testing.assert_allclose(betas, expected, rtol=1e-6)


def test_cosine_betas_match_closed_form():
    T, s = 50, 0.008
    x = np.linspace(0, T, T + 1, dtype=np.float32)
    ac = np.cos(((x / T) + s) / (1 + s) * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    expected = np.clip(1 - ac[1:] / ac[:-1], 0.0001, 0.9999)
    betas = make_betas(T, beta_schedule="cosine")
    np.testing.assert_allclose(betas, expected, rtol=1e-5, atol=1e-7)


def test_unknown_schedule_raises():
    with pytest.raises(ValueError):
        make_betas(10, beta_schedule="nope")


def test_derived_coefficients():
    sched = NoiseSchedule.create(200, 1e-4, 0.02, "linear")
    betas = np.asarray(sched.betas, dtype=np.float64)
    alphas = 1 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.concatenate([[1.0], acp[:-1]])

    np.testing.assert_allclose(sched.alphas_cumprod, acp, rtol=1e-4)
    np.testing.assert_allclose(sched.sqrt_alphas_cumprod, np.sqrt(acp), rtol=1e-4)
    np.testing.assert_allclose(
        sched.sqrt_one_minus_alphas_cumprod, np.sqrt(1 - acp), rtol=1e-4
    )
    np.testing.assert_allclose(
        sched.sqrt_recipm1_alphas_cumprod, np.sqrt(1 / acp - 1), rtol=1e-4
    )
    post_var = betas * (1 - acp_prev) / (1 - acp)
    np.testing.assert_allclose(
        sched.posterior_variance, post_var, rtol=2e-4, atol=1e-8
    )
    np.testing.assert_allclose(
        sched.posterior_mean_coef1,
        betas * np.sqrt(acp_prev) / (1 - acp),
        rtol=2e-4,
        atol=1e-8,
    )
    np.testing.assert_allclose(
        sched.posterior_mean_coef2,
        (1 - acp_prev) * np.sqrt(alphas) / (1 - acp),
        rtol=2e-4,
        atol=1e-8,
    )
    # Posterior variance at t=0 uses acp_prev=1 => exactly 0, log clipped.
    assert float(sched.posterior_variance[0]) == 0.0
    assert float(sched.posterior_log_variance_clipped[0]) == pytest.approx(
        math.log(1e-20), rel=1e-6
    )


def test_ddim_timestep_grid():
    """Parity with reference ddim.py:78-85: round(linspace(T-1, 0, S))."""
    ts = np.asarray(ddim_timesteps(1000, 50))
    expected = np.round(np.linspace(999, 0, 50)).astype(np.int64)
    np.testing.assert_array_equal(ts, expected)
    assert ts[0] == 999 and ts[-1] == 0
    # strictly descending
    assert np.all(np.diff(ts) < 0)


def test_ddim_timesteps_edge_cases():
    ts = np.asarray(ddim_timesteps(1000, 1000))
    np.testing.assert_array_equal(ts, np.arange(999, -1, -1))
    ts2 = np.asarray(ddim_timesteps(10, 2))
    np.testing.assert_array_equal(ts2, [9, 0])
