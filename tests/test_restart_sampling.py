"""Restart Sampling (Xu et al. 2023, extension beyond the reference):
DDIM ODE integration with K forward-marginal noise re-injections inside
a timestep interval."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusion_models_collection_tpu.diffusion import DDIM
from diffusion_models_collection_tpu.diffusion.schedule import extract

SHAPE = (2, 8, 8, 3)


def dummy_model(x, t, y=None):
    scale = (t.astype(jnp.float32) / 100.0 + 0.1).reshape(-1, 1, 1, 1)
    out = jnp.tanh(x) * scale
    if y is not None:
        out = out + 0.01 * y.astype(jnp.float32).reshape(-1, 1, 1, 1)
    return out


def exact_model_for(target, schedule):
    def fn(x, t, y=None):
        a = extract(schedule.sqrt_alphas_cumprod, t, x.ndim)
        s = extract(schedule.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        return (x - a * target) / s

    return fn


def test_restart_validation():
    ddim = DDIM(num_timesteps=100, num_inference_steps=10)
    rng = jax.random.PRNGKey(0)
    with pytest.raises(ValueError, match="restarts"):
        ddim.sample_restart(dummy_model, SHAPE, rng, restarts=-1)
    with pytest.raises(ValueError, match="restart_interval"):
        ddim.sample_restart(dummy_model, SHAPE, rng,
                            restart_interval=(50, 20))
    with pytest.raises(ValueError, match="restart_interval"):
        ddim.sample_restart(dummy_model, SHAPE, rng,
                            restart_interval=(0, 100))
    with pytest.raises(ValueError, match="grid point"):
        # 10-step grid over T=100 has ~11-apart points; a 5-wide
        # interval cannot contain two of them
        ddim.sample_restart(dummy_model, SHAPE, rng,
                            restart_interval=(40, 45), restarts=2)
    with pytest.raises(ValueError, match="labels"):
        ddim.sample_restart(dummy_model, SHAPE, rng, cfg_scale=2.0,
                            restarts=1, restart_interval=(1, 60))
    eta_ddim = DDIM(num_timesteps=100, num_inference_steps=10, eta=0.5)
    with pytest.raises(ValueError, match="eta"):
        eta_ddim.sample_restart(dummy_model, SHAPE, rng, restarts=1)


def test_restarts_zero_is_plain_ddim_bitwise():
    ddim = DDIM(num_timesteps=100, num_inference_steps=10)
    rng = jax.random.PRNGKey(1)
    plain = ddim.sample(dummy_model, SHAPE, rng)
    restart0 = ddim.sample_restart(dummy_model, SHAPE, rng, restarts=0,
                                   restart_interval=(1, 60))
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(restart0))


def test_restart_point_mass_recovery():
    """With the exact model every re-integration returns to the point
    mass, so restarts preserve exact recovery — the hop + ODE cycle is
    consistent (wrong hop coefficients would push the state off the
    marginal and break this)."""
    ddim = DDIM(num_timesteps=100, num_inference_steps=20)
    target = jnp.full(SHAPE, 0.35, jnp.float32)
    model = exact_model_for(target, ddim.schedule)
    out = ddim.sample_restart(
        model, SHAPE, jax.random.PRNGKey(2),
        restart_interval=(1, 60), restarts=3,
    )
    np.testing.assert_allclose(np.asarray(out), 0.35, atol=0.02)


def test_restart_differs_and_deterministic():
    ddim = DDIM(num_timesteps=100, num_inference_steps=10)
    rng = jax.random.PRNGKey(3)
    plain = ddim.sample(dummy_model, SHAPE, rng)
    a = ddim.sample_restart(dummy_model, SHAPE, rng,
                            restart_interval=(1, 60), restarts=2)
    b = ddim.sample_restart(dummy_model, SHAPE, rng,
                            restart_interval=(1, 60), restarts=2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.max(jnp.abs(a - plain))) > 1e-4


def test_restart_trajectory_length():
    """return_all records every executed ODE step: 10 base steps + 2
    restarts x the interval's step count."""
    ddim = DDIM(num_timesteps=100, num_inference_steps=10)
    grid = np.asarray(ddim.inference_timesteps)
    lo, hi = 1, 60
    inside = np.nonzero((grid <= hi) & (grid >= lo))[0]
    interval_steps = int(inside[-1]) - int(inside[0])
    traj = ddim.sample_restart(
        dummy_model, SHAPE, jax.random.PRNGKey(4),
        restart_interval=(lo, hi), restarts=2,
        return_all_timesteps=True,
    )
    assert traj.shape == (10 + 2 * interval_steps,) + SHAPE


def test_restart_with_cfg():
    ddim = DDIM(num_timesteps=100, num_inference_steps=10)
    y = jnp.asarray([1, 2])
    out = ddim.sample_restart(
        dummy_model, SHAPE, jax.random.PRNGKey(5), y=y, cfg_scale=2.0,
        restart_interval=(1, 60), restarts=2,
    )
    assert out.shape == SHAPE
    assert bool(jnp.all(jnp.isfinite(out)))
    # CFG restart differs from unguided restart
    out_u = ddim.sample_restart(
        dummy_model, SHAPE, jax.random.PRNGKey(5), y=y,
        restart_interval=(1, 60), restarts=2,
    )
    assert float(jnp.max(jnp.abs(out - out_u))) > 1e-5
