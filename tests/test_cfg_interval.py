"""Limited-interval classifier-free guidance (Kynkaanniemi et al. 2024)
— extension: guide only inside a [t_lo, t_hi] noise range; outside it
the conditional prediction is used unguided."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.diffusion import DDIM, DDPM, DPMSolverPP
from diffusion_models_collection_tpu.diffusion import base
from diffusion_models_collection_tpu.factory import get_diffusion

SHAPE = (2, 8, 8, 3)
KW = dict(num_timesteps=40, beta_start=1e-4, beta_end=0.02,
          beta_schedule="linear")


def _cond_pair(schedule):
    w = jax.random.normal(jax.random.PRNGKey(0), (11, SHAPE[-1]))

    def fn(x, t, y):
        shift = w[y].reshape(x.shape[0], 1, 1, SHAPE[-1])
        return jnp.tanh(x) * 0.4 + 0.3 * shift

    return base.wrap_model_as_eps_x0(schedule, jax.tree_util.Partial(fn),
                                     "eps")


def test_gate_selects_guided_vs_conditional():
    d = DDPM(**KW)
    pair = _cond_pair(d.schedule)
    x = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    y = jnp.array([1, 2], jnp.int32)
    scale = jnp.float32(4.0)
    t_in = jnp.array([10, 20], jnp.int32)     # inside [5, 30]
    t_out = jnp.array([2, 35], jnp.int32)     # outside
    eps_g, x0_g = base.cfg_eps_x0(pair, x, t_in, y, scale)
    eps_i, x0_i = base.cfg_eps_x0(pair, x, t_in, y, scale,
                                  cfg_interval=(5, 30))
    np.testing.assert_array_equal(np.asarray(eps_g), np.asarray(eps_i))
    np.testing.assert_array_equal(np.asarray(x0_g), np.asarray(x0_i))
    # outside: exactly the conditional branch (the scale-1 limit)
    eps_c, x0_c = base.cfg_eps_x0(pair, x, t_out, y, jnp.float32(1.0))
    eps_o, x0_o = base.cfg_eps_x0(pair, x, t_out, y, scale,
                                  cfg_interval=(5, 30))
    np.testing.assert_allclose(np.asarray(eps_o), np.asarray(eps_c),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x0_o), np.asarray(x0_c),
                               rtol=1e-5, atol=1e-6)


def test_full_interval_is_plain_cfg_end_to_end():
    w = jax.random.normal(jax.random.PRNGKey(2), (11, SHAPE[-1]))

    def model(x, t, y):
        shift = w[y].reshape(x.shape[0], 1, 1, SHAPE[-1])
        return jnp.tanh(x) * 0.4 + 0.3 * shift

    fn = jax.tree_util.Partial(model)
    y = jnp.array([1, 2], jnp.int32)
    rng = jax.random.PRNGKey(3)
    for cls, kw in ((DDPM, {}), (DDIM, dict(num_inference_steps=8)),
                    (DPMSolverPP, dict(num_inference_steps=8))):
        plain = cls(**kw, **KW)
        full = cls(cfg_interval=(0, KW["num_timesteps"] - 1), **kw, **KW)
        a = plain.sample_with_cfg(fn, SHAPE, y, rng, cfg_scale=3.0)
        b = full.sample_with_cfg(fn, SHAPE, y, rng, cfg_scale=3.0)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # a real interval changes the trajectory
        mid = cls(cfg_interval=(10, 30), **kw, **KW)
        c = mid.sample_with_cfg(fn, SHAPE, y, rng, cfg_scale=3.0)
        assert not np.allclose(np.asarray(a), np.asarray(c))


def test_empty_like_interval_equals_conditional_sampling():
    """An interval covering no grid point = conditional-only sampling
    (scale irrelevant), checked through DDIM end to end."""
    w = jax.random.normal(jax.random.PRNGKey(4), (11, SHAPE[-1]))

    def model(x, t, y):
        shift = w[y].reshape(x.shape[0], 1, 1, SHAPE[-1])
        return jnp.tanh(x) * 0.4 + 0.3 * shift

    fn = jax.tree_util.Partial(model)
    y = jnp.array([1, 2], jnp.int32)
    rng = jax.random.PRNGKey(5)
    # an interval that misses every grid point: the gate never opens, so
    # the cfg_scale value cannot matter
    d = DDIM(cfg_interval=(1, 1), num_inference_steps=8, **KW)
    grid = np.asarray(d.inference_timesteps)
    assert 1 not in grid
    out_a = d.sample_with_cfg(fn, SHAPE, y, rng, cfg_scale=2.0)
    out_b = d.sample_with_cfg(fn, SHAPE, y, rng, cfg_scale=9.0)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_validation_and_factory_plumb():
    cfg = dict(KW, cfg_interval=[5, 30])
    for method in ("ddpm", "ddim", "dpm++"):
        assert get_diffusion(cfg, method).cfg_interval == (5, 30)
    assert get_diffusion(dict(KW)).cfg_interval is None
    for bad in ((-1, 10), (30, 5), (0, 40)):
        with pytest.raises(ValueError, match="cfg_interval"):
            DDPM(cfg_interval=bad, **KW)
    with pytest.raises(ValueError, match="flow matching"):
        get_diffusion(dict(num_timesteps=40,
                           diffusion_type="flow_matching",
                           cfg_interval=[5, 30]))
    with pytest.raises(ValueError, match="EDM"):
        get_diffusion(dict(num_timesteps=40, diffusion_type="edm",
                           cfg_interval=[5, 30]))
