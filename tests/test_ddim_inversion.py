"""DDIM inversion (extension): clean image -> noise latent whose
deterministic forward trajectory reproduces it (the editing primitive)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.diffusion import DDIM

SHAPE = (2, 8, 8, 3)
KW = dict(num_timesteps=200, beta_start=1e-4, beta_end=0.02,
          beta_schedule="linear")


def _smooth_eps_model():
    def fn(x, t, y=None):
        return 0.3 * jnp.tanh(x)

    return jax.tree_util.Partial(fn)


def test_invert_then_sample_round_trip():
    """sample(init_noise=invert(x)) ~ x, tightening as steps grow
    (the O(1/S) discretization error of the inversion)."""
    fn = _smooth_eps_model()
    x = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), SHAPE) * 0.4,
                 -1, 1)
    errs = []
    for steps in (10, 50):
        d = DDIM(num_inference_steps=steps, **KW)
        z = d.invert(fn, x)
        assert z.shape == x.shape and np.isfinite(np.asarray(z)).all()
        # reconstruct WITHOUT clipping (clip would bend the trajectory)
        d_free = DDIM(num_inference_steps=steps, clip_sample=False, **KW)
        x_rec = d_free.sample(fn, SHAPE, jax.random.PRNGKey(1),
                              init_noise=z)
        errs.append(float(jnp.max(jnp.abs(x_rec - x))))
    assert errs[1] < errs[0]  # finer grid, smaller error
    assert errs[1] < 0.08, errs


def test_inversion_moves_off_the_input():
    """The latent is genuinely at the terminal grid point, not a no-op:
    it differs from the input by much more than the round-trip error."""
    d = DDIM(num_inference_steps=50, **KW)
    x = 0.4 * jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    z = d.invert(_smooth_eps_model(), x)
    assert float(jnp.max(jnp.abs(z - x))) > 0.3


def test_inversion_deterministic_and_label_passthrough():
    w = jax.random.normal(jax.random.PRNGKey(3), (11, 3))

    def cond(x, t, y=None):
        shift = 0.0 if y is None else w[y].reshape(-1, 1, 1, 3)
        return 0.2 * jnp.tanh(x) + 0.1 * shift

    fn = jax.tree_util.Partial(cond)
    d = DDIM(num_inference_steps=8, **KW)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(4), SHAPE)
    y = jnp.array([1, 2], jnp.int32)
    z1 = d.invert(fn, x, y=y)
    z2 = d.invert(fn, x, y=y)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    z_other = d.invert(fn, x, y=jnp.array([3, 4], jnp.int32))
    assert not np.allclose(np.asarray(z1), np.asarray(z_other))


def test_inversion_rejects_stochastic_sampler():
    d = DDIM(num_inference_steps=8, eta=0.5, **KW)
    with pytest.raises(ValueError, match="eta"):
        d.invert(_smooth_eps_model(), jnp.zeros(SHAPE))


def test_num_steps_override():
    d = DDIM(num_inference_steps=8, **KW)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(5), SHAPE)
    z8 = d.invert(_smooth_eps_model(), x)
    z16 = d.invert(_smooth_eps_model(), x, num_steps=16)
    assert z8.shape == z16.shape
    assert not np.allclose(np.asarray(z8), np.asarray(z16))
