"""DeepCache (Ma et al. 2023, extension beyond the reference —
diffusion/deepcache.py + models/unet.py deepcache modes): partial
execution binds the same checkpoint params (name pinning), the
full-mode forward is bitwise parity with the default pass, an exact
cache reproduces the full output through the shallow pass, and the
cached DDIM scan at interval=1 is numerically identical to the plain
sampler (uncond, CFG, eta > 0)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusion_models_collection_tpu.diffusion import DDIM, deepcache_sample
from diffusion_models_collection_tpu.models import UNet

KW = dict(
    image_size=(16, 16),
    in_channels=3,
    model_channels=8,
    out_channels=3,
    num_res_blocks=2,
    attention_resolutions=(8, 4),
    channel_mult=(1, 2, 2, 2),
    dropout=0.0,
    num_classes=11,
)


@pytest.fixture(scope="module")
def unet_setup():
    m = UNet(**KW)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    t = jnp.array([3, 7], jnp.int32)
    y = jnp.array([1, 2], jnp.int32)
    params = m.init(jax.random.PRNGKey(1), x, t, y)
    return m, params, x, t, y


# ------------------------------------------------------------- UNet modes
def test_full_mode_is_bitwise_parity(unet_setup):
    """'full' runs the identical program plus a cache tap."""
    m, params, x, t, y = unet_setup
    base_out = m.apply(params, x, t, y)
    out, cache = UNet(**KW, deepcache_mode="full").apply(params, x, t, y)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base_out))
    # depth=1 cache: the feature entering the outermost up level —
    # full resolution, channels = model_channels * reversed_mult[-2]
    assert cache.shape == (2, 16, 16, 8 * 2)


@pytest.mark.parametrize("depth", [1, 2, 3])
def test_shallow_with_exact_cache_matches_full(unet_setup, depth):
    """Splicing the cache captured at the SAME (x, t) back in must
    reproduce the full output — the shallow path recomputes exactly the
    layers above the cache point."""
    m, params, x, t, y = unet_setup
    base_out = m.apply(params, x, t, y)
    _, cache = UNet(**KW, deepcache_mode="full",
                    deepcache_depth=depth).apply(params, x, t, y)
    out_s = UNet(**KW, deepcache_mode="shallow",
                 deepcache_depth=depth).apply(params, x, t, y, cache=cache)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(base_out),
                               rtol=1e-5, atol=1e-5)


def test_shallow_depends_on_cache(unet_setup):
    """A different cache must change the output (the splice is live)."""
    m, params, x, t, y = unet_setup
    _, cache = UNet(**KW, deepcache_mode="full").apply(params, x, t, y)
    shallow = UNet(**KW, deepcache_mode="shallow")
    a = shallow.apply(params, x, t, y, cache=cache)
    b = shallow.apply(params, x, t, y, cache=cache * 1.5)
    assert float(jnp.max(jnp.abs(a - b))) > 1e-5


def test_mode_validation(unet_setup):
    m, params, x, t, y = unet_setup
    with pytest.raises(ValueError, match="deepcache_mode"):
        UNet(**KW, deepcache_mode="half").apply(params, x, t, y)
    for bad_depth in (0, 4):
        with pytest.raises(ValueError, match="deepcache_depth"):
            UNet(**KW, deepcache_mode="full",
                 deepcache_depth=bad_depth).apply(params, x, t, y)
    with pytest.raises(ValueError, match="cache"):
        UNet(**KW, deepcache_mode="shallow").apply(params, x, t, y)


# ------------------------------------------------------- the cached scan
def _fns(params, depth=1):
    full_m = UNet(**KW, deepcache_mode="full", deepcache_depth=depth)
    shal_m = UNet(**KW, deepcache_mode="shallow", deepcache_depth=depth)

    def full_call(x, t, y):
        return full_m.apply(params, x, t, y, train=False)

    def shallow_call(x, t, y, cache):
        return shal_m.apply(params, x, t, y, train=False, cache=cache)

    return (jax.tree_util.Partial(full_call),
            jax.tree_util.Partial(shallow_call))


@pytest.mark.parametrize("eta", [0.0, 0.5])
def test_interval_one_matches_plain_ddim(unet_setup, eta):
    m, params, _, _, _ = unet_setup
    ddim = DDIM(num_timesteps=100, num_inference_steps=7, eta=eta)
    full_fn, shallow_fn = _fns(params)
    rng = jax.random.PRNGKey(42)

    def model_fn(x, t, y=None):
        return m.apply(params, x, t, y, train=False)

    plain = ddim.sample(jax.tree_util.Partial(model_fn), (2, 16, 16, 3),
                        rng)
    cached = deepcache_sample(ddim, full_fn, shallow_fn, (2, 16, 16, 3),
                              rng, interval=1)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)


def test_interval_one_matches_plain_cfg(unet_setup):
    m, params, _, _, _ = unet_setup
    ddim = DDIM(num_timesteps=100, num_inference_steps=6)
    full_fn, shallow_fn = _fns(params)
    rng = jax.random.PRNGKey(7)
    y = jnp.array([1, 2], jnp.int32)

    def model_fn(x, t, yy=None):
        return m.apply(params, x, t, yy, train=False)

    plain = ddim.sample_with_cfg(jax.tree_util.Partial(model_fn),
                                 (2, 16, 16, 3), y, rng, cfg_scale=2.5)
    cached = deepcache_sample(ddim, full_fn, shallow_fn, (2, 16, 16, 3),
                              rng, y=y, cfg_scale=2.5, interval=1)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("steps,interval", [(9, 3), (7, 3), (4, 5)])
def test_cached_intervals_run_and_are_deterministic(unet_setup, steps,
                                                    interval):
    """Intervals > 1 (incl. grids that don't divide evenly, and an
    interval longer than the grid) produce finite, seed-deterministic
    samples that track the plain trajectory."""
    _, params, _, _, _ = unet_setup
    ddim = DDIM(num_timesteps=100, num_inference_steps=steps)
    full_fn, shallow_fn = _fns(params)
    rng = jax.random.PRNGKey(3)
    a = deepcache_sample(ddim, full_fn, shallow_fn, (2, 16, 16, 3), rng,
                         interval=interval)
    b = deepcache_sample(ddim, full_fn, shallow_fn, (2, 16, 16, 3), rng,
                         interval=interval)
    assert a.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(a)))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the approximation stays in the data range's neighborhood: compare
    # against the exact trajectory from the same seed
    exact = deepcache_sample(ddim, full_fn, shallow_fn, (2, 16, 16, 3),
                             rng, interval=1)
    err = float(jnp.max(jnp.abs(a - exact)))
    assert err < 2.0  # same clip range; cached drift is bounded


def test_deepcache_validation(unet_setup):
    _, params, _, _, _ = unet_setup
    ddim = DDIM(num_timesteps=100, num_inference_steps=4)
    full_fn, shallow_fn = _fns(params)
    with pytest.raises(ValueError, match="interval"):
        deepcache_sample(ddim, full_fn, shallow_fn, (1, 16, 16, 3),
                         jax.random.PRNGKey(0), interval=0)
    with pytest.raises(ValueError, match="labels"):
        deepcache_sample(ddim, full_fn, shallow_fn, (1, 16, 16, 3),
                         jax.random.PRNGKey(0), cfg_scale=2.0, interval=2)
