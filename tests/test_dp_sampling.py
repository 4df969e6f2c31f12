"""Data-parallel CLI sampling (beyond the single-GPU reference
sample.py/evaluate.py): batches sharded over a 'data' mesh via input
shardings alone; with partitionable threefry the per-step noise is
sharding-invariant, so DP trajectories match single-device ones."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.diffusion import DDIM, DDPM
from diffusion_models_collection_tpu.factory import (
    dp_sampling_sharding,
    eval_model_fn,
    sharded_init_noise,
)
from diffusion_models_collection_tpu.models import DiT

SHAPE = (8, 8, 8, 3)


def _model_fn():
    model = DiT(img_size=(8, 8), patch_size=2, in_channels=3, hidden_size=32,
                depth=2, num_heads=4, num_classes=10, dropout=0.0)
    x = jnp.zeros((1, 8, 8, 3))
    params = model.init(jax.random.PRNGKey(1), x, jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1,), jnp.int32))["params"]
    # adaLN-Zero: fresh DiT predicts eps=0, which would reduce trajectory
    # parity to noise-handling only — perturb so the model term matters
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(
            jax.random.PRNGKey(99), p.shape, p.dtype),
        params,
    )
    return eval_model_fn(model, params)


def test_dp_sampling_sharding_gating():
    assert dp_sampling_sharding(8) is not None  # 8 devices, divisible
    assert dp_sampling_sharding(16) is not None
    assert dp_sampling_sharding(6) is None  # indivisible


@pytest.mark.parametrize("make_diffusion", [
    lambda: DDPM(10),
    lambda: DDIM(10, num_inference_steps=5),
], ids=["ddpm", "ddim"])
def test_dp_sampling_matches_single_device(make_diffusion):
    """Sharded init noise + labels produce the SAME samples as the
    replicated run — including DDPM's per-step in-scan noise draws
    (sharding-invariant threefry)."""
    model_fn = _model_fn()
    diffusion = make_diffusion()
    rng = jax.random.PRNGKey(0)
    y = (jnp.arange(8) % 10) + 1

    ref = diffusion.sample_with_cfg(model_fn, SHAPE, y, rng, cfg_scale=2.0)

    sharding = dp_sampling_sharding(SHAPE[0])
    assert sharding is not None
    noise = sharded_init_noise(rng, SHAPE, sharding)
    out = diffusion.sample_with_cfg(
        model_fn, SHAPE, jax.device_put(y, sharding), rng, cfg_scale=2.0,
        init_noise=noise,
    )
    # the sharded run actually computed distributed
    assert out.sharding.num_devices == jax.device_count() or \
        out.sharding.is_fully_replicated is False
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sharded_init_noise_matches_sampler_draw():
    """sharded_init_noise reproduces the exact noise `_initial_image`
    draws internally (same key split), so passing it changes nothing."""
    model_fn = _model_fn()
    diffusion = DDIM(10, num_inference_steps=5)
    rng = jax.random.PRNGKey(3)

    internal = diffusion.sample(model_fn, SHAPE, rng)  # sampler draws noise
    sharding = dp_sampling_sharding(SHAPE[0])
    explicit = diffusion.sample(
        model_fn, SHAPE, rng,
        init_noise=sharded_init_noise(rng, SHAPE, sharding),
    )
    np.testing.assert_allclose(np.asarray(explicit), np.asarray(internal),
                               rtol=2e-5, atol=2e-5)
