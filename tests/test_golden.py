"""Fixed-seed golden trajectories (SURVEY.md §4 golden/parity plan).

A tiny UNet with a fixed init seed + injected x_T noise locks the entire
sampler numerics: any unintended change to schedules, the scan step, CFG
fusion or model math shifts these values. Goldens were generated on the
CPU backend with jax 0.9 (threefry_partitionable on, see conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_collection_tpu.diffusion import DDIM, DDPM
from diffusion_models_collection_tpu.factory import eval_model_fn
from diffusion_models_collection_tpu.models import UNet

SHAPE = (2, 8, 8, 3)


def _model_fn():
    model = UNet(
        image_size=(8, 8), in_channels=3, model_channels=16, out_channels=3,
        num_res_blocks=1, attention_resolutions=(4,), channel_mult=(1, 2),
        num_classes=5,
    )
    v = model.init(
        jax.random.PRNGKey(7),
        jnp.zeros((1, 8, 8, 3)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    return eval_model_fn(model, v["params"])


def _init_noise():
    return jax.random.normal(jax.random.PRNGKey(11), SHAPE)


def test_ddim_deterministic_golden():
    fn = _model_fn()
    ddim = DDIM(num_timesteps=100, num_inference_steps=10)
    out = ddim.sample(fn, SHAPE, jax.random.PRNGKey(0),
                      init_noise=_init_noise())
    np.testing.assert_allclose(
        np.asarray(out[0, 0, :4, 0]),
        [-0.9998166, -0.5076335, -0.9819964, 0.9857431],
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(float(out.mean()), -0.0634169, rtol=1e-3)
    np.testing.assert_allclose(float(out.std()), 0.7411650, rtol=1e-3)
    # deterministic at eta=0 with injected noise: rng must not matter
    out2 = ddim.sample(fn, SHAPE, jax.random.PRNGKey(99),
                       init_noise=_init_noise())
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_ddim_cfg_golden():
    fn = _model_fn()
    ddim = DDIM(num_timesteps=100, num_inference_steps=10)
    out = ddim.sample_with_cfg(
        fn, SHAPE, jnp.array([1, 2]), jax.random.PRNGKey(0), cfg_scale=2.0,
        init_noise=_init_noise(),
    )
    np.testing.assert_allclose(
        np.asarray(out[0, 0, :4, 0]),
        [-0.0558102, 0.0206240, -0.2293617, 0.4275442],
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(float(out.mean()), 0.0082256, rtol=2e-3)


def test_ddpm_golden():
    fn = _model_fn()
    ddpm = DDPM(num_timesteps=20)
    out = ddpm.sample(fn, SHAPE, jax.random.PRNGKey(3),
                      init_noise=_init_noise())
    np.testing.assert_allclose(
        np.asarray(out[0, 0, :4, 0]),
        [-0.9998341, -0.2247664, -0.6436216, 0.9991181],
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(float(out.mean()), -0.0153941, rtol=2e-3)
