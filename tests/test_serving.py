"""AOT sampler export: serialize -> deserialize -> run matches live jit."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_collection_tpu.factory import get_model
from diffusion_models_collection_tpu.serving import export_sampler, run_exported

CONFIG = {
    "model_type": "unet",
    "model_params": {
        "image_size": (8, 8), "in_channels": 3, "model_channels": 8,
        "out_channels": 3, "num_res_blocks": 1,
        "attention_resolutions": (4,), "channel_mult": (1, 2),
    },
    "image_size": (8, 8),
    "conditional": True,
    "num_classes": 5,
    "num_timesteps": 8,
    "beta_start": 1e-4,
    "beta_end": 0.02,
    "beta_schedule": "linear",
    "num_inference_steps": 4,
    "ddim_eta": 0.0,
    "cfg_scale": 1.5,
}


def test_export_roundtrip():
    model = get_model(CONFIG)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, 3)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )["params"]

    blob = export_sampler(model, params, CONFIG, batch_size=2)
    assert isinstance(blob, bytes) and len(blob) > 1000

    rng = jax.random.PRNGKey(7)
    labels = jnp.array([1, 3], jnp.int32)
    out = run_exported(blob, params, rng, labels)
    assert out.shape == (2, 8, 8, 3)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0

    # matches the live (non-exported) sampler bit-for-bit
    from diffusion_models_collection_tpu.serving import _build_sampler_fn

    sampler, _ = _build_sampler_fn(model, CONFIG, 2, "ddim", 1.5)
    live = jax.jit(sampler)(params, rng, labels)
    np.testing.assert_allclose(np.asarray(out), np.asarray(live), atol=1e-6)
