"""Prediction-type parameterizations (eps / v / x0) — extension.

The reference trains eps-prediction only (reference ddpm.py:106-140);
`prediction_type: 'v'` (Salimans & Ho 2022) and `'x0'` are extensions.
All three are affine reparameterizations at a fixed (x_t, t), so a model
converted exactly between parameterizations must produce IDENTICAL
trajectories through every sampler — that equivalence is the core test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.diffusion import DDIM, DDPM, DPMSolverPP
from diffusion_models_collection_tpu.diffusion import base
from diffusion_models_collection_tpu.factory import get_diffusion

SHAPE = (2, 8, 8, 3)


def eps_model(x, t, y=None):
    """Deterministic fake eps-denoiser (same family as test_samplers)."""
    scale = (t.astype(jnp.float32) / 100.0 + 0.1).reshape(-1, 1, 1, 1)
    out = jnp.tanh(x) * scale
    if y is not None:
        out = out + 0.01 * y.astype(jnp.float32).reshape(-1, 1, 1, 1)
    return out


def reparameterized(schedule, prediction_type):
    """The SAME denoiser expressed in another parameterization.

    v  = a*eps - b*x0   with x0 = c1*x - c2*eps  (exact conversions), so a
    sampler given this model under `prediction_type` must reproduce the
    eps-model trajectories bit-for-bit up to float assoc noise.
    """

    def fn(x, t, y=None):
        eps = eps_model(x, t, y)
        x0 = base.predict_x0_from_eps(schedule, x, t, eps)
        if prediction_type == "x0":
            return x0
        a = base.extract(schedule.sqrt_alphas_cumprod, t, x.ndim)
        b = base.extract(schedule.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        return a * eps - b * x0

    return fn


def test_v_target_and_inverse_are_consistent():
    """prediction_target('v') inverts back to eps via eps_from_prediction."""
    ddpm = DDPM(num_timesteps=50)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, SHAPE)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), SHAPE)
    t = jnp.array([3, 47], dtype=jnp.int32)
    x_t = ddpm.q_sample(x0, t, noise)
    v = base.prediction_target(ddpm.schedule, x0, noise, t, "v")
    eps_back = base.eps_from_prediction(ddpm.schedule, x_t, t, v, "v")
    np.testing.assert_allclose(eps_back, noise, rtol=1e-5, atol=1e-5)
    # x0 path too
    eps_back = base.eps_from_prediction(ddpm.schedule, x_t, t, x0, "x0")
    np.testing.assert_allclose(eps_back, noise, rtol=1e-4, atol=1e-4)
    # eps target is the noise itself (reference parity)
    tgt = base.prediction_target(ddpm.schedule, x0, noise, t, "eps")
    assert tgt is noise


def test_p_losses_zero_for_exact_target_model():
    """A model that outputs the exact target has zero loss, per type."""
    rng = jax.random.PRNGKey(1)
    x0 = jax.random.normal(rng, SHAPE)
    noise = jax.random.normal(jax.random.fold_in(rng, 2), SHAPE)
    t = jnp.array([10, 30], dtype=jnp.int32)
    for ptype in ("eps", "v", "x0"):
        ddpm = DDPM(num_timesteps=50, prediction_type=ptype)
        target = base.prediction_target(ddpm.schedule, x0, noise, t, ptype)
        loss = ddpm.p_losses(lambda x, tt, yy: target, x0, t, noise)
        assert float(loss) < 1e-10, (ptype, float(loss))


@pytest.mark.parametrize("ptype", ["v", "x0"])
def test_sampler_trajectories_invariant_to_parameterization(ptype):
    """DDPM/DDIM/DPM++ give identical samples for reparameterized models."""
    rng = jax.random.PRNGKey(7)
    y = jnp.array([1, 2], dtype=jnp.int32)
    for cls, kw in (
        (DDPM, {}),
        (DDIM, {"num_inference_steps": 8}),
        (DPMSolverPP, {"num_inference_steps": 8}),
    ):
        ref = cls(num_timesteps=24, **kw)
        alt = cls(num_timesteps=24, prediction_type=ptype, **kw)
        model_alt = reparameterized(ref.schedule, ptype)

        out_ref = ref.sample(eps_model, SHAPE, rng)
        out_alt = alt.sample(model_alt, SHAPE, rng)
        np.testing.assert_allclose(
            out_alt, out_ref, rtol=2e-4, atol=2e-4,
            err_msg=f"{cls.__name__} sample() diverges under {ptype}",
        )

        cfg_ref = ref.sample_with_cfg(eps_model, SHAPE, y, rng, cfg_scale=2.0)
        cfg_alt = alt.sample_with_cfg(model_alt, SHAPE, y, rng, cfg_scale=2.0)
        np.testing.assert_allclose(
            cfg_alt, cfg_ref, rtol=2e-4, atol=2e-4,
            err_msg=f"{cls.__name__} CFG diverges under {ptype}",
        )


def test_p_sample_single_step_uses_parameterization():
    """The single-step API converts model output like the scan does."""
    ddpm_ref = DDPM(num_timesteps=24)
    ddpm_v = DDPM(num_timesteps=24, prediction_type="v")
    model_v = reparameterized(ddpm_ref.schedule, "v")
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, SHAPE)
    t = jnp.full((SHAPE[0],), 11, dtype=jnp.int32)
    step_rng = jax.random.fold_in(rng, 0)
    np.testing.assert_allclose(
        ddpm_v.p_sample(model_v, x, t, step_rng),
        ddpm_ref.p_sample(eps_model, x, t, step_rng),
        rtol=1e-5, atol=1e-5,
    )


def test_factory_passes_prediction_type():
    cfg = {
        "num_timesteps": 16, "beta_start": 1e-4, "beta_end": 0.02,
        "beta_schedule": "linear", "prediction_type": "v",
    }
    for method in ("ddpm", "ddim", "dpm++"):
        assert get_diffusion(cfg, method).prediction_type == "v"
    cfg.pop("prediction_type")
    assert get_diffusion(cfg).prediction_type == "eps"  # parity default


def test_invalid_prediction_type_rejected():
    for cls in (DDPM, DDIM, DPMSolverPP):
        with pytest.raises(ValueError):
            cls(num_timesteps=8, prediction_type="velocity")
    with pytest.raises(ValueError):
        base.prediction_target(
            DDPM(num_timesteps=8).schedule,
            jnp.zeros(SHAPE), jnp.zeros(SHAPE),
            jnp.zeros((2,), jnp.int32), "nope",
        )


def test_trainer_v_prediction_loss_decreases():
    """End-to-end: a tiny DiT trains under prediction_type 'v'."""
    from diffusion_models_collection_tpu.datasets import (
        DataLoader, DiffusionDataset, ImageTransform,
    )
    from diffusion_models_collection_tpu.factory import get_model
    from diffusion_models_collection_tpu.utils import DiffusionTrainer
    from diffusion_models_collection_tpu.utils.tracker import NullTracker

    size = (8, 8)
    config = {
        "model_type": "dit",
        "model_params": {
            "in_channels": 3, "patch_size": 4, "hidden_size": 32,
            "depth": 1, "num_heads": 4, "dropout": 0.0,
        },
        "image_size": size, "conditional": False,
        "num_timesteps": 10, "beta_start": 1e-4, "beta_end": 0.02,
        "beta_schedule": "linear", "loss_type": "l2",
        "prediction_type": "v",
        "epochs": 1, "batch_size": 8, "optimizer": "adamw",
        "learning_rate": 1e-3, "weight_decay": 1e-4,
        "gradient_accumulation_steps": 1, "use_ema": False,
        "use_scheduler": False, "cfg_dropout_prob": 0.0,
        "save_dir": "/tmp/dmc_tpu_vpred/ckpt",
        "sample_dir": "/tmp/dmc_tpu_vpred/samples",
        "sample_interval": 1000, "sample_start_epoch": 1000,
        "seed": 0, "use_swanlab": False,
    }
    model = get_model(config)
    diffusion = get_diffusion(config)
    assert diffusion.prediction_type == "v"
    ds = DiffusionDataset(
        "synthetic", conditional=False,
        transform=ImageTransform(size, train=True),
        image_size=size, n_train=32, seed=3,
    )
    loader = DataLoader(ds, batch_size=8, seed=0, prefetch=0)
    trainer = DiffusionTrainer(
        model, diffusion, loader, config=config,
        rng=jax.random.PRNGKey(0), tracker=NullTracker(),
    )
    losses = [trainer.train_epoch(e) for e in (1, 2, 3, 4)]
    assert all(np.isfinite(losses))
    assert min(losses[1:]) < losses[0], losses
