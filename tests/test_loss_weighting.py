"""SNR-based loss weighting (uniform / snr / min_snr) — extension.

The reference trains unweighted eps-MSE only (reference ddpm.py:106-140).
`loss_weighting: 'min_snr'` implements Min-SNR-gamma (Hang et al. 2023);
'snr' expresses the standard eps objective in any parameterization. The
core invariant: weightings are defined on the x0-space error and mapped
into each target space exactly, so the weighted loss VALUE is identical
across eps/v/x0 for exactly-reparameterized models (l2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.diffusion import DDIM, DDPM, DPMSolverPP
from diffusion_models_collection_tpu.diffusion import base
from diffusion_models_collection_tpu.factory import get_diffusion

SHAPE = (4, 8, 8, 3)


def _snr(schedule, t):
    acp = np.asarray(schedule.alphas_cumprod)[np.asarray(t)]
    return acp / (1.0 - acp)


def test_uniform_weights_are_ones():
    ddpm = DDPM(num_timesteps=50)
    t = jnp.array([0, 10, 49], jnp.int32)
    w = base.loss_weight(ddpm.schedule, t, "eps", "uniform")
    np.testing.assert_array_equal(np.asarray(w), 1.0)


def test_snr_weighting_is_identity_for_eps():
    """'snr' == the standard eps objective: eps weights are exactly 1."""
    ddpm = DDPM(num_timesteps=50)
    t = jnp.arange(50, dtype=jnp.int32)
    w = base.loss_weight(ddpm.schedule, t, "eps", "snr")
    np.testing.assert_allclose(np.asarray(w), 1.0, rtol=1e-6)


def test_min_snr_clips_only_high_snr_timesteps():
    """Weights equal 'snr' weights where SNR <= gamma, clipped above."""
    ddpm = DDPM(num_timesteps=100)
    t = jnp.arange(100, dtype=jnp.int32)
    gamma = 5.0
    snr = _snr(ddpm.schedule, t)
    for ptype, conv in (("eps", snr), ("v", snr + 1.0), ("x0", np.ones(100))):
        w = np.asarray(
            base.loss_weight(ddpm.schedule, t, ptype, "min_snr", gamma)
        )
        np.testing.assert_allclose(w, np.minimum(snr, gamma) / conv, rtol=1e-5)
        # early (low-t) timesteps have huge SNR -> clipped; late ones not
        assert snr[0] > gamma and snr[-1] < gamma  # schedule sanity
    # for eps, clipping strictly reduces the low-noise weights
    w_eps = np.asarray(base.loss_weight(ddpm.schedule, t, "eps", "min_snr", gamma))
    assert (w_eps[snr > gamma] < 1.0).all()
    np.testing.assert_allclose(w_eps[snr <= gamma], 1.0, rtol=1e-6)


def test_min_snr_huge_gamma_equals_snr_weighting():
    ddpm = DDPM(num_timesteps=50)
    t = jnp.arange(50, dtype=jnp.int32)
    for ptype in ("eps", "v", "x0"):
        w_inf = base.loss_weight(ddpm.schedule, t, ptype, "min_snr", 1e12)
        w_snr = base.loss_weight(ddpm.schedule, t, ptype, "snr")
        np.testing.assert_allclose(np.asarray(w_inf), np.asarray(w_snr), rtol=1e-6)


def test_per_sample_loss_mean_matches_scalar_loss():
    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, SHAPE)
    b = jax.random.normal(jax.random.fold_in(rng, 1), SHAPE)
    for lt in ("l1", "l2", "huber"):
        per = base.per_sample_loss(a, b, lt)
        assert per.shape == (SHAPE[0],)
        np.testing.assert_allclose(
            float(jnp.mean(per)), float(base.diffusion_loss(a, b, lt)),
            rtol=1e-6,
        )


def _reparameterized(schedule, ptype, eps_fn):
    def fn(x, t, y=None):
        eps = eps_fn(x, t, y)
        if ptype == "eps":
            return eps
        x0 = base.predict_x0_from_eps(schedule, x, t, eps)
        if ptype == "x0":
            return x0
        a = base.extract(schedule.sqrt_alphas_cumprod, t, x.ndim)
        b = base.extract(schedule.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        return a * eps - b * x0

    return fn


def test_weighted_loss_value_invariant_across_parameterizations():
    """min_snr l2 loss is the SAME number for eps/v/x0 views of one model.

    This is the exactness check on the conversion factors in
    `base.loss_weight` (||eps_err||^2 = SNR*||x0_err||^2 etc.).
    """
    rng = jax.random.PRNGKey(5)
    x0 = jax.random.normal(rng, SHAPE)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), SHAPE)
    t = jnp.array([2, 10, 30, 45], jnp.int32)

    def eps_fn(x, tt, yy=None):
        return jnp.tanh(x) * 0.3 + 0.7 * jnp.sin(
            tt.astype(jnp.float32)
        ).reshape(-1, 1, 1, 1)

    losses = {}
    for ptype in ("eps", "v", "x0"):
        ddpm = DDPM(
            num_timesteps=50, prediction_type=ptype,
            loss_weighting="min_snr", min_snr_gamma=5.0,
        )
        model = _reparameterized(ddpm.schedule, ptype, eps_fn)
        losses[ptype] = float(ddpm.p_losses(model, x0, t, noise))
    np.testing.assert_allclose(losses["v"], losses["eps"], rtol=1e-4)
    np.testing.assert_allclose(losses["x0"], losses["eps"], rtol=1e-4)


def test_uniform_weighting_reproduces_unweighted_loss_exactly():
    rng = jax.random.PRNGKey(9)
    x0 = jax.random.normal(rng, SHAPE)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), SHAPE)
    t = jnp.array([1, 7, 20, 40], jnp.int32)
    ref = DDPM(num_timesteps=50)
    uni = DDPM(num_timesteps=50, loss_weighting="uniform")

    def model(x, tt, yy=None):
        return 0.5 * x

    assert float(ref.p_losses(model, x0, t, noise)) == float(
        uni.p_losses(model, x0, t, noise)
    )


def test_factory_passes_loss_weighting():
    cfg = {
        "num_timesteps": 16, "beta_start": 1e-4, "beta_end": 0.02,
        "beta_schedule": "linear", "loss_weighting": "min_snr",
        "min_snr_gamma": 3.0,
    }
    for method in ("ddpm", "ddim", "dpm++"):
        d = get_diffusion(cfg, method)
        assert d.loss_weighting == "min_snr" and d.min_snr_gamma == 3.0
    cfg.pop("loss_weighting")
    cfg.pop("min_snr_gamma")
    assert get_diffusion(cfg).loss_weighting == "uniform"  # parity default


def test_invalid_weighting_rejected():
    for cls in (DDPM, DDIM, DPMSolverPP):
        with pytest.raises(ValueError):
            cls(num_timesteps=8, loss_weighting="p2")
    with pytest.raises(ValueError):
        base.loss_weight(
            DDPM(num_timesteps=8).schedule,
            jnp.zeros((2,), jnp.int32), "eps", "nope",
        )


def test_flow_matching_rejects_snr_weighting():
    cfg = {
        "diffusion_type": "flow_matching", "num_timesteps": 16,
        "loss_weighting": "min_snr",
    }
    with pytest.raises(ValueError):
        get_diffusion(cfg)


def test_trainer_min_snr_loss_decreases():
    """End-to-end: a tiny DiT trains under min_snr weighting."""
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
        "loss_weighting": "min_snr", "min_snr_gamma": 5.0,
        "epochs": 1, "batch_size": 8, "optimizer": "adamw",
        "learning_rate": 1e-3, "weight_decay": 1e-4,
        "gradient_accumulation_steps": 1, "use_ema": False,
        "use_scheduler": False, "cfg_dropout_prob": 0.0,
        "save_dir": "/tmp/dmc_tpu_minsnr/ckpt",
        "sample_dir": "/tmp/dmc_tpu_minsnr/samples",
        "sample_interval": 1000, "sample_start_epoch": 1000,
        "seed": 0, "use_swanlab": False,
    }
    model = get_model(config)
    diffusion = get_diffusion(config)
    assert diffusion.loss_weighting == "min_snr"
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
