"""EDM (Karras et al. 2022) — extension beyond the reference.

Preconditioned denoiser D = c_skip*y + c_out*F(c_in*y, t(sigma)),
log-normal sigma training with lambda(sigma) weighting, and the Heun
sampler with optional stochastic churn over the Karras grid. The class
exposes the DDPM/DDIM API surface so the trainer/CLIs/serving work
unchanged via `diffusion_type: 'edm'`.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.diffusion import EDM
from diffusion_models_collection_tpu.diffusion.edm import _cfg_denoised
from diffusion_models_collection_tpu.factory import get_diffusion

SHAPE = (2, 8, 8, 3)
KW = dict(num_timesteps=64)


def _sigma_from_t_in(d, t_in):
    """Invert the network noise-input mapping t(sigma)."""
    lo, hi = math.log(d.sigma_min), math.log(d.sigma_max)
    return jnp.exp(lo + t_in / (d.num_timesteps - 1) * (hi - lo))


def _exact_F(d, target):
    """The raw-network F whose preconditioned D is exactly `target`
    (Bayes-optimal for a point-mass dataset): invert
    D = c_skip*y + c_out*F with y = x_in / c_in."""

    def fn(x_in, t_in, y=None):
        sigma = _sigma_from_t_in(d, t_in).reshape(
            -1, *((1,) * (x_in.ndim - 1))
        )
        sd2 = d.sigma_data**2
        denom = sigma**2 + sd2
        c_skip = sd2 / denom
        c_out = sigma * d.sigma_data / jnp.sqrt(denom)
        c_in = 1.0 / jnp.sqrt(denom)
        return (target - c_skip * (x_in / c_in)) / c_out

    return jax.tree_util.Partial(fn)


def test_sigma_of_t_is_stratified_lognormal():
    d = EDM(**KW)
    t = jnp.arange(d.num_timesteps, dtype=jnp.int32)
    sig = np.asarray(d.sigma_of_t(t))
    assert (np.diff(sig) > 0).all()  # monotone in t (inverse CDF)
    # median of ln sigma == P_mean at the middle bin
    mid = sig[d.num_timesteps // 2]
    np.testing.assert_allclose(math.log(mid), d.p_mean, atol=0.1)
    # ~68% of draws inside one P_std of the mean
    frac = np.mean(np.abs(np.log(sig) - d.p_mean) <= d.p_std)
    assert 0.6 < frac < 0.76


def test_karras_grid_properties():
    d = EDM(num_inference_steps=12, **KW)
    sig = np.asarray(d.sigmas)
    assert sig.shape == (12,)
    np.testing.assert_allclose(sig[0], d.sigma_max, rtol=1e-5)
    np.testing.assert_allclose(sig[-1], d.sigma_min, rtol=1e-5)
    assert (np.diff(sig) < 0).all()
    # eq. 5 exact at an interior point
    inv = 1.0 / d.rho
    expect = (
        d.sigma_max**inv + 5 / 11 * (d.sigma_min**inv - d.sigma_max**inv)
    ) ** d.rho
    np.testing.assert_allclose(sig[5], expect, rtol=1e-5)
    d.set_inference_steps(7)
    assert np.asarray(d.sigmas).shape == (7,)


def test_loss_weight_is_unit_in_F_space():
    """lambda(sigma) * c_out(sigma)^2 == 1 exactly (eq. 8 discussion)."""
    d = EDM(**KW)
    sigma = np.asarray(d.sigma_of_t(jnp.arange(0, 64, 7)))
    sd2 = d.sigma_data**2
    lam = (sigma**2 + sd2) / (sigma * d.sigma_data) ** 2
    c_out2 = sigma**2 * sd2 / (sigma**2 + sd2)
    np.testing.assert_allclose(lam * c_out2, 1.0, rtol=1e-6)


def test_denoiser_preconditioning_limits():
    """sigma -> 0: D(y) -> y (c_skip -> 1, c_out -> 0)."""
    d = EDM(**KW)

    def big_F(x_in, t_in, y=None):
        return 100.0 * jnp.ones_like(x_in)

    den = d.denoiser_fn(big_F)
    x = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    tiny = jnp.full((SHAPE[0],), d.sigma_min, jnp.float32)
    out = np.asarray(den(x, tiny, None))
    # c_out at sigma_min is ~sigma_min, so even a 100-unit F barely moves D
    np.testing.assert_allclose(out, np.asarray(x), atol=1.0)
    big = jnp.full((SHAPE[0],), d.sigma_max, jnp.float32)
    out_hi = np.asarray(den(jnp.zeros(SHAPE), big, None))
    # c_skip at sigma_max ~ 0: D is dominated by c_out * F ~ sigma_data * F
    np.testing.assert_allclose(out_hi, 100.0 * d.sigma_data, rtol=0.01)


def test_p_losses_zero_for_exact_denoiser():
    d = EDM(**KW)
    target = 0.3 * jnp.ones(SHAPE)
    rng = jax.random.PRNGKey(1)
    t = jnp.array([5, 50], jnp.int32)
    noise = jax.random.normal(rng, SHAPE)
    loss = d.p_losses(_exact_F(d, target), target, t, noise)
    assert float(loss) < 1e-8


def test_exact_recovery_point_mass():
    """With the exact denoiser the final (sigma -> 0) Euler step lands on
    the target EXACTLY, for any step count."""
    for steps in (2, 8):
        d = EDM(num_inference_steps=steps, **KW)
        target = 0.4 * jnp.ones(SHAPE)
        out = d.sample(_exact_F(d, target), SHAPE, jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(out), 0.4, atol=1e-4)


def test_churn_changes_trajectory_but_stays_deterministic():
    target = 0.2 * jnp.ones(SHAPE)

    def noisy_F(d):
        # slightly wrong denoiser so churn has something to change
        def fn(x_in, t_in, y=None):
            return _exact_F(d, target)(x_in, t_in, y) + 0.05 * jnp.sin(x_in)
        return jax.tree_util.Partial(fn)

    plain = EDM(num_inference_steps=8, **KW)
    churny = EDM(num_inference_steps=8, s_churn=10.0, s_noise=1.003, **KW)
    rng = jax.random.PRNGKey(3)
    out_p = plain.sample(noisy_F(plain), SHAPE, rng)
    out_c1 = churny.sample(noisy_F(churny), SHAPE, rng)
    out_c2 = churny.sample(noisy_F(churny), SHAPE, rng)
    assert not np.allclose(np.asarray(out_p), np.asarray(out_c1))
    np.testing.assert_array_equal(np.asarray(out_c1), np.asarray(out_c2))
    # churn gates on [s_min, s_max]: an empty window reproduces plain
    gated = EDM(num_inference_steps=8, s_churn=10.0, s_min=1e9, **KW)
    out_g = gated.sample(noisy_F(gated), SHAPE, rng)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_g))


def test_cfg_guided_denoised_semantics():
    d = EDM(**KW)
    w = jax.random.normal(jax.random.PRNGKey(4), (11, SHAPE[-1]))

    def dfn(x, sigma, y):
        shift = w[y].reshape(x.shape[0], 1, 1, SHAPE[-1])
        return jnp.tanh(x) * 0.3 + shift

    x = jax.random.normal(jax.random.PRNGKey(5), SHAPE)
    sigma = jnp.full((SHAPE[0],), 1.0, jnp.float32)
    y = jnp.array([2, 3], jnp.int32)
    d_c = dfn(x, sigma, y)
    d_u = dfn(x, sigma, jnp.zeros_like(y))
    got = _cfg_denoised(
        jax.tree_util.Partial(dfn), x, sigma, y, jnp.float32(2.5), 0.0
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(d_u + 2.5 * (d_c - d_u)),
        rtol=1e-5, atol=1e-6,
    )
    # guidance_rescale phi=1 pulls std back to the conditional branch's
    got_r = _cfg_denoised(
        jax.tree_util.Partial(dfn), x, sigma, y, jnp.float32(7.0), 1.0
    )
    axes = (1, 2, 3)
    np.testing.assert_allclose(
        np.asarray(jnp.std(got_r, axis=axes)),
        np.asarray(jnp.std(d_c, axis=axes)),
        rtol=1e-5,
    )


def test_sample_with_cfg_end_to_end():
    d = EDM(num_inference_steps=6, **KW)
    w = jax.random.normal(jax.random.PRNGKey(6), (11, SHAPE[-1]))

    def F(x_in, t_in, y=None):
        yy = jnp.zeros((x_in.shape[0],), jnp.int32) if y is None else y
        shift = w[yy].reshape(x_in.shape[0], 1, 1, SHAPE[-1])
        return jnp.tanh(x_in) * 0.3 + shift

    y = jnp.array([1, 2], jnp.int32)
    out = d.sample_with_cfg(
        jax.tree_util.Partial(F), SHAPE, y, jax.random.PRNGKey(7),
        cfg_scale=3.0,
    )
    assert out.shape == SHAPE and np.isfinite(np.asarray(out)).all()
    # guidance_rescale plumb: phi = 0 object is bit-identical, phi > 0 not
    d0 = EDM(num_inference_steps=6, guidance_rescale=0.0, **KW)
    dr = EDM(num_inference_steps=6, guidance_rescale=0.8, **KW)
    out0 = d0.sample_with_cfg(
        jax.tree_util.Partial(F), SHAPE, y, jax.random.PRNGKey(7),
        cfg_scale=3.0,
    )
    outr = dr.sample_with_cfg(
        jax.tree_util.Partial(F), SHAPE, y, jax.random.PRNGKey(7),
        cfg_scale=3.0,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out0))
    assert not np.allclose(np.asarray(out), np.asarray(outr))


def test_img2img_semantics():
    d = EDM(num_inference_steps=8, **KW)
    target = 0.1 * jnp.ones(SHAPE)
    F = _exact_F(d, target)
    init = 0.5 * jnp.ones(SHAPE)
    rng = jax.random.PRNGKey(8)
    # strength 0: identity
    np.testing.assert_array_equal(
        np.asarray(d.img2img(F, init, rng, strength=0.0)),
        np.asarray(init),
    )
    # full strength with the exact denoiser: recovers the point mass
    out = d.img2img(F, init, rng, strength=1.0)
    np.testing.assert_allclose(np.asarray(out), 0.1, atol=1e-4)
    # mask keeping everything returns the original exactly
    keep_all = d.img2img(F, init, rng, strength=0.7,
                         mask=jnp.zeros(SHAPE))
    np.testing.assert_allclose(np.asarray(keep_all), 0.5, atol=1e-5)


def test_init_noise_determinism():
    d = EDM(num_inference_steps=5, **KW)
    target = 0.3 * jnp.ones(SHAPE)
    F = _exact_F(d, target)
    n = jax.random.normal(jax.random.PRNGKey(9), SHAPE)
    a = d.sample(F, SHAPE, jax.random.PRNGKey(0), init_noise=n)
    b = d.sample(F, SHAPE, jax.random.PRNGKey(1), init_noise=n)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_factory_dispatch_and_validation():
    cfg = dict(num_timesteps=64, diffusion_type="edm",
               num_inference_steps=9, sigma_data=0.4, s_churn=5.0)
    d = get_diffusion(cfg)
    assert isinstance(d, EDM)
    assert d.num_inference_steps == 9 and d.sigma_data == 0.4
    assert d.s_churn == 5.0
    # sampling_method is overridden by the diffusion_type (like flow)
    assert isinstance(get_diffusion(cfg, "ddim"), EDM)
    with pytest.raises(ValueError, match="loss_weighting"):
        get_diffusion(dict(cfg, loss_weighting="min_snr"))
    with pytest.raises(ValueError, match="prediction_type"):
        get_diffusion(dict(cfg, prediction_type="v"))
    with pytest.raises(ValueError):
        EDM(num_timesteps=64, sigma_min=1.0, sigma_max=0.5)
    with pytest.raises(ValueError):
        EDM(num_timesteps=64, s_churn=-1.0)


def test_trainer_edm_end_to_end(tmp_path):
    """A tiny UNet trains under the EDM objective; in-training sampling
    goes through EDM.sample_with_cfg unchanged."""
    from diffusion_models_collection_tpu.datasets import (
        DataLoader, DiffusionDataset, ImageTransform,
    )
    from diffusion_models_collection_tpu.factory import get_model
    from diffusion_models_collection_tpu.utils import DiffusionTrainer
    from diffusion_models_collection_tpu.utils.tracker import NullTracker

    size = (8, 8)
    config = {
        "model_type": "unet",
        "model_params": {
            "in_channels": 3, "model_channels": 16, "out_channels": 3,
            "num_res_blocks": 1, "attention_resolutions": (4,),
            "channel_mult": (1, 2), "dropout": 0.0,
        },
        "image_size": size, "conditional": True, "num_classes": 10,
        "num_timesteps": 50, "beta_start": 1e-4, "beta_end": 0.02,
        "beta_schedule": "linear", "loss_type": "l2",
        "diffusion_type": "edm", "num_inference_steps": 4,
        "cfg_scale": 2.0,
        "epochs": 1, "batch_size": 8, "optimizer": "adamw",
        "learning_rate": 1e-3, "weight_decay": 1e-4,
        "gradient_accumulation_steps": 1, "use_ema": True,
        "ema_decay": 0.99, "use_scheduler": False, "cfg_dropout_prob": 0.1,
        "save_dir": str(tmp_path / "ckpt"),
        "sample_dir": str(tmp_path / "samples"),
        "sample_interval": 1000, "sample_start_epoch": 1000,
        "seed": 0, "use_swanlab": False,
    }
    model = get_model(config)
    diffusion = get_diffusion(config)
    assert isinstance(diffusion, EDM)
    ds = DiffusionDataset(
        "synthetic", conditional=True,
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
    samples = trainer.sample_images(epoch=1, num_samples=4)
    assert samples.shape == (4, size[0], size[1], 3)
    assert np.isfinite(samples).all()
