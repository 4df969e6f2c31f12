"""Classifier guidance (Dhariwal & Nichol 2021, extension beyond the
reference): the noise-conditional classifier model, its trainer, the
analytic guidance math, guided-sampling behavior, and the CLI."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusion_models_collection_tpu.diffusion import DDIM, DDPM
from diffusion_models_collection_tpu.diffusion.guidance import (
    classifier_guided_model_fn,
)
from diffusion_models_collection_tpu.diffusion.schedule import extract
from diffusion_models_collection_tpu.factory import get_model


# ------------------------------------------------------------------ model
def test_classifier_model_shapes_and_factory():
    cfg = {
        "model_type": "classifier",
        "image_size": (8, 8),
        "conditional": True,
        "num_classes": 5,
        "model_params": {
            "in_channels": 3, "model_channels": 8, "num_res_blocks": 1,
            "attention_resolutions": (), "channel_mult": (1, 2),
        },
    }
    model = get_model(cfg)
    assert model.num_classes == 5
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
        jnp.zeros((1,), jnp.int32),
    )
    logits = model.apply(variables, jnp.zeros((4, 8, 8, 3)),
                         jnp.zeros((4,), jnp.int32))
    assert logits.shape == (4, 5)
    assert logits.dtype == jnp.float32

    with pytest.raises(ValueError, match="num_classes"):
        get_model({**cfg, "num_classes": 0})
    with pytest.raises(ValueError, match="classifier"):
        get_model({**cfg, "super_resolution": {"factor": 2}})


# --------------------------------------------------------------- guidance
def quadratic_classifier(mus):
    """Analytic 'classifier': log p(y|x) = -||x - mu_y||^2 / 2 + const
    (a softmax over quadratic energies); its exact class-score is
    grad_x log p(y|x) = (mu_y - x) + softmax-weighted mean correction."""
    mus = jnp.asarray(mus, jnp.float32)  # (K, H, W, C)

    def fn(x, t):
        # logits_k = -||x - mu_k||^2 / 2, per sample
        d = x[:, None] - mus[None]  # (B, K, H, W, C)
        return -0.5 * jnp.sum(d * d, axis=(2, 3, 4))

    return jax.tree_util.Partial(fn)


def test_guidance_shifts_eps_by_classifier_score():
    """eps' == eps - s * sqrt(1-acp_t) * grad log softmax(logits)[y],
    verified against an independent finite-computation of the gradient."""
    ddpm = DDPM(num_timesteps=20)
    K, shape = 3, (2, 4, 4, 3)
    rng = np.random.default_rng(0)
    mus = rng.normal(size=(K, 4, 4, 3)).astype(np.float32)
    cls = quadratic_classifier(mus)
    base_eps = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    def model_fn(x, t, y):
        return base_eps

    y_target = jnp.asarray([0, 2])
    scale = 2.5
    guided = classifier_guided_model_fn(
        jax.tree_util.Partial(model_fn), cls, y_target, scale,
        ddpm.schedule,
    )
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    t = jnp.asarray([3, 15])
    out = guided(x, t, None)

    def log_prob_sum(xx):
        logp = jax.nn.log_softmax(cls(xx, t), axis=-1)
        return jnp.sum(jnp.take_along_axis(logp, y_target[:, None], 1))

    g = jax.grad(log_prob_sum)(x)
    s = extract(ddpm.schedule.sqrt_one_minus_alphas_cumprod, t, 4)
    expect = base_eps - scale * s * g
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-5, atol=1e-6)


def test_guidance_scale_zero_is_identity():
    ddpm = DDPM(num_timesteps=20)
    cls = quadratic_classifier(np.zeros((2, 4, 4, 3), np.float32))

    def model_fn(x, t, y):
        return jnp.tanh(x)

    guided = classifier_guided_model_fn(
        jax.tree_util.Partial(model_fn), cls, jnp.asarray([0, 1]), 0.0,
        ddpm.schedule,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3))
    t = jnp.asarray([5, 9])
    np.testing.assert_allclose(np.asarray(guided(x, t, None)),
                               np.asarray(jnp.tanh(x)), atol=1e-7)


def test_guidance_tiles_labels_for_fused_cfg_batch():
    ddpm = DDPM(num_timesteps=20)
    K = 4
    mus = np.stack([np.full((4, 4, 3), 0.2 * k, np.float32)
                    for k in range(K)])
    cls = quadratic_classifier(mus)

    def model_fn(x, t, y):
        return jnp.zeros_like(x)

    y_target = jnp.asarray([1, 3])
    guided = classifier_guided_model_fn(
        jax.tree_util.Partial(model_fn), cls, y_target, 1.0, ddpm.schedule,
    )
    x2 = jnp.zeros((4, 4, 4, 3))  # fused-CFG 2B batch
    t2 = jnp.asarray([5, 5, 5, 5])
    out = guided(x2, t2, None)
    # the same target class guides both halves identically
    np.testing.assert_allclose(np.asarray(out[:2]), np.asarray(out[2:]),
                               atol=1e-6)
    with pytest.raises(ValueError, match="multiple"):
        guided(jnp.zeros((3, 4, 4, 3)), jnp.zeros((3,), jnp.int32), None)


@pytest.mark.parametrize("sampler", ["ddpm", "ddim"])
def test_guided_sampling_pulls_toward_class_mean(sampler):
    """An unconditional point-mass model at 0 + a quadratic classifier
    with class means at ±mu: guidance moves samples toward the target
    class's mean, monotonically in scale."""
    num_t = 50
    diffusion = (
        DDPM(num_timesteps=num_t) if sampler == "ddpm"
        else DDIM(num_timesteps=num_t, num_inference_steps=25)
    )
    shape = (4, 4, 4, 3)
    mus = np.stack([np.full((4, 4, 3), -0.6, np.float32),
                    np.full((4, 4, 3), 0.6, np.float32)])
    cls = quadratic_classifier(mus)

    # exact eps model for a point mass at 0: eps = x_t / sqrt(1 - acp_t)
    def model_fn(x, t, y):
        s = extract(diffusion.schedule.sqrt_one_minus_alphas_cumprod,
                    t, x.ndim)
        return x / s

    y_target = jnp.asarray([1, 1, 1, 1])
    means = []
    for scale in (0.0, 1.0, 3.0):
        guided = classifier_guided_model_fn(
            jax.tree_util.Partial(model_fn), cls, y_target, scale,
            diffusion.schedule,
        )
        out = diffusion.sample(guided, shape, jax.random.PRNGKey(2))
        means.append(float(jnp.mean(out)))
    assert means[0] == pytest.approx(0.0, abs=0.05)
    assert means[0] < means[1] < means[2], means
    # and toward the OTHER class it moves the other way
    guided_neg = classifier_guided_model_fn(
        jax.tree_util.Partial(model_fn), cls,
        jnp.zeros((4,), jnp.int32), 3.0, diffusion.schedule,
    )
    out_neg = diffusion.sample(guided_neg, shape, jax.random.PRNGKey(2))
    assert float(jnp.mean(out_neg)) < means[0]


# ---------------------------------------------------------------- trainer
def test_classifier_trainer_learns(tmp_path):
    from diffusion_models_collection_tpu.datasets import (
        DataLoader,
        DiffusionDataset,
        ImageTransform,
    )
    from diffusion_models_collection_tpu.utils.classifier_trainer import (
        ClassifierTrainer,
    )
    from diffusion_models_collection_tpu.utils.tracker import NullTracker

    cfg = {
        "model_type": "classifier",
        "model_params": {
            "in_channels": 3, "model_channels": 16, "num_res_blocks": 1,
            "attention_resolutions": (), "channel_mult": (1, 2),
            "dropout": 0.0,
        },
        "image_size": (8, 8),
        "conditional": True,
        "num_classes": 4,
        "num_timesteps": 10,
        "beta_start": 1e-4,
        "beta_end": 0.02,
        "beta_schedule": "linear",
        "epochs": 4,
        "batch_size": 32,
        "optimizer": "adamw",
        "learning_rate": 2e-3,
        "weight_decay": 0.0,
        "gradient_accumulation_steps": 1,
        "use_ema": True,
        "ema_decay": 0.9,
        "use_scheduler": False,
        "save_dir": str(tmp_path / "ckpt"),
        "save_interval": 10,
        "seed": 0,
        "use_swanlab": False,
    }
    model = get_model(cfg)
    ds = DiffusionDataset(
        "synthetic", conditional=True,
        transform=ImageTransform((8, 8), train=True),
        image_size=(8, 8), num_classes=4, n_train=128,
    )
    loader = DataLoader(ds, batch_size=32, seed=0, prefetch=0)
    trainer = ClassifierTrainer(model, loader, config=cfg,
                                tracker=NullTracker())
    first_loss, first_acc = trainer.train_epoch(1)
    for e in range(2, 7):
        last_loss, last_acc = trainer.train_epoch(e)
    assert last_loss < first_loss
    assert last_acc > 0.3  # 4 classes, chance = 0.25

    trainer.save_checkpoint(epoch=1)
    from diffusion_models_collection_tpu.utils import load_checkpoint

    payload = load_checkpoint(str(tmp_path / "ckpt" / "current_model.ckpt"))
    assert payload["config"]["model_type"] == "classifier"


def test_classifier_trainer_validation(tmp_path):
    from diffusion_models_collection_tpu.utils.classifier_trainer import (
        ClassifierTrainer,
    )

    with pytest.raises(ValueError, match="conditional"):
        ClassifierTrainer(None, None, config={"conditional": False})
    with pytest.raises(ValueError, match="num_classes"):
        ClassifierTrainer(
            None, None,
            config={"conditional": True, "num_classes": 1},
        )
