"""KL-VAE model + trainer (stage 1 of latent diffusion — extension
beyond the reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.models.vae import VAE, kl_divergence
from diffusion_models_collection_tpu.utils.vae_trainer import (
    VAETrainer, init_vae_params,
)

SIZE = (8, 8)


def tiny_vae(**kw):
    defaults = dict(
        image_size=SIZE, in_channels=3, base_channels=8,
        channel_mult=(1, 2), latent_channels=2, num_res_blocks=1,
    )
    defaults.update(kw)
    return VAE(**defaults)


def test_geometry():
    v = tiny_vae()
    assert v.downsample_factor == 2
    assert v.latent_hw() == (4, 4)
    deep = tiny_vae(channel_mult=(1, 1, 2))
    assert deep.downsample_factor == 4 and deep.latent_hw() == (2, 2)
    with pytest.raises(ValueError, match="divisible"):
        tiny_vae(image_size=(6, 6), channel_mult=(1, 1, 2)).latent_hw()


def test_forward_shapes_and_reparam():
    v = tiny_vae()
    params = init_vae_params(v, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    noise = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 2))
    recon, mean, logvar = v.apply({"params": params}, x, noise)
    assert recon.shape == x.shape
    assert mean.shape == (2, 4, 4, 2) and logvar.shape == (2, 4, 4, 2)
    assert np.isfinite(np.asarray(recon)).all()
    # logvar is clamped to the LDM range
    assert (np.asarray(logvar) >= -30.0).all()
    assert (np.asarray(logvar) <= 20.0).all()
    # zero noise selects the posterior mode: forward == decode(encode.mean)
    recon0, _, _ = v.apply({"params": params}, x, jnp.zeros_like(noise))
    m, _ = v.apply({"params": params}, x, method=v.encode)
    dec = v.apply({"params": params}, m, method=v.decode)
    np.testing.assert_allclose(
        np.asarray(recon0), np.asarray(dec), rtol=1e-5, atol=1e-6
    )


def test_kl_divergence_math():
    z = jnp.zeros((2, 4, 4, 2))
    assert float(kl_divergence(z, z)) == 0.0  # N(0,1) vs N(0,1)
    # KL grows with |mean| and with var away from 1
    assert float(kl_divergence(z + 1.0, z)) == pytest.approx(0.5)
    assert float(kl_divergence(z, z + 1.0)) > 0.0
    assert float(kl_divergence(z, z - 1.0)) > 0.0


def _trainer(tmp_path, **overrides):
    from diffusion_models_collection_tpu.datasets import (
        DataLoader, DiffusionDataset, ImageTransform,
    )
    from diffusion_models_collection_tpu.utils.tracker import NullTracker

    config = {
        "model_type": "vae",
        "model_params": {
            "in_channels": 3, "base_channels": 8, "channel_mult": (1, 2),
            "latent_channels": 2, "num_res_blocks": 1,
        },
        "image_size": SIZE,
        "kl_weight": 1e-4,
        "epochs": 1, "batch_size": 8, "optimizer": "adamw",
        "learning_rate": 2e-3, "weight_decay": 0.0,
        "gradient_accumulation_steps": 1, "use_ema": True,
        "ema_decay": 0.99, "use_scheduler": False,
        "save_dir": str(tmp_path / "ckpt"),
        "sample_dir": str(tmp_path / "recon"),
        "save_interval": 100, "sample_interval": 1,
        "sample_start_epoch": 1, "num_samples": 4,
        "seed": 0, "use_swanlab": False,
    }
    config.update(overrides)
    from diffusion_models_collection_tpu.factory import get_model

    model = get_model(config)
    assert isinstance(model, VAE)
    ds = DiffusionDataset(
        "synthetic", conditional=False,
        transform=ImageTransform(SIZE, train=True),
        image_size=SIZE, n_train=32, seed=3,
    )
    loader = DataLoader(ds, batch_size=8, seed=0, prefetch=0)
    return VAETrainer(model, loader, config=config,
                      rng=jax.random.PRNGKey(0), tracker=NullTracker())


def test_trainer_loss_decreases_and_recon_grid(tmp_path):
    trainer = _trainer(tmp_path)
    losses = [trainer.train_epoch(e)[0] for e in (1, 2, 3, 4)]
    assert all(np.isfinite(losses))
    assert min(losses[1:]) < losses[0], losses
    images = next(iter(trainer.train_loader))[0]
    grid = trainer.reconstruction_grid(1, images)
    assert grid.shape[0] == 2 * min(len(images), trainer.num_samples)
    assert (tmp_path / "recon" / "vae_epoch_0001.png").exists()


def test_remat_trains(tmp_path):
    """remat: true must survive the jitted train step (nn.remat needs
    static_argnums for the bool train arg — review finding)."""
    trainer = _trainer(tmp_path, model_params={
        "in_channels": 3, "base_channels": 8, "channel_mult": (1, 2),
        "latent_channels": 2, "num_res_blocks": 1,
    }, remat=True)
    assert trainer.model.remat
    loss, rec, kl = trainer.train_epoch(1)
    assert np.isfinite(loss) and np.isfinite(rec) and np.isfinite(kl)


def test_trainer_checkpoint_roundtrip(tmp_path):
    trainer = _trainer(tmp_path)
    trainer.train_epoch(1)
    trainer.best_loss = 0.5
    trainer.save_checkpoint(epoch=1, is_best=True)
    assert (tmp_path / "ckpt" / "current_model.ckpt").exists()
    assert (tmp_path / "ckpt" / "best_model.ckpt").exists()

    fresh = _trainer(tmp_path)
    fresh.load_checkpoint(tmp_path / "ckpt" / "current_model.ckpt")
    assert fresh.start_epoch == 2
    a = jax.tree_util.tree_leaves(trainer.state.params)
    b = jax.tree_util.tree_leaves(fresh.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
