"""Latent diffusion (stage 2): frozen-VAE codec + trainer/CLI wiring —
extension beyond the reference (pixel-space only)."""

import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.factory import get_diffusion, get_model
from diffusion_models_collection_tpu.models import UNet, VAE
from diffusion_models_collection_tpu.utils.latent import LatentCodec

REPO = Path(__file__).resolve().parent.parent
SIZE = (8, 8)

VAE_CONFIG = {
    "model_type": "vae",
    "model_params": {
        "in_channels": 3, "base_channels": 8, "channel_mult": (1, 2),
        "latent_channels": 2, "num_res_blocks": 1,
    },
    "image_size": SIZE,
    "kl_weight": 1e-4,
    "epochs": 1, "batch_size": 8, "optimizer": "adamw",
    "learning_rate": 2e-3, "weight_decay": 0.0,
    "gradient_accumulation_steps": 1, "use_ema": False,
    "use_scheduler": False, "save_interval": 100,
    "sample_interval": 1000, "sample_start_epoch": 1000,
    "seed": 0, "use_swanlab": False,
}


@pytest.fixture(scope="module")
def vae_ckpt(tmp_path_factory):
    """A briefly-trained tiny VAE checkpoint shared by the module."""
    from diffusion_models_collection_tpu.datasets import (
        DataLoader, DiffusionDataset, ImageTransform,
    )
    from diffusion_models_collection_tpu.utils.tracker import NullTracker
    from diffusion_models_collection_tpu.utils.vae_trainer import VAETrainer

    wd = tmp_path_factory.mktemp("vae")
    cfg = dict(VAE_CONFIG, save_dir=str(wd / "ckpt"),
               sample_dir=str(wd / "recon"))
    model = get_model(cfg)
    ds = DiffusionDataset(
        "synthetic", conditional=False,
        transform=ImageTransform(SIZE, train=True),
        image_size=SIZE, n_train=32, seed=3,
    )
    loader = DataLoader(ds, batch_size=8, seed=0, prefetch=0)
    trainer = VAETrainer(model, loader, config=cfg,
                         rng=jax.random.PRNGKey(0), tracker=NullTracker())
    trainer.train_epoch(1)
    trainer.save_checkpoint(epoch=1)
    return wd / "ckpt" / "current_model.ckpt"


def _ld_config(vae_ckpt, **overrides):
    cfg = {
        "model_type": "unet",
        "model_params": {
            "model_channels": 16, "num_res_blocks": 1,
            "attention_resolutions": (2,), "channel_mult": (1, 2),
            "dropout": 0.0,
        },
        "latent_diffusion": True,
        "vae_checkpoint": str(vae_ckpt),
        "latent_scale_factor": 1.0,
        "image_size": SIZE, "conditional": True, "num_classes": 10,
        "num_timesteps": 50, "beta_start": 1e-4, "beta_end": 0.02,
        "beta_schedule": "linear", "loss_type": "l2",
        "cfg_scale": 2.0, "cfg_dropout_prob": 0.1,
        "num_inference_steps": 4,
        "epochs": 1, "batch_size": 8, "optimizer": "adamw",
        "learning_rate": 1e-3, "weight_decay": 0.0,
        "gradient_accumulation_steps": 1, "use_ema": True,
        "ema_decay": 0.99, "use_scheduler": False,
        "save_interval": 100, "sample_interval": 1000,
        "sample_start_epoch": 1000, "num_samples": 4,
        "seed": 0, "use_swanlab": False,
    }
    cfg.update(overrides)
    return cfg


def test_codec_gating_and_validation(vae_ckpt, tmp_path):
    assert LatentCodec.from_config({"latent_diffusion": False}) is None
    with pytest.raises(ValueError, match="vae_checkpoint"):
        LatentCodec.from_config({"latent_diffusion": True})
    with pytest.raises(ValueError, match="positive"):
        LatentCodec(str(vae_ckpt), scale_factor=0.0)
    # a non-VAE checkpoint is rejected by model_type
    from diffusion_models_collection_tpu.utils import checkpoint as ckpt_lib

    bad = tmp_path / "not_vae.ckpt"
    ckpt_lib.save_checkpoint(
        bad, epoch=1, params={"w": np.zeros(2)}, opt_state=None,
        best_loss=1.0, config={"model_type": "unet"},
    )
    with pytest.raises(ValueError, match="not a VAE checkpoint"):
        LatentCodec(str(bad))


def test_codec_shapes_and_scale(vae_ckpt):
    codec = LatentCodec(str(vae_ckpt), scale_factor=2.0)
    assert codec.latent_hw() == (4, 4)
    assert codec.latent_channels == 2
    assert codec.latent_shape(3) == (3, 4, 4, 2)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 8, 3))
    z = codec.encode_mode(x)
    assert z.shape == (3, 4, 4, 2)
    # scale multiplies the encoded latent linearly...
    base = LatentCodec(str(vae_ckpt), scale_factor=1.0)
    np.testing.assert_allclose(
        np.asarray(z), 2.0 * np.asarray(base.encode_mode(x)),
        rtol=1e-5, atol=1e-6,
    )
    # ...and decode inverts it: decode(encode) is scale-invariant
    np.testing.assert_allclose(
        np.asarray(codec.decode(z)),
        np.asarray(base.decode(base.encode_mode(x))),
        rtol=1e-4, atol=1e-5,
    )
    # stochastic encode: different rng -> different z, finite
    z1 = codec.encode(x, jax.random.PRNGKey(1))
    z2 = codec.encode(x, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(z1)).all()
    assert not np.allclose(np.asarray(z1), np.asarray(z2))
    # trajectory decode flattens (T, B, ...) correctly
    traj = jnp.stack([z, z1], axis=0)
    dec = codec.decode_trajectory(traj)
    assert dec.shape == (2, 3, 8, 8, 3)
    np.testing.assert_allclose(
        np.asarray(dec[0]), np.asarray(codec.decode(z)), rtol=1e-5,
        atol=1e-6,
    )


def test_get_model_derives_latent_geometry(vae_ckpt):
    cfg = _ld_config(vae_ckpt)
    model = get_model(cfg)
    assert isinstance(model, UNet)
    assert model.image_size == (4, 4)
    assert model.in_channels == 2 and model.out_channels == 2
    with pytest.raises(ValueError, match="conflicts"):
        bad = _ld_config(vae_ckpt)
        bad["model_params"] = dict(bad["model_params"], in_channels=3)
        get_model(bad)


def test_latent_configs_disable_sample_clipping(vae_ckpt):
    """Latents are unbounded: factory must turn off the pixel [-1, 1]
    clamp / dynamic thresholding for every process class under
    latent_diffusion (review finding: clipping corrupted every latent
    sample), while pixel configs keep reference-parity clipping."""
    base_keys = dict(num_timesteps=20, beta_start=1e-4, beta_end=0.02,
                     beta_schedule="linear")
    latent = dict(base_keys, latent_diffusion=True,
                  vae_checkpoint=str(vae_ckpt))
    for method in ("ddpm", "ddim", "dpm++"):
        assert get_diffusion(dict(base_keys), method).clip_sample is True
        assert get_diffusion(latent, method).clip_sample is False
    assert get_diffusion(
        dict(base_keys, diffusion_type="flow_matching")
    ).clip_sample is True
    assert get_diffusion(
        dict(latent, diffusion_type="flow_matching")
    ).clip_sample is False
    assert get_diffusion(
        dict(latent, diffusion_type="edm")
    ).clip_sample is False
    # explicit key wins either way
    assert get_diffusion(dict(latent, clip_sample=True)).clip_sample is True


def test_unclipped_sampler_reaches_out_of_range_targets():
    """Functional check: with clip_sample=False a DDIM sampler can land
    on x0 values far outside [-1, 1] (a latent-scale point mass), with
    and without CFG; the clipped sampler cannot."""
    from diffusion_models_collection_tpu.diffusion import DDIM

    kw = dict(num_timesteps=30, beta_start=1e-4, beta_end=0.02,
              beta_schedule="linear", num_inference_steps=8)
    target = 3.0

    def x0_model(x, t, y=None):
        return jnp.full_like(x, target)

    fn = jax.tree_util.Partial(x0_model)
    shape = (2, 4, 4, 2)
    rng = jax.random.PRNGKey(0)
    free = DDIM(prediction_type="x0", clip_sample=False, **kw)
    out = free.sample(fn, shape, rng)
    np.testing.assert_allclose(np.asarray(out), target, atol=5e-3)
    y = jnp.array([1, 2], jnp.int32)
    out_cfg = free.sample_with_cfg(fn, shape, y, rng, cfg_scale=2.0)
    np.testing.assert_allclose(np.asarray(out_cfg), target, atol=5e-3)
    clipped = DDIM(prediction_type="x0", **kw)
    assert np.asarray(clipped.sample(fn, shape, rng)).max() <= 1.0 + 1e-5


def test_compute_latent_scale_tool(vae_ckpt):
    """tools/compute_latent_scale.py measures the LDM sigma
    normalization: applying the suggested factor brings encoded latents
    to ~unit std."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "compute_latent_scale", REPO / "tools" / "compute_latent_scale.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    cfg = {
        "vae_checkpoint": str(vae_ckpt),
        "dataset": "synthetic", "data_root": "./data",
        "image_size": SIZE, "conditional": False,
        "batch_size": 8, "num_workers": 0, "seed": 0,
        "model_params": {"in_channels": 3},
    }
    out = mod.compute_scale(cfg, batches=3)
    scale = out["latent_scale_factor"]
    assert scale > 0 and out["latent_std"] > 0
    assert abs(scale * out["latent_std"] - 1.0) < 1e-3
    # applying the factor: encoded latents land at ~unit std
    from diffusion_models_collection_tpu.datasets import (
        DataLoader, DiffusionDataset, ImageTransform,
    )

    codec = LatentCodec(str(vae_ckpt), scale_factor=scale)
    ds = DiffusionDataset(
        "synthetic", conditional=False,
        transform=ImageTransform(SIZE, train=True),
        image_size=SIZE, n_train=32, seed=0,
    )
    images = next(iter(DataLoader(ds, batch_size=16, seed=0, prefetch=0)))[0]
    z = np.asarray(codec.encode_mode(jnp.asarray(images, jnp.float32)))
    assert 0.7 < z.std() < 1.3


def test_latent_trainer_end_to_end(vae_ckpt, tmp_path):
    """The diffusion trainer encodes batches into latent space inside the
    jitted step and decodes in-training sample grids back to pixels."""
    from diffusion_models_collection_tpu.datasets import (
        DataLoader, DiffusionDataset, ImageTransform,
    )
    from diffusion_models_collection_tpu.utils import DiffusionTrainer
    from diffusion_models_collection_tpu.utils.tracker import NullTracker

    cfg = _ld_config(
        vae_ckpt,
        save_dir=str(tmp_path / "ckpt"),
        sample_dir=str(tmp_path / "samples"),
    )
    model = get_model(cfg)
    diffusion = get_diffusion(cfg)
    ds = DiffusionDataset(
        "synthetic", conditional=True,
        transform=ImageTransform(SIZE, train=True),
        image_size=SIZE, n_train=32, seed=3,
    )
    loader = DataLoader(ds, batch_size=8, seed=0, prefetch=0)
    trainer = DiffusionTrainer(
        model, diffusion, loader, config=cfg,
        rng=jax.random.PRNGKey(0), tracker=NullTracker(),
    )
    assert trainer.image_size == (4, 4) and trainer.in_channels == 2
    losses = [trainer.train_epoch(e) for e in (1, 2, 3, 4)]
    assert all(np.isfinite(losses))
    assert min(losses[1:]) < losses[0], losses
    samples = trainer.sample_images(epoch=1, num_samples=4)
    # decoded back to PIXEL geometry
    assert samples.shape == (4, 8, 8, 3)
    assert np.isfinite(samples).all()


def test_cli_two_stage_train_and_sample(tmp_path):
    """Full pipeline through the real CLIs: train.py (VAE stage) ->
    train.py (latent diffusion) -> sample.py decodes pixels."""
    from cache_dir import cpu_cache_dir

    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "JAX_COMPILATION_CACHE_DIR": cpu_cache_dir(),
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.5",
    }

    def run(args):
        proc = subprocess.run(
            [sys.executable] + args, cwd=str(tmp_path), env=env,
            capture_output=True, text=True, timeout=900,
        )
        assert proc.returncode == 0, (
            f"STDOUT:\n{proc.stdout}\nSTDERR:\n{proc.stderr}"
        )
        return proc.stdout

    vae_cfg = dict(
        VAE_CONFIG,
        dataset="synthetic", data_root="./data",
        save_dir=str(tmp_path / "vae_ckpt"),
        sample_dir=str(tmp_path / "vae_recon"),
        sample_interval=1, sample_start_epoch=1, num_samples=4,
    )
    (tmp_path / "vae.py").write_text(f"config = {vae_cfg!r}\n")
    out = run([str(REPO / "train.py"), "--config", str(tmp_path / "vae.py")])
    assert "Training completed!" in out
    assert (tmp_path / "vae_ckpt" / "current_model.ckpt").exists()
    assert (tmp_path / "vae_recon" / "vae_epoch_0001.png").exists()

    ld_cfg = _ld_config(
        tmp_path / "vae_ckpt" / "current_model.ckpt",
        dataset="synthetic", data_root="./data",
        save_dir=str(tmp_path / "ld_ckpt"),
        sample_dir=str(tmp_path / "ld_gen"),
        sample_interval=1, sample_start_epoch=1,
    )
    (tmp_path / "ld.py").write_text(f"config = {ld_cfg!r}\n")
    out = run([str(REPO / "train.py"), "--config", str(tmp_path / "ld.py")])
    assert "Training completed!" in out
    ckpt = tmp_path / "ld_ckpt" / "current_model.ckpt"
    assert ckpt.exists()
    # in-training grids decoded through the VAE
    assert (tmp_path / "ld_gen" / "epoch_0001.png").exists()

    out = run([
        str(REPO / "sample.py"), "--checkpoint", str(ckpt),
        "--sampling_method", "ddim", "--num_inference_steps", "4",
        "--num_samples", "4", "--batch_size", "4", "--seed", "1",
        "--cfg_scale", "2.0", "--labels", "1,2,3,4",
        "--output_dir", str(tmp_path / "out"),
    ])
    assert "Latent diffusion" in out
    assert (tmp_path / "out" / "samples.png").exists()
