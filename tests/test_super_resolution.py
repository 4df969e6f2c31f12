"""Super-resolution conditioning (SR3-style cascaded diffusion, extension
beyond the reference): utils/sr.py math, factory channel wiring, the
conditioning oracle through training losses AND full sampler trajectories,
trainer e2e, and composition rejections."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.diffusion import DDIM, DDPM
from diffusion_models_collection_tpu.diffusion.schedule import (
    NoiseSchedule,
    extract,
)
from diffusion_models_collection_tpu.factory import get_model
from diffusion_models_collection_tpu.utils import sr as sr_lib


def block_constant_images(rng, n, h, w, c, factor):
    """HR images that are constant on factor x factor blocks — their area
    downsample followed by NEAREST upsample reproduces them exactly, so an
    exact SR solution exists and the conditioning IS the target image."""
    lr = rng.normal(size=(n, h // factor, w // factor, c)).astype(np.float32)
    return np.repeat(np.repeat(lr, factor, axis=1), factor, axis=2)


# ------------------------------------------------------------------ spec
def test_spec_absent_is_none():
    assert sr_lib.SRSpec.from_config({"image_size": (8, 8)}) is None
    assert sr_lib.SRSpec.from_config(
        {"image_size": (8, 8), "super_resolution": None}
    ) is None


def test_spec_parses_and_validates():
    spec = sr_lib.SRSpec.from_config({
        "image_size": (16, 16),
        "super_resolution": {"factor": 2, "noise_aug": 0.1,
                             "upsample": "nearest"},
    })
    assert spec.factor == 2 and spec.noise_aug == 0.1
    assert spec.lr_hw((16, 16)) == (8, 8)

    with pytest.raises(ValueError, match="factor"):
        sr_lib.SRSpec.from_config(
            {"image_size": (16, 16), "super_resolution": {"factor": 1}}
        )
    with pytest.raises(ValueError, match="divide"):
        sr_lib.SRSpec.from_config(
            {"image_size": (9, 9), "super_resolution": {"factor": 2}}
        )
    with pytest.raises(ValueError, match="noise_aug"):
        sr_lib.SRSpec.from_config({
            "image_size": (8, 8),
            "super_resolution": {"factor": 2, "noise_aug": -1},
        })
    with pytest.raises(ValueError, match="upsample"):
        sr_lib.SRSpec.from_config({
            "image_size": (8, 8),
            "super_resolution": {"factor": 2, "upsample": "bicubic"},
        })


# ------------------------------------------------------------------ math
def test_downsample_is_exact_area_mean():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 6, 3)).astype(np.float32)
    got = np.asarray(sr_lib.downsample(jnp.asarray(x), 2))
    expect = x.reshape(2, 4, 2, 3, 2, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(got, expect, rtol=1e-6)
    with pytest.raises(ValueError, match="divide"):
        sr_lib.downsample(jnp.zeros((1, 9, 8, 3)), 2)


def test_nearest_roundtrip_on_block_constant():
    rng = np.random.default_rng(1)
    x = block_constant_images(rng, 2, 8, 8, 3, 2)
    lr = sr_lib.downsample(jnp.asarray(x), 2)
    up = sr_lib.upsample(lr, (8, 8), "nearest")
    np.testing.assert_allclose(np.asarray(up), x, rtol=1e-6)


def test_make_condition_hr_equals_lr_path():
    rng = np.random.default_rng(2)
    hr = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    spec = sr_lib.SRSpec(factor=2)
    via_hr = sr_lib.make_condition(spec, (8, 8), hr_images=jnp.asarray(hr))
    via_lr = sr_lib.make_condition(
        spec, (8, 8), lr_images=sr_lib.downsample(jnp.asarray(hr), 2)
    )
    np.testing.assert_allclose(np.asarray(via_hr), np.asarray(via_lr),
                               rtol=1e-6)
    with pytest.raises(ValueError, match="exactly one"):
        sr_lib.make_condition(spec, (8, 8), hr_images=hr, lr_images=hr)
    with pytest.raises(ValueError, match="LR conditioning"):
        sr_lib.make_condition(
            spec, (8, 8), lr_images=jnp.zeros((2, 3, 3, 3))
        )


def test_make_condition_noise_aug():
    rng = np.random.default_rng(3)
    hr = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    spec = sr_lib.SRSpec(factor=2, noise_aug=0.5)
    clean = sr_lib.make_condition(
        sr_lib.SRSpec(factor=2), (8, 8), hr_images=jnp.asarray(hr)
    )
    with pytest.raises(ValueError, match="rng"):
        sr_lib.make_condition(spec, (8, 8), hr_images=jnp.asarray(hr))
    key = jax.random.PRNGKey(0)
    a = sr_lib.make_condition(spec, (8, 8), hr_images=jnp.asarray(hr),
                              rng=key)
    b = sr_lib.make_condition(spec, (8, 8), hr_images=jnp.asarray(hr),
                              rng=key)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))  # same rng
    diff = np.asarray(a) - np.asarray(clean)
    assert np.std(diff) == pytest.approx(0.5, rel=0.15)  # the aug level


# --------------------------------------------------------------- wrapping
def test_wrap_model_fn_concats_and_tiles_for_cfg():
    cond = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    seen = {}

    def probe(x, t, y):
        seen["x"] = x
        return x[..., :3]

    fn = sr_lib.wrap_model_fn(jax.tree_util.Partial(probe), cond)
    x = jnp.ones((2, 4, 4, 3))
    fn(x, jnp.zeros((2,), jnp.int32), None)
    np.testing.assert_allclose(np.asarray(seen["x"][..., 3:]),
                               np.asarray(cond))

    # fused-CFG batch (2B): conditioning tiles, same image per branch
    x2 = jnp.ones((4, 4, 4, 3))
    fn(x2, jnp.zeros((4,), jnp.int32), None)
    got = np.asarray(seen["x"][..., 3:])
    np.testing.assert_allclose(got[:2], np.asarray(cond))
    np.testing.assert_allclose(got[2:], np.asarray(cond))

    with pytest.raises(ValueError, match="multiple"):
        fn(jnp.ones((3, 4, 4, 3)), jnp.zeros((3,), jnp.int32), None)


def test_wrapped_fn_is_traced_not_constant():
    """The conditioning must ride as a traced Partial arg: two different
    conditionings must share ONE jit compilation (no per-batch retrace)."""
    compiles = []

    @jax.jit
    def run(fn, x):
        compiles.append(1)
        return fn(x, jnp.zeros((x.shape[0],), jnp.int32), None)

    def probe(x, t, y):
        return x[..., :3] + 0.0

    base = jax.tree_util.Partial(probe)
    x = jnp.ones((2, 4, 4, 3))
    for seed in (0, 1):
        cond = jax.random.normal(jax.random.PRNGKey(seed), (2, 4, 4, 3))
        run(sr_lib.wrap_model_fn(base, cond), x)
    assert len(compiles) == 1  # second call hit the jit cache


# ------------------------------------------------------- factory channels
def test_factory_doubles_input_channels():
    base = {
        "image_size": (8, 8),
        "conditional": False,
        "super_resolution": {"factor": 2},
    }
    unet = get_model({
        **base,
        "model_type": "unet",
        "model_params": {"in_channels": 3, "model_channels": 8,
                         "num_res_blocks": 1, "attention_resolutions": (),
                         "channel_mult": (1,)},
    })
    assert unet.in_channels == 6 and unet.out_channels == 3

    for mt, extra in (("dit", {"patch_size": 2, "hidden_size": 16,
                               "depth": 1, "num_heads": 2}),
                      ("dim", {"patch_size": 2, "hidden_size": 16,
                               "depth": 1, "state_size": 4})):
        model = get_model({
            **base,
            "model_type": mt,
            "model_params": {"in_channels": 3, **extra},
        })
        assert model.in_channels == 6 and model.out_channels == 3
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 6)),
            jnp.zeros((1,), jnp.int32), None,
        )
        out = model.apply(variables, jnp.zeros((2, 8, 8, 6)),
                          jnp.zeros((2,), jnp.int32), None)
        assert out.shape == (2, 8, 8, 3), mt


def test_factory_rejects_sr_for_vae_and_latent():
    with pytest.raises(ValueError, match="VAE"):
        get_model({
            "model_type": "vae", "image_size": (8, 8),
            "model_params": {"in_channels": 3},
            "super_resolution": {"factor": 2},
        })
    with pytest.raises(ValueError, match="pixel-space"):
        get_model({
            "model_type": "unet", "image_size": (8, 8),
            "model_params": {"in_channels": 3},
            "latent_diffusion": True, "vae_checkpoint": "x.ckpt",
            "super_resolution": {"factor": 2},
        })


# ------------------------------------------------- oracle: loss + sampling
def make_oracle(schedule: NoiseSchedule, c: int):
    """The EXACT eps predictor when the target x0 equals the conditioning
    channels: eps = (x_t - sqrt(acp_t) * cond) / sqrt(1 - acp_t). Reading
    the cond from the concatenated input verifies the whole plumbing —
    concat order, tiling, and that the sampler feeds the right images."""

    def oracle(inp, t, y):
        x_t, cond = inp[..., :c], inp[..., c:]
        a = extract(schedule.sqrt_alphas_cumprod, t, x_t.ndim)
        s = extract(schedule.sqrt_one_minus_alphas_cumprod, t, x_t.ndim)
        return (x_t - a * cond) / s

    return jax.tree_util.Partial(oracle)


def test_oracle_gives_zero_training_loss():
    """With nearest upsampling on block-constant images the conditioning
    equals the clean target, so the oracle's p_losses vanish — proof the
    trainer-side conditioning (concat [x_t ; cond]) carries the signal."""
    ddpm = DDPM(num_timesteps=20)
    spec = sr_lib.SRSpec(factor=2, upsample="nearest")
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(block_constant_images(rng, 4, 8, 8, 3, 2))
    cond = sr_lib.make_condition(spec, (8, 8), hr_images=x0)
    np.testing.assert_allclose(np.asarray(cond), np.asarray(x0), rtol=1e-6)

    fn = sr_lib.wrap_model_fn(make_oracle(ddpm.schedule, 3), cond)
    t = jnp.asarray([0, 5, 10, 19])
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    loss = ddpm.p_losses(fn, x0, t, noise)
    assert float(loss) < 1e-8


@pytest.mark.parametrize("sampler", ["ddpm", "ddim"])
def test_oracle_sampling_recovers_conditioning(sampler):
    """Full trajectories through the wrapped model recover each sample's
    OWN conditioning image (per-sample point-mass recovery) — the
    sampler-side analog of the zero-loss test, exercising CFG tiling."""
    num_t = 50
    diffusion = (
        DDPM(num_timesteps=num_t) if sampler == "ddpm"
        else DDIM(num_timesteps=num_t, num_inference_steps=10)
    )
    spec = sr_lib.SRSpec(factor=2, upsample="nearest")
    rng = np.random.default_rng(4)
    x0 = jnp.asarray(
        np.clip(block_constant_images(rng, 3, 8, 8, 3, 2) * 0.4, -1, 1)
    )
    cond = sr_lib.make_condition(spec, (8, 8), hr_images=x0)
    fn = sr_lib.wrap_model_fn(make_oracle(diffusion.schedule, 3), cond)

    out = diffusion.sample(fn, (3, 8, 8, 3), jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.12)

    # CFG path: scale 1 == conditional-only, but exercises the fused 2B
    # batch, hence the conditioning tiling
    out_cfg = diffusion.sample_with_cfg(
        fn, (3, 8, 8, 3), jnp.asarray([1, 2, 3]), jax.random.PRNGKey(2),
        cfg_scale=1.0,
    )
    np.testing.assert_allclose(np.asarray(out_cfg), np.asarray(x0),
                               atol=0.12)


# ------------------------------------------------------------- trainer e2e
def sr_config(tmp_path, **overrides):
    cfg = {
        "model_type": "unet",
        "model_params": {
            "image_size": (8, 8),
            "in_channels": 3,
            "model_channels": 16,
            "num_res_blocks": 1,
            "attention_resolutions": (),
            "channel_mult": (1, 2),
        },
        "image_size": (8, 8),
        "super_resolution": {"factor": 2, "noise_aug": 0.05},
        "conditional": False,
        "num_timesteps": 10,
        "beta_start": 1e-4,
        "beta_end": 0.02,
        "beta_schedule": "linear",
        "loss_type": "l2",
        "epochs": 2,
        "batch_size": 16,
        "optimizer": "adamw",
        "learning_rate": 1e-3,
        "weight_decay": 0.0,
        "gradient_accumulation_steps": 1,
        "use_ema": True,
        "ema_decay": 0.9,
        "cfg_dropout_prob": 0.0,
        "use_scheduler": False,
        "save_dir": str(tmp_path / "ckpt"),
        "sample_dir": str(tmp_path / "samples"),
        "save_interval": 10,
        "sample_interval": 1,
        "sample_start_epoch": 1,
        "num_samples": 4,
        "seed": 0,
        "use_swanlab": False,
        "progress": False,
    }
    cfg.update(overrides)
    return cfg


def make_sr_trainer(tmp_path, **overrides):
    from diffusion_models_collection_tpu.datasets import (
        DataLoader,
        DiffusionDataset,
        ImageTransform,
    )
    from diffusion_models_collection_tpu.utils import DiffusionTrainer
    from diffusion_models_collection_tpu.utils.tracker import NullTracker

    cfg = sr_config(tmp_path, **overrides)
    model = get_model(cfg)
    diffusion = DDPM(cfg["num_timesteps"], cfg["beta_start"],
                     cfg["beta_end"], cfg["beta_schedule"])
    ds = DiffusionDataset(
        "synthetic", conditional=False,
        transform=ImageTransform((8, 8), train=True),
        image_size=(8, 8), n_train=64,
    )
    loader = DataLoader(ds, batch_size=cfg["batch_size"], seed=0, prefetch=0)
    return DiffusionTrainer(model, diffusion, loader, config=cfg,
                            tracker=NullTracker()), cfg


def test_sr_trainer_end_to_end(tmp_path):
    trainer, cfg = make_sr_trainer(tmp_path)
    # the model actually consumes 6 channels
    assert trainer.model.in_channels == 6
    first = trainer.train_epoch(1)
    losses = [first] + [trainer.train_epoch(e) for e in range(2, 6)]
    assert losses[-1] < losses[0]

    # in-training sample grid: conditioned on the cached real batch
    samples = trainer.sample_images(epoch=1)
    assert samples.shape == (4, 8, 8, 3)
    assert (tmp_path / "samples" / "sr_condition.png").exists()
    assert (tmp_path / "samples" / "epoch_0001.png").exists()

    # checkpoint embeds the super_resolution block for the CLIs
    trainer.save_checkpoint(epoch=1)
    from diffusion_models_collection_tpu.utils import load_checkpoint

    payload = load_checkpoint(str(tmp_path / "ckpt" / "current_model.ckpt"))
    assert payload["config"]["super_resolution"]["factor"] == 2


def test_sr_sampling_skipped_before_first_batch(tmp_path, capsys):
    trainer, _ = make_sr_trainer(tmp_path)
    assert trainer.sample_images(epoch=1) is None
    assert "skipped" in capsys.readouterr().out


def test_sr_rejects_latent_and_consistency(tmp_path):
    from diffusion_models_collection_tpu.utils.consistency_trainer import (
        ConsistencyTrainingTrainer,
    )

    with pytest.raises(ValueError, match="consistency"):
        ConsistencyTrainingTrainer(
            model=None, train_loader=None,
            config={"super_resolution": {"factor": 2},
                    "image_size": (8, 8)},
        )


def test_sr_with_tensor_parallel(tmp_path):
    """SR composes with the parallelism matrix: the conditioning wraps the
    model callable AFTER the TP apply, so Megatron sharding is unaffected.
    DiT on the (data, model) mesh, loss finite and decreasing."""
    from diffusion_models_collection_tpu.datasets import (
        DataLoader,
        DiffusionDataset,
        ImageTransform,
    )
    from diffusion_models_collection_tpu.utils import DiffusionTrainer
    from diffusion_models_collection_tpu.utils.tracker import NullTracker

    cfg = sr_config(
        tmp_path,
        model_type="dit",
        model_params={"in_channels": 3, "patch_size": 2, "hidden_size": 32,
                      "depth": 2, "num_heads": 2, "dropout": 0.0},
        tensor_parallel=2,
        batch_size=8,
    )
    model = get_model(cfg)
    diffusion = DDPM(cfg["num_timesteps"], cfg["beta_start"],
                     cfg["beta_end"], cfg["beta_schedule"])
    ds = DiffusionDataset(
        "synthetic", conditional=False,
        transform=ImageTransform((8, 8), train=True),
        image_size=(8, 8), n_train=32,
    )
    loader = DataLoader(ds, batch_size=cfg["batch_size"], seed=0, prefetch=0)
    trainer = DiffusionTrainer(model, diffusion, loader, config=cfg,
                               tracker=NullTracker())
    losses = [trainer.train_epoch(e) for e in range(1, 4)]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_batch_condition_helper_pads_and_cycles():
    """The shared CLI helper: edge-padding to the compiled batch, modulo
    cycling for small eval sets, and empty-source rejection."""
    rng = np.random.default_rng(7)
    spec = sr_lib.SRSpec(factor=2)
    lr = rng.normal(size=(3, 4, 4, 3)).astype(np.float32)
    key = jax.random.PRNGKey(0)

    # pad: slice [2:4] of a 3-image source -> 1 real + 1 padded copy
    cond = sr_lib.batch_condition(spec, (8, 8), lr, 2, 4, 4, key)
    assert cond.shape == (4, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(cond[1]), np.asarray(cond[2]))

    # cycle: indices wrap modulo the source length
    cond_wrap = sr_lib.batch_condition(spec, (8, 8), lr, 3, 5, 2, key,
                                       cycle=True)
    cond_head = sr_lib.batch_condition(spec, (8, 8), lr, 0, 2, 2, key)
    np.testing.assert_allclose(np.asarray(cond_wrap), np.asarray(cond_head))

    # without cycle, an out-of-range slice is a clear error (not a crash
    # deep inside the jitted scan)
    with pytest.raises(ValueError, match="empty"):
        sr_lib.batch_condition(spec, (8, 8), lr, 5, 7, 2, key)
    with pytest.raises(ValueError, match="empty"):
        sr_lib.batch_condition(spec, (8, 8), lr[:0], 0, 2, 2, key)

    # hr source path matches downsample-then-lr path
    hr = rng.normal(size=(3, 8, 8, 3)).astype(np.float32)
    via_hr = sr_lib.batch_condition(spec, (8, 8), hr, 0, 2, 2, key,
                                    source_is_hr=True)
    via_lr = sr_lib.batch_condition(
        spec, (8, 8), np.asarray(sr_lib.downsample(jnp.asarray(hr), 2)),
        0, 2, 2, key,
    )
    np.testing.assert_allclose(np.asarray(via_hr), np.asarray(via_lr),
                               rtol=1e-5)
