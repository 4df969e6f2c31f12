"""Progressive distillation (Salimans & Ho 2022) — extension."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.diffusion import DDIM, base
from diffusion_models_collection_tpu.diffusion.distill import (
    distill_grids,
    student_distill_loss,
    two_step_teacher_target,
)
from diffusion_models_collection_tpu.diffusion.schedule import (
    NoiseSchedule, ddim_timesteps,
)

SHAPE = (3, 8, 8, 3)
T = 100
SCHED = NoiseSchedule.create(T, 1e-4, 0.02, "linear")


def test_distill_grids_interleave():
    t, t_mid, t_next = distill_grids(T, 8)
    teacher = np.asarray(ddim_timesteps(T, 16))
    np.testing.assert_array_equal(np.asarray(t), teacher[0::2])
    np.testing.assert_array_equal(np.asarray(t_mid), teacher[1::2])
    assert int(t_next[-1]) == -1
    np.testing.assert_array_equal(np.asarray(t_next[:-1]), teacher[2::2])
    # every mid sits strictly between its endpoints
    tn = np.asarray(t_next).copy()
    tn[-1] = -1
    assert ((np.asarray(t_mid) < np.asarray(t))
            & (np.asarray(t_mid) > tn)).all()
    with pytest.raises(ValueError):
        distill_grids(T, 0)


def _exact_pair(target):
    """Bayes-optimal (eps, x0) pair for a point-mass dataset at target."""

    def fn(x, t, y=None):
        a = base.extract(SCHED.sqrt_alphas_cumprod, t, x.ndim)
        b = base.extract(SCHED.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        eps = (x - a * target) / jnp.maximum(b, 1e-12)
        return eps, jnp.broadcast_to(target, x.shape)

    return jax.tree_util.Partial(fn)


def test_exact_teacher_gives_point_mass_target():
    """Two exact-teacher DDIM steps compose into exactly one exact step,
    so the x0 target IS the point mass — at every grid position
    including the terminal t_next = -1."""
    target = 0.3 * jnp.ones(SHAPE)
    pair = _exact_pair(target)
    t, t_mid, t_next = distill_grids(T, 4)
    z = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    for i in range(4):
        tgt = two_step_teacher_target(
            SCHED, pair, z,
            jnp.full((SHAPE[0],), int(t[i]), jnp.int32),
            jnp.full((SHAPE[0],), int(t_mid[i]), jnp.int32),
            jnp.full((SHAPE[0],), int(t_next[i]), jnp.int32),
        )
        np.testing.assert_allclose(np.asarray(tgt), 0.3, atol=2e-4)


def test_terminal_target_equals_two_step_result():
    """At t_next = -1 (a_next = 1, b_next = 0) the inversion degenerates
    to x0_target = z'' — verify against a manually composed trajectory
    for a generic smooth model."""
    from diffusion_models_collection_tpu.diffusion.ddim import ddim_step

    def eps_model(x, t, y=None):
        return 0.3 * jnp.tanh(x)

    pair = base.wrap_model_as_eps_x0(SCHED, eps_model, "eps")
    z = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    t = jnp.full((SHAPE[0],), 12, jnp.int32)
    t_mid = jnp.full((SHAPE[0],), 6, jnp.int32)
    t_next = jnp.full((SHAPE[0],), -1, jnp.int32)
    e1, x1 = pair(z, t, None)
    z_mid = ddim_step(SCHED, z, t, t_mid, e1, x1, 0.0, None)
    e2, x2 = pair(z_mid, t_mid, None)
    z2 = ddim_step(SCHED, z_mid, t_mid, t_next, e2, x2, 0.0, None)
    tgt = two_step_teacher_target(SCHED, pair, z, t, t_mid, t_next)
    np.testing.assert_allclose(
        np.asarray(tgt), np.asarray(z2), rtol=1e-5, atol=1e-6
    )


def test_student_loss_zero_for_matching_student_and_snr_weighting():
    target = 0.2 * jnp.ones(SHAPE)
    pair = _exact_pair(target)
    z = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    t_hi_snr = jnp.full((SHAPE[0],), 2, jnp.int32)
    t_lo_snr = jnp.full((SHAPE[0],), T - 2, jnp.int32)
    assert float(student_distill_loss(SCHED, pair, target, z, t_hi_snr)) < 1e-9
    # identical x0 error weighs MORE at high SNR (w = max(SNR, 1))
    off = target + 0.1
    hi = float(student_distill_loss(SCHED, pair, off, z, t_hi_snr))
    lo = float(student_distill_loss(SCHED, pair, off, z, t_lo_snr))
    assert hi > lo > 0.0


def _teacher_checkpoint(tmp_path):
    """A tiny (random-weight) conditional UNet checkpoint: distillation
    only needs a CONSISTENT teacher, not a good one."""
    from diffusion_models_collection_tpu.factory import (
        get_model, init_model_params,
    )
    from diffusion_models_collection_tpu.utils import checkpoint as ckpt_lib

    cfg = {
        "model_type": "unet",
        "model_params": {
            "in_channels": 3, "model_channels": 16, "out_channels": 3,
            "num_res_blocks": 1, "attention_resolutions": (4,),
            "channel_mult": (1, 2), "dropout": 0.0,
        },
        "image_size": (8, 8), "conditional": True, "num_classes": 10,
        "num_timesteps": T, "beta_start": 1e-4, "beta_end": 0.02,
        "beta_schedule": "linear", "loss_type": "l2",
        "num_inference_steps": 8, "ddim_eta": 0.0, "cfg_scale": 1.5,
        "dataset": "synthetic", "data_root": "./data",
    }
    model = get_model(cfg)
    params = init_model_params(
        model, jax.random.PRNGKey(0), (8, 8), 3, True
    )
    path = tmp_path / "teacher.ckpt"
    ckpt_lib.save_checkpoint(
        path, epoch=1, params=params, opt_state=None, best_loss=1.0,
        config=cfg,
    )
    return path, cfg


def test_distillation_end_to_end(tmp_path):
    from diffusion_models_collection_tpu.datasets import (
        DataLoader, DiffusionDataset, ImageTransform,
    )
    from diffusion_models_collection_tpu.factory import (
        eval_model_fn, get_diffusion, get_model,
    )
    from diffusion_models_collection_tpu.utils import checkpoint as ckpt_lib
    from diffusion_models_collection_tpu.utils.distill_trainer import (
        DistillationTrainer,
    )
    from diffusion_models_collection_tpu.utils.tracker import NullTracker

    teacher_path, t_cfg = _teacher_checkpoint(tmp_path)
    cfg = {
        "teacher_checkpoint": str(teacher_path),
        "distill_steps": 4, "distill_stages": 2, "epochs": 3,
        "batch_size": 8, "optimizer": "adamw", "learning_rate": 1e-3,
        "weight_decay": 0.0, "gradient_accumulation_steps": 1,
        "use_ema": True, "ema_decay": 0.9, "use_scheduler": False,
        "cfg_dropout_prob": 0.1,
        "image_size": (8, 8),
        "save_dir": str(tmp_path / "distilled"),
        "seed": 0, "use_swanlab": False,
    }
    ds = DiffusionDataset(
        "synthetic", conditional=True,
        transform=ImageTransform((8, 8), train=True),
        image_size=(8, 8), n_train=32, seed=3,
    )
    loader = DataLoader(ds, batch_size=8, seed=0, prefetch=0)
    trainer = DistillationTrainer(loader, cfg, rng=jax.random.PRNGKey(0),
                                  tracker=NullTracker())
    trainer.distill()

    for steps in (4, 2):
        path = tmp_path / "distilled" / f"distilled_{steps:04d}step.ckpt"
        assert path.exists()
        payload = ckpt_lib.load_checkpoint(path)
        assert payload["config"]["num_inference_steps"] == steps
        assert payload["config"]["distilled_steps"] == steps
        # the distilled checkpoint samples through the ordinary stack
        model = get_model(payload["config"])
        fn = eval_model_fn(model, payload["ema_model_state_dict"])
        d = get_diffusion(payload["config"], "ddim")
        assert isinstance(d, DDIM) and d.num_inference_steps == steps
        out = d.sample_with_cfg(
            fn, (2, 8, 8, 3), jnp.array([1, 2], jnp.int32),
            jax.random.PRNGKey(0), cfg_scale=1.5,
        )
        assert np.isfinite(np.asarray(out)).all()


def test_distillation_validation(tmp_path):
    from diffusion_models_collection_tpu.utils.distill_trainer import (
        DistillationTrainer,
    )

    teacher_path, _ = _teacher_checkpoint(tmp_path)
    base_cfg = {
        "teacher_checkpoint": str(teacher_path), "image_size": (8, 8),
        "batch_size": 8, "optimizer": "adamw", "learning_rate": 1e-3,
        "use_swanlab": False,
    }
    with pytest.raises(ValueError, match="even"):
        DistillationTrainer([], dict(base_cfg, distill_steps=3))
    with pytest.raises(ValueError, match="halve"):
        DistillationTrainer(
            [], dict(base_cfg, distill_steps=4, distill_stages=4)
        )
