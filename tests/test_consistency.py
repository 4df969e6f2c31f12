"""Consistency distillation (Song et al. 2023) — extension."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.diffusion import ConsistencyModel, base
from diffusion_models_collection_tpu.diffusion.consistency import (
    cd_grids,
    consistency_apply,
    consistency_distill_loss,
    consistency_scalings,
    pseudo_huber,
)
from diffusion_models_collection_tpu.diffusion.schedule import (
    NoiseSchedule,
    ddim_timesteps,
    extract,
)

SHAPE = (3, 8, 8, 3)
T = 100
SCHED = NoiseSchedule.create(T, 1e-4, 0.02, "linear")
SD, TS = 0.5, 10.0


def test_scalings_boundary_and_monotone():
    t = jnp.arange(0, T, dtype=jnp.int32)
    c_skip, c_out = consistency_scalings(t, 1, SD, TS)
    c_skip = np.asarray(c_skip).ravel()
    c_out = np.asarray(c_out).ravel()
    # exact boundary: f(x, 0) = x by construction
    assert c_skip[0] == 1.0 and c_out[0] == 0.0
    assert (np.diff(c_skip) < 0).all()
    assert (np.diff(c_out) > 0).all()
    # large-t limit: the learned component dominates
    assert c_out[-1] > 0.99 and c_skip[-1] < 0.01


def test_cd_grids_adjacent_descending():
    t, t_next = cd_grids(T, 8)
    grid = np.asarray(ddim_timesteps(T, 8))
    np.testing.assert_array_equal(np.asarray(t), grid[:-1])
    np.testing.assert_array_equal(np.asarray(t_next), grid[1:])
    assert (np.asarray(t) > np.asarray(t_next)).all()
    assert int(t_next[-1]) == 0  # anchored at the boundary
    with pytest.raises(ValueError):
        cd_grids(T, 1)


def test_boundary_identity():
    """f(x, 0) = x exactly, whatever the network predicts."""

    def wild_pair(x, t, y=None):
        return jnp.sin(x) * 100.0, jnp.cos(x) * 100.0

    x = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    t0 = jnp.zeros((SHAPE[0],), jnp.int32)
    f = consistency_apply(wild_pair, x, t0, None, SD, TS)
    np.testing.assert_array_equal(np.asarray(f), np.asarray(x))


def _exact_consistency_pair(c):
    """The EXACT consistency function for a point-mass teacher at c,
    expressed through the boundary parameterization.

    With the Bayes teacher x0_hat = c, the probability-flow (DDIM)
    trajectory from z_t preserves eps = (z_t - a_t c)/b_t and lands at
    z_0 = a_0 c + b_0 eps, so f*(z, t) = a_0 c + b_0 (z - a_t c)/b_t.
    Inverting f = c_skip z + c_out x0_pred gives the network output that
    realizes f* for every t > 0 (t = 0 is the identity anchor and never
    queried through x0_pred)."""
    a0 = float(SCHED.sqrt_alphas_cumprod[0])
    b0 = float(SCHED.sqrt_one_minus_alphas_cumprod[0])

    def fn(x, t, y=None):
        a = extract(SCHED.sqrt_alphas_cumprod, t, x.ndim)
        b = extract(SCHED.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        f_star = a0 * c + b0 * (x - a * c) / jnp.maximum(b, 1e-12)
        c_skip, c_out = consistency_scalings(t, x.ndim, SD, TS)
        x0_pred = (f_star - c_skip * x) / jnp.maximum(c_out, 1e-12)
        return jnp.zeros_like(x), x0_pred  # eps component unused by f

    return jax.tree_util.Partial(fn)


def _exact_teacher_pair(c):
    """Bayes-exact (eps, x0) for the point-mass data distribution."""

    def fn(x, t, y=None):
        a = extract(SCHED.sqrt_alphas_cumprod, t, x.ndim)
        b = extract(SCHED.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        eps = (x - a * c) / jnp.maximum(b, 1e-12)
        return eps, jnp.broadcast_to(jnp.asarray(c, x.dtype), x.shape)

    return jax.tree_util.Partial(fn)


def test_loss_zero_for_exact_consistency_function():
    """Student == target == the EXACT consistency function, teacher the
    Bayes teacher: f_student(z, t) and f_target(z_hat, t_next) both
    equal f*(along the same ODE trajectory), so the CD loss vanishes —
    including the boundary pair (t_next = 0), where the teacher's DDIM
    step lands exactly on z_0 and f(z_0, 0) = z_0 = f*(z, t)."""
    cm_pair = _exact_consistency_pair(0.3)
    teacher = _exact_teacher_pair(0.3)
    t_arr, t_next_arr = cd_grids(T, 6)
    z = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    for i in range(int(t_arr.shape[0])):
        t = jnp.full((SHAPE[0],), int(t_arr[i]), jnp.int32)
        tn = jnp.full((SHAPE[0],), int(t_next_arr[i]), jnp.int32)
        loss = consistency_distill_loss(
            SCHED, cm_pair, cm_pair, teacher, z, t, tn, None,
            sigma_data=SD, timestep_scaling=TS, loss_type="l2",
        )
        assert float(loss) < 1e-8, (i, float(loss))


def test_loss_positive_for_inconsistent_student():
    cm_pair = _exact_consistency_pair(0.3)
    teacher = _exact_teacher_pair(0.3)
    bad_pair = _exact_consistency_pair(-0.4)  # consistent to the WRONG x0
    t = jnp.full((SHAPE[0],), 50, jnp.int32)
    tn = jnp.full((SHAPE[0],), 25, jnp.int32)
    z = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    loss = consistency_distill_loss(
        SCHED, bad_pair, cm_pair, teacher, z, t, tn, None,
        sigma_data=SD, timestep_scaling=TS, loss_type="l2",
    )
    assert float(loss) > 1e-3


def test_pseudo_huber_limits():
    d = jnp.zeros((2, 4))
    assert float(jnp.max(jnp.abs(pseudo_huber(d, 0.03)))) < 1e-9
    big = jnp.full((2, 4), 10.0)
    # large-error limit: |d|_rms - c
    np.testing.assert_allclose(np.asarray(pseudo_huber(big, 0.03)),
                               10.0 - 0.03, rtol=1e-4)


class TestConsistencySampler:
    def _cm(self, steps, clip=False):
        return ConsistencyModel(
            num_timesteps=T, num_inference_steps=steps,
            sigma_data=SD, timestep_scaling=TS, clip_sample=clip,
        )

    def _model_fn(self, c):
        """eps-parameterized model whose x0 view realizes the exact
        consistency function (prediction_type='eps' wrapper inverts
        eps -> x0, so emit the eps that implies the needed x0)."""
        a0 = float(SCHED.sqrt_alphas_cumprod[0])
        b0 = float(SCHED.sqrt_one_minus_alphas_cumprod[0])

        def fn(x, t, y=None):
            a = extract(SCHED.sqrt_alphas_cumprod, t, x.ndim)
            b = extract(SCHED.sqrt_one_minus_alphas_cumprod, t, x.ndim)
            f_star = a0 * c + b0 * (x - a * c) / jnp.maximum(b, 1e-12)
            c_skip, c_out = consistency_scalings(t, x.ndim, SD, TS)
            x0_pred = (f_star - c_skip * x) / jnp.maximum(c_out, 1e-12)
            return (x - a * x0_pred) / jnp.maximum(b, 1e-12)  # implied eps

        return jax.tree_util.Partial(fn)

    def test_point_mass_recovery_any_step_count(self):
        """The exact consistency model must land within the t = 0
        residual-noise floor (b_0 ~ 1e-2) of the point at 1-4 steps."""
        fn = self._model_fn(0.3)
        for steps in (1, 2, 4):
            out = self._cm(steps).sample(
                fn, SHAPE, jax.random.PRNGKey(3)
            )
            assert out.shape == SHAPE
            np.testing.assert_allclose(np.asarray(out), 0.3, atol=0.05)

    def test_deterministic_given_rng(self):
        fn = self._model_fn(0.1)
        cm = self._cm(3)
        o1 = cm.sample(fn, SHAPE, jax.random.PRNGKey(0))
        o2 = cm.sample(fn, SHAPE, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def test_return_all_timesteps_frames(self):
        fn = self._model_fn(0.1)
        frames = self._cm(3).sample(
            fn, SHAPE, jax.random.PRNGKey(0), return_all_timesteps=True
        )
        assert frames.shape == (3,) + SHAPE
        # every frame is already an x0 estimate near the point
        np.testing.assert_allclose(np.asarray(frames), 0.1, atol=0.05)

    def test_grid_excludes_identity_anchor(self):
        cm = self._cm(2)
        ts = np.asarray(cm.inference_timesteps)
        assert len(ts) == 2 and (ts > 0).all() and ts[0] == T - 1
        cm.set_inference_steps(4)
        assert len(np.asarray(cm.inference_timesteps)) == 4

    def test_cfg_fused_and_scale_one_matches_cond(self):
        def fn(x, t, y=None):
            off = 0.0 if y is None else (
                0.01 * y.astype(jnp.float32).reshape(-1, 1, 1, 1)
            )
            return 0.1 * x + off

        pf = jax.tree_util.Partial(fn)
        cm = self._cm(2)
        y = jnp.array([1, 2, 3], jnp.int32)
        guided = cm.sample_with_cfg(pf, SHAPE, y, jax.random.PRNGKey(1),
                                    cfg_scale=2.0)
        cond = cm.sample_with_cfg(pf, SHAPE, y, jax.random.PRNGKey(1),
                                  cfg_scale=1.0)
        assert np.isfinite(np.asarray(guided)).all()
        assert float(jnp.max(jnp.abs(guided - cond))) > 1e-6
        # scale 1 reduces to the conditional path exactly
        plain = cm.sample(pf, SHAPE, jax.random.PRNGKey(1), y=y)
        np.testing.assert_allclose(np.asarray(cond), np.asarray(plain),
                                   atol=1e-6)

    def test_validation(self):
        with pytest.raises(ValueError, match="prediction type"):
            ConsistencyModel(prediction_type="nope")
        with pytest.raises(ValueError, match=">= 1"):
            ConsistencyModel(num_inference_steps=0)


def _teacher_checkpoint(tmp_path, conditional=True):
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
        "image_size": (8, 8), "conditional": conditional,
        "num_classes": 10 if conditional else None,
        "num_timesteps": T, "beta_start": 1e-4, "beta_end": 0.02,
        "beta_schedule": "linear", "loss_type": "l2",
        "num_inference_steps": 8, "ddim_eta": 0.0, "cfg_scale": 1.5,
        "dataset": "synthetic", "data_root": "./data",
    }
    model = get_model(cfg)
    params = init_model_params(
        model, jax.random.PRNGKey(0), (8, 8), 3, conditional
    )
    path = tmp_path / "teacher.ckpt"
    ckpt_lib.save_checkpoint(
        path, epoch=1, params=params, opt_state=None, best_loss=1.0,
        config=cfg,
    )
    return path, cfg


def test_consistency_distillation_end_to_end(tmp_path):
    """CD a tiny teacher, then sample the result through the ordinary
    factory stack (diffusion_type: 'consistency' dispatch)."""
    from diffusion_models_collection_tpu.datasets import (
        DataLoader, DiffusionDataset, ImageTransform,
    )
    from diffusion_models_collection_tpu.factory import (
        eval_model_fn, get_diffusion, get_model,
    )
    from diffusion_models_collection_tpu.utils import checkpoint as ckpt_lib
    from diffusion_models_collection_tpu.utils.consistency_trainer import (
        ConsistencyDistillationTrainer,
    )
    from diffusion_models_collection_tpu.utils.tracker import NullTracker

    teacher_path, _ = _teacher_checkpoint(tmp_path)
    cfg = {
        "teacher_checkpoint": str(teacher_path),
        "distill_method": "consistency",
        "consistency_grid_size": 10, "distill_cfg_scale": 1.5,
        "consistency_sample_steps": 2, "target_ema_decay": 0.9,
        "epochs": 2, "batch_size": 8,
        "optimizer": "adamw", "learning_rate": 1e-3, "weight_decay": 0.0,
        "gradient_accumulation_steps": 1, "use_scheduler": False,
        "cfg_dropout_prob": 0.1, "image_size": (8, 8),
        "save_dir": str(tmp_path / "cd"), "seed": 0, "use_swanlab": False,
    }
    ds = DiffusionDataset(
        "synthetic", conditional=True,
        transform=ImageTransform((8, 8), train=True),
        image_size=(8, 8), n_train=32, seed=3,
    )
    loader = DataLoader(ds, batch_size=8, seed=0, prefetch=0)
    trainer = ConsistencyDistillationTrainer(
        loader, cfg, rng=jax.random.PRNGKey(0), tracker=NullTracker()
    )
    trainer.distill()

    path = tmp_path / "cd" / "consistency_model.ckpt"
    assert path.exists()
    payload = ckpt_lib.load_checkpoint(path)
    out_cfg = payload["config"]
    assert out_cfg["diffusion_type"] == "consistency"
    assert out_cfg["num_inference_steps"] == 2
    assert out_cfg["distilled_cfg_scale"] == 1.5
    # guidance baked in: downstream CFG runs at the conditional
    # scale-1 limit (0 would silently drop requested labels)
    assert out_cfg["cfg_scale"] == 1.0

    model = get_model(out_cfg)
    fn = eval_model_fn(model, payload["ema_model_state_dict"])
    d = get_diffusion(out_cfg)  # dtype key owns the stack
    assert isinstance(d, ConsistencyModel)
    assert d.num_inference_steps == 2
    out = d.sample(fn, (2, 8, 8, 3), jax.random.PRNGKey(0),
                   y=jnp.array([1, 2], jnp.int32))
    assert out.shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_consistency_trainer_validation(tmp_path):
    from diffusion_models_collection_tpu.utils.consistency_trainer import (
        ConsistencyDistillationTrainer,
    )

    teacher_path, _ = _teacher_checkpoint(tmp_path, conditional=False)
    with pytest.raises(ValueError, match="conditional"):
        ConsistencyDistillationTrainer([], {
            "teacher_checkpoint": str(teacher_path),
            "distill_cfg_scale": 2.0, "image_size": (8, 8),
            "batch_size": 8, "optimizer": "adamw",
            "learning_rate": 1e-3, "use_swanlab": False,
        })


def test_factory_rejects_unknown_and_train_rejects_consistency():
    from diffusion_models_collection_tpu.factory import get_diffusion

    cfg = {"num_timesteps": T, "beta_start": 1e-4, "beta_end": 0.02,
           "beta_schedule": "linear", "diffusion_type": "consistency",
           "num_inference_steps": 3, "sigma_data": 0.5}
    d = get_diffusion(cfg)
    assert isinstance(d, ConsistencyModel) and d.num_inference_steps == 3
    # sampling_method is ignored — the dtype key owns the stack
    d2 = get_diffusion(cfg, sampling_method="ddim")
    assert isinstance(d2, ConsistencyModel)
