"""From-scratch consistency TRAINING (Song et al. 2023 Alg. 3; iCT
elements from Song & Dhariwal 2023) — extension. The distillation
variant is covered by tests/test_consistency.py."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.diffusion import ConsistencyModel, base
from diffusion_models_collection_tpu.diffusion.consistency import (
    cd_grids,
    consistency_scalings,
    consistency_training_loss,
)
from diffusion_models_collection_tpu.diffusion.schedule import (
    NoiseSchedule,
    extract,
)

SHAPE = (3, 8, 8, 3)
T = 100
SCHED = NoiseSchedule.create(T, 1e-4, 0.02, "linear")
SD, TS = 0.5, 10.0


def _exact_consistency_pair(c):
    """The EXACT consistency function for a point-mass distribution at c
    (same construction as tests/test_consistency.py): the PF-ODE
    preserves eps, so f*(z, t) = a_0 c + b_0 (z - a_t c)/b_t."""
    a0 = float(SCHED.sqrt_alphas_cumprod[0])
    b0 = float(SCHED.sqrt_one_minus_alphas_cumprod[0])

    def fn(x, t, y=None):
        a = extract(SCHED.sqrt_alphas_cumprod, t, x.ndim)
        b = extract(SCHED.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        f_star = a0 * c + b0 * (x - a * c) / jnp.maximum(b, 1e-12)
        c_skip, c_out = consistency_scalings(t, x.ndim, SD, TS)
        x0_pred = (f_star - c_skip * x) / jnp.maximum(c_out, 1e-12)
        return jnp.zeros_like(x), x0_pred

    return jax.tree_util.Partial(fn)


def test_ct_loss_zero_for_exact_consistency_function_point_mass():
    """For point-mass data the same-noise pair (z_t, z_next) lies on ONE
    PF-ODE trajectory (both have eps = n), so the exact consistency
    function scores exactly zero CT loss at every grid pair — including
    the t_next = 0 boundary anchor. This is THE test that the loss
    couples the two times through one shared noise draw: independent
    draws would put the pair on different trajectories and the loss
    would not vanish."""
    c = 0.3
    pair = _exact_consistency_pair(c)
    x0 = jnp.full(SHAPE, c, jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    t_arr, t_next_arr = cd_grids(T, 6)
    for i in range(int(t_arr.shape[0])):
        t = jnp.full((SHAPE[0],), int(t_arr[i]), jnp.int32)
        tn = jnp.full((SHAPE[0],), int(t_next_arr[i]), jnp.int32)
        loss = consistency_training_loss(
            SCHED, pair, pair, x0, noise, t, tn, None,
            sigma_data=SD, timestep_scaling=TS, loss_type="l2",
        )
        assert float(loss) < 1e-8, (i, float(loss))
    # sanity: off the point mass the same function is NOT consistent
    x0_off = x0 + 0.5
    t = jnp.full((SHAPE[0],), int(t_arr[0]), jnp.int32)
    tn = jnp.full((SHAPE[0],), int(t_next_arr[0]), jnp.int32)
    loss = consistency_training_loss(
        SCHED, pair, pair, x0_off, noise, t, tn, None,
        sigma_data=SD, timestep_scaling=TS, loss_type="l2",
    )
    # orders of magnitude above the on-mass float-noise floor (~1e-15);
    # the absolute size is small because f* differs across the pair only
    # through 0.5*b0*(a_t/b_t - a_tn/b_tn)
    assert float(loss) > 1e-7


def test_ct_loss_zero_when_times_coincide():
    """t == t_next with identical student/target params: f_student and
    f_target see the SAME noised input (same-noise coupling) and the
    SAME function, so every distance is exactly 0."""

    def arbitrary_pair(x, t, y=None):
        return jnp.sin(x), jnp.tanh(x) * 2.0

    pair = jax.tree_util.Partial(arbitrary_pair)
    x0 = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    noise = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    t = jnp.full((SHAPE[0],), 37, jnp.int32)
    for loss_type in ("l2", "huber"):
        loss = consistency_training_loss(
            SCHED, pair, pair, x0, noise, t, t, None,
            sigma_data=SD, timestep_scaling=TS, loss_type=loss_type,
        )
        assert float(loss) < 1e-12


def test_ct_loss_matches_numpy_oracle():
    """Exact parity of every (loss_type, weighting) combination against
    a from-scratch numpy reimplementation."""
    rng = np.random.default_rng(7)
    x0 = rng.normal(size=SHAPE).astype(np.float32)
    noise = rng.normal(size=SHAPE).astype(np.float32)
    t = np.array([80, 50, 20], np.int32)
    tn = np.array([60, 30, 0], np.int32)

    def np_pair(x, tt):
        # linear "network": x0_pred = 0.25 x + 0.1
        return 0.25 * x + 0.1

    def jx_pair(x, tt, y=None):
        return jnp.zeros_like(x), 0.25 * x + 0.1

    a = np.asarray(SCHED.sqrt_alphas_cumprod)
    b = np.asarray(SCHED.sqrt_one_minus_alphas_cumprod)

    def np_f(x, tt):
        s = (tt.astype(np.float32) / TS).reshape(-1, 1, 1, 1)
        c_skip = SD**2 / (s**2 + SD**2)
        c_out = s / np.sqrt(s**2 + SD**2)
        return c_skip * x + c_out * np_pair(x, tt)

    z_t = a[t].reshape(-1, 1, 1, 1) * x0 + b[t].reshape(-1, 1, 1, 1) * noise
    z_n = a[tn].reshape(-1, 1, 1, 1) * x0 + b[tn].reshape(-1, 1, 1, 1) * noise
    diff = np_f(z_t, t) - np_f(z_n, tn)
    ms = (diff**2).mean(axis=(1, 2, 3))
    huber_c = 0.03
    per = {
        "l2": ms,
        "huber": np.sqrt(ms + huber_c**2) - huber_c,
    }
    gap = (t - tn).astype(np.float32) / TS
    pair = jax.tree_util.Partial(jx_pair)
    for loss_type in ("l2", "huber"):
        for weighting in ("uniform", "inverse_gap"):
            want = per[loss_type] / np.maximum(gap, 1e-8) if (
                weighting == "inverse_gap"
            ) else per[loss_type]
            got = consistency_training_loss(
                SCHED, pair, pair,
                jnp.asarray(x0), jnp.asarray(noise),
                jnp.asarray(t), jnp.asarray(tn), None,
                sigma_data=SD, timestep_scaling=TS,
                loss_type=loss_type, huber_c=huber_c, weighting=weighting,
            )
            np.testing.assert_allclose(
                float(got), float(want.mean()), rtol=2e-5,
                err_msg=f"{loss_type}/{weighting}",
            )


def test_ct_loss_validation():
    pair = _exact_consistency_pair(0.0)
    x0 = jnp.zeros(SHAPE)
    t = jnp.full((SHAPE[0],), 10, jnp.int32)
    with pytest.raises(ValueError, match="loss_type"):
        consistency_training_loss(
            SCHED, pair, pair, x0, x0, t, t, None,
            sigma_data=SD, timestep_scaling=TS, loss_type="nope",
        )
    with pytest.raises(ValueError, match="weighting"):
        consistency_training_loss(
            SCHED, pair, pair, x0, x0, t, t, None,
            sigma_data=SD, timestep_scaling=TS, weighting="nope",
        )


def _ct_config(tmp_path, **overrides):
    cfg = {
        "model_type": "unet",
        "model_params": {
            "in_channels": 3, "model_channels": 16, "out_channels": 3,
            "num_res_blocks": 1, "attention_resolutions": (4,),
            "channel_mult": (1, 2), "dropout": 0.0,
        },
        "image_size": (8, 8), "conditional": True, "num_classes": 10,
        "diffusion_type": "consistency",
        "num_timesteps": T, "beta_start": 1e-4, "beta_end": 0.02,
        "beta_schedule": "linear",
        "consistency_grid_size": 10, "consistency_sample_steps": 2,
        "target_ema_decay": 0.9, "cfg_dropout_prob": 0.1,
        "epochs": 2, "batch_size": 8,
        "optimizer": "adamw", "learning_rate": 1e-3, "weight_decay": 0.0,
        "gradient_accumulation_steps": 1, "use_scheduler": False,
        "dataset": "synthetic", "data_root": "./data",
        "save_dir": str(tmp_path / "ct"), "seed": 0, "use_swanlab": False,
    }
    cfg.update(overrides)
    return cfg


def _loader(conditional=True):
    from diffusion_models_collection_tpu.datasets import (
        DataLoader, DiffusionDataset, ImageTransform,
    )

    ds = DiffusionDataset(
        "synthetic", conditional=conditional,
        transform=ImageTransform((8, 8), train=True),
        image_size=(8, 8), n_train=32, seed=3,
    )
    return DataLoader(ds, batch_size=8, seed=0, prefetch=0)


def test_ct_trainer_end_to_end(tmp_path):
    """Train from scratch (no teacher anywhere), then sample the result
    through the ordinary factory stack at 1 and 2 steps."""
    from diffusion_models_collection_tpu.factory import (
        eval_model_fn, get_diffusion, get_model,
    )
    from diffusion_models_collection_tpu.utils import checkpoint as ckpt_lib
    from diffusion_models_collection_tpu.utils.consistency_trainer import (
        ConsistencyTrainingTrainer,
    )
    from diffusion_models_collection_tpu.utils.tracker import NullTracker

    cfg = _ct_config(tmp_path)
    trainer = ConsistencyTrainingTrainer(
        get_model(cfg), _loader(), cfg,
        rng=jax.random.PRNGKey(0), tracker=NullTracker(),
    )
    state = trainer.train()

    path = tmp_path / "ct" / "consistency_model.ckpt"
    assert path.exists()
    payload = ckpt_lib.load_checkpoint(path)
    out_cfg = payload["config"]
    assert out_cfg["diffusion_type"] == "consistency"
    assert out_cfg["num_inference_steps"] == 2
    assert payload["ema_model_state_dict"] is not None

    model = get_model(out_cfg)
    fn = eval_model_fn(model, payload["ema_model_state_dict"])
    d = get_diffusion(out_cfg)
    assert isinstance(d, ConsistencyModel)
    out = d.sample(fn, (2, 8, 8, 3), jax.random.PRNGKey(0),
                   y=jnp.array([1, 2], jnp.int32))
    assert out.shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()
    d.set_inference_steps(1)
    one = d.sample(fn, (2, 8, 8, 3), jax.random.PRNGKey(0),
                   y=jnp.array([1, 2], jnp.int32))
    assert np.isfinite(np.asarray(one)).all()
    # the run actually trained: params moved off the init
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params, trainer.init_params,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-5


def test_ct_grid_schedule_and_mu_zero(tmp_path):
    """Staged grids (the paper's progressive N(k)) split the epochs and
    rebuild the step; mu = 0 (iCT) makes theta^- track theta exactly."""
    from diffusion_models_collection_tpu.factory import get_model
    from diffusion_models_collection_tpu.utils.consistency_trainer import (
        ConsistencyTrainingTrainer,
    )
    from diffusion_models_collection_tpu.utils.tracker import NullTracker

    cfg = _ct_config(
        tmp_path, ct_grid_schedule=[4, 8], epochs=2,
        target_ema_decay=0.0, ct_weighting="inverse_gap",
        consistency_loss="huber",
    )
    trainer = ConsistencyTrainingTrainer(
        get_model(cfg), _loader(), cfg,
        rng=jax.random.PRNGKey(0), tracker=NullTracker(),
    )
    state = trainer.train()
    # mu = 0: the target network IS the student after every update
    same = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params, state.ema_params,
    )
    assert max(jax.tree_util.tree_leaves(same)) == 0.0


def test_gated_ema_freezes_on_multisteps_microsteps():
    """With gradient accumulation the EMA must lerp once per REAL
    optimizer update, not once per micro-step (decay would compound to
    decay^k otherwise)."""
    import optax

    from diffusion_models_collection_tpu.utils.ema import (
        ema_update, gated_ema_update,
    )

    params = {"w": jnp.ones((3,))}
    ema = {"w": jnp.zeros((3,))}
    opt = optax.MultiSteps(optax.sgd(0.1), every_k_schedule=2)
    opt_state = opt.init(params)
    grads = {"w": jnp.ones((3,))}

    # micro-step 1: accumulation only — EMA must not move
    _, opt_state = opt.update(grads, opt_state, params)
    ema1 = gated_ema_update(opt, opt_state, ema, params, 0.5)
    np.testing.assert_array_equal(np.asarray(ema1["w"]),
                                  np.asarray(ema["w"]))
    # micro-step 2: boundary — EMA lerps exactly once
    _, opt_state = opt.update(grads, opt_state, params)
    ema2 = gated_ema_update(opt, opt_state, ema1, params, 0.5)
    np.testing.assert_allclose(
        np.asarray(ema2["w"]),
        np.asarray(ema_update(ema, params, 0.5)["w"]),
    )
    # non-MultiSteps optimizers keep plain lerp semantics
    plain = optax.sgd(0.1)
    pstate = plain.init(params)
    out = gated_ema_update(plain, pstate, ema, params, 0.5)
    np.testing.assert_allclose(np.asarray(out["w"]),
                               np.asarray(ema_update(ema, params, 0.5)["w"]))


def test_ct_resume_and_per_epoch_checkpoints(tmp_path):
    """A CT run checkpoints EVERY epoch (long runs must survive
    interruption) and resume_path continues the epoch/stage count
    instead of silently restarting."""
    from diffusion_models_collection_tpu.factory import get_model
    from diffusion_models_collection_tpu.utils import checkpoint as ckpt_lib
    from diffusion_models_collection_tpu.utils.consistency_trainer import (
        ConsistencyTrainingTrainer,
    )
    from diffusion_models_collection_tpu.utils.tracker import NullTracker

    cfg = _ct_config(tmp_path, epochs=1)
    trainer = ConsistencyTrainingTrainer(
        get_model(cfg), _loader(), cfg,
        rng=jax.random.PRNGKey(0), tracker=NullTracker(),
    )
    trainer.train()
    ckpt = tmp_path / "ct" / "current_model.ckpt"
    assert ckpt.exists()
    assert ckpt_lib.load_checkpoint(ckpt)["epoch"] == 1

    # resume with a larger epoch target: exactly one more epoch runs
    cfg2 = _ct_config(tmp_path, epochs=2)
    trainer2 = ConsistencyTrainingTrainer(
        get_model(cfg2), _loader(), cfg2,
        rng=jax.random.PRNGKey(1), tracker=NullTracker(),
        resume_path=str(ckpt),
    )
    state = trainer2.train()
    assert state is not None
    assert ckpt_lib.load_checkpoint(ckpt)["epoch"] == 2

    # resuming from a non-consistency checkpoint is rejected
    bad_cfg = dict(cfg)
    bad_cfg["diffusion_type"] = "ddpm"
    bad = tmp_path / "bad.ckpt"
    payload = ckpt_lib.load_checkpoint(ckpt)
    ckpt_lib.save_checkpoint(
        bad, epoch=1, params=payload["model_state_dict"], opt_state=None,
        best_loss=1.0, config=bad_cfg,
    )
    trainer3 = ConsistencyTrainingTrainer(
        get_model(cfg2), _loader(), cfg2,
        rng=jax.random.PRNGKey(2), tracker=NullTracker(),
        resume_path=str(bad),
    )
    with pytest.raises(ValueError, match="consistency checkpoint"):
        trainer3.train()


def test_ct_trainer_validation(tmp_path):
    from diffusion_models_collection_tpu.factory import get_model
    from diffusion_models_collection_tpu.utils.consistency_trainer import (
        ConsistencyTrainingTrainer,
    )

    base_cfg = _ct_config(tmp_path)
    model = get_model(base_cfg)
    with pytest.raises(ValueError, match="ct_weighting"):
        ConsistencyTrainingTrainer(
            model, [], _ct_config(tmp_path, ct_weighting="nope"))
    with pytest.raises(ValueError, match="target_ema_decay"):
        ConsistencyTrainingTrainer(
            model, [], _ct_config(tmp_path, target_ema_decay=1.0))
    with pytest.raises(ValueError, match="grid"):
        ConsistencyTrainingTrainer(
            model, [], _ct_config(tmp_path, ct_grid_schedule=[1]))
    with pytest.raises(ValueError, match="zero_terminal_snr"):
        ConsistencyTrainingTrainer(
            model, [], _ct_config(tmp_path, zero_terminal_snr=True))
    # more stages than epochs would overrun the configured epoch count
    with pytest.raises(ValueError, match="one .*epoch per grid stage"):
        ConsistencyTrainingTrainer(
            model, [],
            _ct_config(tmp_path, epochs=2, ct_grid_schedule=[4, 8, 16]))


def test_ct_cli_train_then_sample(tmp_path):
    """train.py accepts diffusion_type 'consistency' (from-scratch CT)
    and sample.py runs the result — the same user motion as any other
    training config."""
    from pathlib import Path

    from cache_dir import cpu_cache_dir

    repo = Path(__file__).resolve().parent.parent
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "JAX_COMPILATION_CACHE_DIR": cpu_cache_dir(),
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.5",
    }
    cfg = _ct_config(tmp_path, epochs=1, save_dir=str(tmp_path / "ct_cli"))
    cfg_path = tmp_path / "ct_config.json"
    cfg_path.write_text(json.dumps(cfg))

    subprocess.run(
        [sys.executable, str(repo / "train.py"), "--config", str(cfg_path)],
        check=True, env=env, cwd=str(tmp_path), timeout=900,
    )
    ckpt = tmp_path / "ct_cli" / "consistency_model.ckpt"
    assert ckpt.exists()

    out_dir = tmp_path / "samples"
    subprocess.run(
        [
            sys.executable, str(repo / "sample.py"),
            "--checkpoint", str(ckpt),
            "--num_inference_steps", "2", "--batch_size", "4",
            "--num_samples", "4", "--use_ema",
            "--output_dir", str(out_dir),
        ],
        check=True, env=env, cwd=str(tmp_path), timeout=900,
    )
    assert (out_dir / "samples.png").exists()


def test_ct_save_current_interval_rate_limits_io(tmp_path):
    """`save_current_interval` rate-limits the per-epoch checkpoint
    writes (r4: saving two full pickles EVERY epoch made the iCT step
    look ~60x slower than the ordinary train step at fixture scale —
    the slowdown was checkpoint IO, not compute). The final epoch always
    saves regardless of the interval."""
    from diffusion_models_collection_tpu.factory import get_model
    from diffusion_models_collection_tpu.utils import checkpoint as ckpt_lib
    from diffusion_models_collection_tpu.utils.consistency_trainer import (
        ConsistencyTrainingTrainer,
    )
    from diffusion_models_collection_tpu.utils.tracker import NullTracker

    cfg = _ct_config(tmp_path, epochs=3, save_current_interval=2)
    trainer = ConsistencyTrainingTrainer(
        get_model(cfg), _loader(), cfg,
        rng=jax.random.PRNGKey(0), tracker=NullTracker(),
    )
    saves = []
    orig = trainer._save
    trainer._save = lambda epoch, state, best: (
        saves.append(epoch), orig(epoch, state, best))
    trainer.train()
    # epoch 2 (interval) + epoch 3 (final always saves); NOT epoch 1
    assert saves == [2, 3]
    ckpt = tmp_path / "ct" / "current_model.ckpt"
    assert ckpt_lib.load_checkpoint(ckpt)["epoch"] == 3
