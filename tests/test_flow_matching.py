"""Flow matching / rectified flow (extension — the reference has no flow).

Core correctness lever: for point-mass data the rectified-flow velocity
field is linear in x and constant along trajectories, so Euler is EXACT at
any step count — the sampler must recover x0 to float precision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.diffusion import FlowMatching
from diffusion_models_collection_tpu.factory import get_diffusion

SHAPE = (2, 8, 8, 3)
# T chosen so the tau grid hits exact integer timesteps: (T-1) % S == 0
T, S = 101, 10


def exact_point_model(x0_target, num_timesteps):
    """The exact marginal velocity for point data {x0}: v = (x - x0)/tau."""

    def fn(x, t, y=None):
        tau = (t.astype(jnp.float32) / (num_timesteps - 1)).reshape(
            -1, *((1,) * (x.ndim - 1))
        )
        return (x - x0_target) / jnp.maximum(tau, 1e-8)

    return fn


def test_interpolant_endpoints():
    fm = FlowMatching(num_timesteps=T)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(rng, SHAPE, minval=-1, maxval=1)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), SHAPE)
    b = SHAPE[0]
    np.testing.assert_allclose(
        fm.q_sample(x0, jnp.zeros((b,), jnp.int32), noise), x0, atol=1e-6
    )
    np.testing.assert_allclose(
        fm.q_sample(x0, jnp.full((b,), T - 1, jnp.int32), noise), noise,
        atol=1e-6,
    )
    # midpoint is the straight average of the two marginals at tau=0.5
    mid = fm.q_sample(x0, jnp.full((b,), (T - 1) // 2, jnp.int32), noise)
    np.testing.assert_allclose(mid, 0.5 * x0 + 0.5 * noise, atol=1e-5)


def test_p_losses_zero_for_exact_velocity():
    fm = FlowMatching(num_timesteps=T)
    rng = jax.random.PRNGKey(1)
    x0 = jax.random.normal(rng, SHAPE)
    noise = jax.random.normal(jax.random.fold_in(rng, 2), SHAPE)
    t = jnp.array([7, 80], dtype=jnp.int32)
    loss = fm.p_losses(lambda x, tt, yy: noise - x0, x0, t, noise)
    assert float(loss) < 1e-12


@pytest.mark.parametrize("solver", ["euler", "heun"])
def test_exact_recovery_point_mass(solver):
    """With the exact point-mass velocity field, sampling recovers x0
    exactly at ANY step count (the field is constant along trajectories)."""
    fm = FlowMatching(num_timesteps=T, num_inference_steps=S, solver=solver)
    x0 = jnp.full(SHAPE, 0.37, jnp.float32)  # inside [-1,1]: clip is a no-op
    out = fm.sample(exact_point_model(x0, T), SHAPE, jax.random.PRNGKey(3))
    np.testing.assert_allclose(out, x0, rtol=0, atol=5e-4)


def test_heun_beats_euler_on_nonlinear_field():
    """2nd-order solver converges faster on a curved velocity field."""

    def curved(x, t, y=None):
        tau = (t.astype(jnp.float32) / (T - 1)).reshape(-1, 1, 1, 1)
        return jnp.tanh(x) * (1.0 + tau)

    rng = jax.random.PRNGKey(4)
    dense = FlowMatching(num_timesteps=T, num_inference_steps=512,
                         solver="heun")
    ref = dense.sample(curved, SHAPE, rng)

    def err(solver, steps):
        fm = FlowMatching(num_timesteps=T, num_inference_steps=steps,
                          solver=solver)
        return float(jnp.max(jnp.abs(fm.sample(curved, SHAPE, rng) - ref)))

    e_euler, e_heun = err("euler", 8), err("heun", 8)
    assert e_heun < 0.5 * e_euler, (e_euler, e_heun)
    # self-convergence: more steps monotonically reduce Euler error
    assert err("euler", 32) < e_euler


def test_cfg_guidance_semantics():
    """Fused CFG velocity equals the two-call formula; scale 1 == cond."""

    def vel(x, t, y=None):
        base = jnp.tanh(x) * 0.1
        if y is not None:
            base = base + 0.05 * y.astype(jnp.float32).reshape(-1, 1, 1, 1)
        return base

    fm = FlowMatching(num_timesteps=T, num_inference_steps=6)
    rng = jax.random.PRNGKey(5)
    y = jnp.array([1, 2], dtype=jnp.int32)
    # bounded init keeps the implied x0 inside [-1,1]: sample()'s x0-clip
    # (DDPM-parity semantics) is then a no-op and the two paths compare
    init = jax.random.uniform(jax.random.fold_in(rng, 1), SHAPE,
                              minval=-0.5, maxval=0.5)
    out1 = fm.sample_with_cfg(vel, SHAPE, y, rng, cfg_scale=1.0,
                              p_threshold=None, init_noise=init)
    # scale=1 reduces to the conditional model exactly
    cond_only = fm.sample(lambda x, t, yy: vel(x, t, y), SHAPE, rng,
                          init_noise=init)
    np.testing.assert_allclose(out1, cond_only, rtol=1e-5, atol=1e-5)
    # guided trajectories differ from unguided and stay finite
    out3 = fm.sample_with_cfg(vel, SHAPE, y, rng, cfg_scale=3.0,
                              init_noise=init)
    assert np.isfinite(np.asarray(out3)).all()
    assert float(jnp.max(jnp.abs(out3 - out1))) > 1e-4


def test_init_noise_hook_and_determinism():
    fm = FlowMatching(num_timesteps=T, num_inference_steps=5)

    def vel(x, t, y=None):
        return jnp.tanh(x) * 0.2

    rng = jax.random.PRNGKey(6)
    noise = jax.random.normal(jax.random.fold_in(rng, 9), SHAPE)
    a = fm.sample(vel, SHAPE, rng, init_noise=noise)
    b = fm.sample(vel, SHAPE, jax.random.PRNGKey(777), init_noise=noise)
    np.testing.assert_allclose(a, b, atol=0)  # ODE: init noise decides all
    traj = fm.sample(vel, SHAPE, rng, init_noise=noise,
                     return_all_timesteps=True)
    assert traj.shape == (5,) + SHAPE
    np.testing.assert_allclose(traj[-1], a, atol=1e-6)


def test_progress_segments_identical(capsys):
    fm = FlowMatching(num_timesteps=T, num_inference_steps=8)

    def vel(x, t, y=None):
        return jnp.tanh(x) * 0.2

    rng = jax.random.PRNGKey(8)
    quiet = fm.sample(vel, SHAPE, rng)
    loud = fm.sample(vel, SHAPE, rng, progress=True)
    np.testing.assert_allclose(loud, quiet, atol=0)
    assert "step" in capsys.readouterr().out


def test_factory_dispatch_and_validation():
    cfg = {
        "num_timesteps": 40, "beta_start": 1e-4, "beta_end": 0.02,
        "beta_schedule": "linear", "diffusion_type": "flow_matching",
        "num_inference_steps": 12, "flow_solver": "heun",
    }
    fm = get_diffusion(cfg)
    assert isinstance(fm, FlowMatching)
    assert fm.num_inference_steps == 12 and fm.solver == "heun"
    # the key overrides the CLI sampling method (ddim grid is meaningless)
    assert isinstance(get_diffusion(cfg, "ddim"), FlowMatching)
    with pytest.raises(ValueError):
        get_diffusion({**cfg, "diffusion_type": "score_sde"})
    with pytest.raises(ValueError):
        FlowMatching(num_timesteps=40, solver="rk4")
    with pytest.raises(ValueError):
        FlowMatching(num_timesteps=1)


def test_trainer_flow_matching_end_to_end(tmp_path):
    """A tiny UNet trains under the flow objective; in-training sampling
    goes through FlowMatching.sample_with_cfg unchanged."""
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
        "diffusion_type": "flow_matching", "num_inference_steps": 4,
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
    assert isinstance(diffusion, FlowMatching)
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
