"""Continuous-batching engine: slot trajectories must match the scan
sampler exactly, under admission at arbitrary ticks."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.diffusion import DDIM
from diffusion_models_collection_tpu.serving_engine import (
    ContinuousBatchingEngine,
)

H = W = 8
C = 3
T = 50
STEPS = 6


def _model_fn():
    """Smooth analytic eps denoiser (same family as the sampler tests)."""

    def fn(x, t, y):
        c = (t.astype(jnp.float32) + 1.0) / float(T)
        out = jnp.tanh(x) * c.reshape(-1, 1, 1, 1) * 0.5
        if y is not None:
            out = out + 0.01 * y.astype(jnp.float32).reshape(-1, 1, 1, 1)
        return out

    return jax.tree_util.Partial(fn)


def _make(conditional, num_slots=4, steps_per_tick=1):
    ddim = DDIM(num_timesteps=T, num_inference_steps=STEPS, eta=0.0)
    engine = ContinuousBatchingEngine(
        ddim.schedule,
        ddim._pair_fn(_model_fn()),
        image_shape=(H, W, C),
        num_slots=num_slots,
        num_inference_steps=STEPS,
        num_timesteps=T,
        conditional=conditional,
        clip_denoised=True,
        steps_per_tick=steps_per_tick,
    )
    return ddim, engine


def _noise(seed, k):
    return np.asarray(
        jax.random.normal(jax.random.PRNGKey(seed), (k, H, W, C))
    )


def test_solo_request_matches_scan_sampler_unconditional():
    ddim, engine = _make(conditional=False)
    engine.start()
    try:
        noise = _noise(0, 2)
        out = engine.submit(noise)
        ref = ddim.sample(_model_fn(), (2, H, W, C), jax.random.PRNGKey(9),
                          init_noise=jnp.asarray(noise))
        np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)
    finally:
        engine.stop()


def test_solo_request_matches_scan_sampler_cfg():
    ddim, engine = _make(conditional=True)
    engine.start()
    try:
        noise = _noise(1, 3)
        labels = np.array([1, 2, 3], np.int32)  # already +1 shifted
        out = engine.submit(noise, labels, cfg_scale=2.0)
        ref = ddim.sample_with_cfg(
            _model_fn(), (3, H, W, C), jnp.asarray(labels),
            jax.random.PRNGKey(9), cfg_scale=2.0,
            init_noise=jnp.asarray(noise),
        )
        np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)
    finally:
        engine.stop()


def test_staggered_admission_slot_independence():
    """Requests admitted on different ticks (mixed per-slot timesteps in
    one batch) must each still match their solo scan trajectory."""
    ddim, engine = _make(conditional=True, num_slots=6)
    engine.start()
    try:
        noise_a, noise_b = _noise(2, 2), _noise(3, 3)
        lab_a = np.array([1, 2], np.int32)
        lab_b = np.array([3, 4, 5], np.int32)
        results = {}

        def run_a():
            results["a"] = engine.submit(noise_a, lab_a, cfg_scale=1.5)

        th = threading.Thread(target=run_a)
        th.start()
        time.sleep(0.3)  # let A progress a few ticks before B joins
        results["b"] = engine.submit(noise_b, lab_b, cfg_scale=2.5)
        th.join(timeout=120)
        assert not th.is_alive()

        for key, noise, lab, scale in (
            ("a", noise_a, lab_a, 1.5),
            ("b", noise_b, lab_b, 2.5),
        ):
            ref = ddim.sample_with_cfg(
                _model_fn(), (len(lab), H, W, C), jnp.asarray(lab),
                jax.random.PRNGKey(0), cfg_scale=scale,
                init_noise=jnp.asarray(noise),
            )
            np.testing.assert_allclose(
                results[key], np.asarray(ref), atol=1e-5,
                err_msg=f"request {key} diverged from its solo trajectory",
            )
    finally:
        engine.stop()


def test_slot_reuse_across_many_requests():
    """More total samples than slots: slots must recycle and every
    request deliver, FIFO."""
    ddim, engine = _make(conditional=False, num_slots=2)
    engine.start()
    try:
        outs = []
        for seed in range(5):
            outs.append(engine.submit(_noise(10 + seed, 2)))
        for seed, out in enumerate(outs):
            ref = ddim.sample(
                _model_fn(), (2, H, W, C), jax.random.PRNGKey(0),
                init_noise=jnp.asarray(_noise(10 + seed, 2)),
            )
            np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)
        # all slots free again after the burst
        assert sorted(engine._free) == [0, 1]
        assert engine.ticks >= STEPS  # engine actually stepped the device
    finally:
        engine.stop()


def test_oversized_request_rejected():
    _, engine = _make(conditional=False, num_slots=2)
    engine.start()
    try:
        with pytest.raises(ValueError, match=r"\[1, 2\]"):
            engine.submit(_noise(0, 3))
    finally:
        engine.stop()


def test_service_continuous_mode(tmp_path):
    """serve.py SamplerService with continuous=True end to end."""
    import serve as serve_mod
    from diffusion_models_collection_tpu.factory import (
        get_model, init_model_params,
    )
    from diffusion_models_collection_tpu.utils import checkpoint as ckpt_lib

    cfg = {
        "model_type": "unet",
        "model_params": {
            "in_channels": 3, "model_channels": 8, "out_channels": 3,
            "num_res_blocks": 1, "attention_resolutions": (4,),
            "channel_mult": (1, 2), "dropout": 0.0,
        },
        "image_size": (8, 8), "conditional": True, "num_classes": 5,
        "num_timesteps": T, "beta_start": 1e-4, "beta_end": 0.02,
        "beta_schedule": "linear", "num_inference_steps": STEPS,
        "ddim_eta": 0.0, "cfg_scale": 1.5,
    }
    model = get_model(cfg)
    params = init_model_params(model, jax.random.PRNGKey(0), (8, 8), 3, True)
    path = tmp_path / "m.ckpt"
    ckpt_lib.save_checkpoint(path, epoch=1, params=params, opt_state=None,
                             best_loss=1.0, config=cfg)
    service = serve_mod.SamplerService(
        str(path), sampling_method="ddim", num_inference_steps=STEPS,
        batch_size=4, continuous=True,
    )
    try:
        out = service.generate(3, labels=[0, 1, 2], seed=7, cfg_scale=1.5)
        assert out.shape == (3, 8, 8, 3)
        assert out.min() >= 0.0 and out.max() <= 1.0
        # parity with the padded batch-mode service path is not expected
        # bit-for-bit (different init-noise layout), but determinism is
        out2 = service.generate(3, labels=[0, 1, 2], seed=7, cfg_scale=1.5)
        np.testing.assert_allclose(out, out2, atol=1e-6)
        with pytest.raises(ValueError):
            service.generate(3, labels=[0, 1], seed=0)
    finally:
        service.engine.stop()


def test_service_rejects_continuous_non_ddim(tmp_path):
    import serve as serve_mod

    with pytest.raises(ValueError, match="ddim"):
        from diffusion_models_collection_tpu.factory import (
            get_model, init_model_params,
        )
        from diffusion_models_collection_tpu.utils import (
            checkpoint as ckpt_lib,
        )

        cfg = {
            "model_type": "unet",
            "model_params": {
                "in_channels": 3, "model_channels": 8, "out_channels": 3,
                "num_res_blocks": 1, "attention_resolutions": (4,),
                "channel_mult": (1, 2), "dropout": 0.0,
            },
            "image_size": (8, 8), "conditional": False,
            "num_timesteps": T, "beta_start": 1e-4, "beta_end": 0.02,
            "beta_schedule": "linear", "num_inference_steps": STEPS,
        }
        model = get_model(cfg)
        params = init_model_params(
            model, jax.random.PRNGKey(0), (8, 8), 3, False
        )
        path = tmp_path / "m.ckpt"
        ckpt_lib.save_checkpoint(path, epoch=1, params=params,
                                 opt_state=None, best_loss=1.0, config=cfg)
        serve_mod.SamplerService(
            str(path), sampling_method="dpm++", continuous=True,
        )


def test_engine_honors_karras_grid_and_guidance_rescale():
    """The engine must reproduce a karras-spaced, guidance-rescaled DDIM
    trajectory when given the sampler's own grid and knobs."""
    ddim = DDIM(num_timesteps=T, num_inference_steps=STEPS, eta=0.0,
                timestep_spacing="karras", guidance_rescale=0.5)
    engine = ContinuousBatchingEngine(
        ddim.schedule,
        ddim._pair_fn(_model_fn()),
        image_shape=(H, W, C),
        num_slots=4,
        num_timesteps=T,
        timesteps=ddim.inference_timesteps,
        guidance_rescale=ddim.guidance_rescale,
        conditional=True,
        clip_denoised=True,
    ).start()
    try:
        noise = _noise(4, 2)
        labels = np.array([1, 2], np.int32)
        out = engine.submit(noise, labels, cfg_scale=3.0)
        ref = ddim.sample_with_cfg(
            _model_fn(), (2, H, W, C), jnp.asarray(labels),
            jax.random.PRNGKey(0), cfg_scale=3.0,
            init_noise=jnp.asarray(noise),
        )
        np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)
    finally:
        engine.stop()


def test_engine_death_fails_requests_loudly():
    """A fatal error on the engine thread must fail in-flight requests
    with the cause (not hang) and make later submits raise immediately."""
    ddim, _ = _make(conditional=False)

    def bad_fn(x, t, y):
        raise RuntimeError("boom")

    engine = ContinuousBatchingEngine(
        ddim.schedule, jax.tree_util.Partial(bad_fn),
        image_shape=(H, W, C), num_slots=2,
        num_inference_steps=STEPS, num_timesteps=T,
        conditional=False,
    ).start()
    try:
        with pytest.raises(RuntimeError, match="engine died"):
            engine.submit(_noise(0, 1), timeout=60)
        with pytest.raises(RuntimeError, match="engine is dead"):
            engine.submit(_noise(1, 1))
    finally:
        engine.stop()


def test_timed_out_request_is_dropped_from_queue():
    """A submit() that times out while queued must never be admitted —
    abandoned work must not compete with live requests."""
    ddim, engine = _make(conditional=False, num_slots=1)
    engine.start()
    try:
        results = {}

        def run_a():
            results["a"] = engine.submit(_noise(0, 1))

        th = threading.Thread(target=run_a)
        th.start()
        time.sleep(0.05)  # A claims the only slot
        with pytest.raises(TimeoutError):
            engine.submit(_noise(1, 1), timeout=0.01)
        th.join(timeout=120)
        assert not th.is_alive() and "a" in results
        # the cancelled request is gone, not waiting for slots
        assert engine._pending == []
        # give the loop a beat: nothing new should be admitted
        time.sleep(0.3)
        assert not engine._inflight
    finally:
        engine.stop()


def test_service_continuous_rejects_non_vp_checkpoint(tmp_path):
    """A consistency checkpoint must be refused by --continuous (the
    engine would DDIM-step a non-denoiser and emit garbage silently)."""
    import serve as serve_mod
    from diffusion_models_collection_tpu.factory import (
        get_model, init_model_params,
    )
    from diffusion_models_collection_tpu.utils import checkpoint as ckpt_lib

    cfg = {
        "model_type": "unet",
        "model_params": {
            "in_channels": 3, "model_channels": 8, "out_channels": 3,
            "num_res_blocks": 1, "attention_resolutions": (4,),
            "channel_mult": (1, 2), "dropout": 0.0,
        },
        "image_size": (8, 8), "conditional": False,
        "num_timesteps": T, "beta_start": 1e-4, "beta_end": 0.02,
        "beta_schedule": "linear", "num_inference_steps": 2,
        "diffusion_type": "consistency",
    }
    model = get_model(cfg)
    params = init_model_params(model, jax.random.PRNGKey(0), (8, 8), 3,
                               False)
    path = tmp_path / "cm.ckpt"
    ckpt_lib.save_checkpoint(path, epoch=1, params=params, opt_state=None,
                             best_loss=1.0, config=cfg)
    with pytest.raises(ValueError, match="diffusion_type"):
        serve_mod.SamplerService(str(path), sampling_method="ddim",
                                 continuous=True)


@pytest.mark.parametrize("spt", [2, 3, STEPS])
def test_steps_per_tick_parity_and_staggered(spt):
    """steps_per_tick>1 (fori_loop over the identical step body) keeps
    every slot's trajectory bit-comparable to the scan sampler, including
    requests admitted on different ticks (shadow-pos completion must not
    deliver early or late). spt=STEPS = whole trajectory in one tick."""
    ddim, engine = _make(conditional=True, num_slots=6, steps_per_tick=spt)
    engine.start()
    try:
        noise_a, noise_b = _noise(12, 2), _noise(13, 3)
        lab_a = np.array([1, 2], np.int32)
        lab_b = np.array([3, 4, 5], np.int32)
        results = {}

        def run_a():
            results["a"] = engine.submit(noise_a, lab_a, cfg_scale=1.5)

        th = threading.Thread(target=run_a)
        th.start()
        time.sleep(0.2)
        results["b"] = engine.submit(noise_b, lab_b, cfg_scale=2.5)
        th.join(timeout=120)
        assert not th.is_alive()

        for key, noise, lab, scale in (
            ("a", noise_a, lab_a, 1.5),
            ("b", noise_b, lab_b, 2.5),
        ):
            ref = ddim.sample_with_cfg(
                _model_fn(), (len(lab), H, W, C), jnp.asarray(lab),
                jax.random.PRNGKey(0), cfg_scale=scale,
                init_noise=jnp.asarray(noise),
            )
            np.testing.assert_allclose(
                results[key], np.asarray(ref), atol=1e-5,
                err_msg=f"request {key} diverged at steps_per_tick={spt}",
            )
    finally:
        engine.stop()


def test_steps_per_tick_validation():
    with pytest.raises(ValueError, match="steps_per_tick"):
        _make(conditional=False, steps_per_tick=0)
    with pytest.raises(ValueError, match="steps_per_tick"):
        _make(conditional=False, steps_per_tick=STEPS + 1)
