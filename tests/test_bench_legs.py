"""Bench-harness construction smoke tests (r4 VERDICT next-step #2).

Round 4 shipped a crashed serving-latency row in BENCH_r04.json because
bench.py's serving leg passed BASE_CONFIG verbatim into ``DDIM.__init__``
(``ddim_eta`` is not a DDIM kwarg) and nothing in tests/ ever constructed
the bench legs.  These tests execute every ``FAMILY_LEGS`` entry — plus
the train-step and serving legs — on CPU with the model factories and the
timing loop monkeypatched to tiny/no-op versions, so every *constructor*
call in the harness (the get_diffusion config dicts, the
DDIM/ConsistencyModel/FlowMatching kwarg filters, the
ContinuousBatchingEngine wiring) runs for real and a kwarg drift can
never ship silently again.

The timing stub never invokes the sampling closure, so no full-size
model forward runs; the serving leg DOES run real engine ticks, at toy
geometry and 2 inference steps.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# bench.py redirects fd-2 at import time unless opted out; keep pytest's
# stderr intact.  Also snapshot/restore the compilation-cache dir that
# bench.py overrides at import (conftest owns it for the rest of the
# suite).
os.environ["DMC_TPU_KEEP_STDERR"] = "1"
_conftest_cache_dir = jax.config.jax_compilation_cache_dir

import bench  # noqa: E402

jax.config.update("jax_compilation_cache_dir", _conftest_cache_dir)


def _tiny_unet(dtype=None):
    model = bench.UNet(
        image_size=(32, 32), in_channels=3, model_channels=8,
        out_channels=3, num_res_blocks=1, attention_resolutions=(16,),
        channel_mult=(1, 2), num_classes=10,
        **({"dtype": dtype} if dtype is not None else {}),
    )
    params = bench.init_model_params(
        model, jax.random.PRNGKey(0), (32, 32), 3, conditional=True
    )
    return model, params


def _tiny_dit(dtype=None, tome_ratio=0.0):
    model = bench.DiT(
        img_size=(32, 32), patch_size=4, in_channels=3, hidden_size=32,
        depth=1, num_heads=2, num_classes=10, dropout=0.0,
        tome_ratio=tome_ratio, dtype=dtype,
    )
    params = bench.init_model_params(
        model, jax.random.PRNGKey(0), (32, 32), 3, conditional=True
    )
    return model, params


def _tiny_dim(dtype=None):
    model = bench.DiM(
        img_size=(32, 32), patch_size=4, in_channels=3, hidden_size=32,
        depth=1, state_size=4, num_classes=10, dropout=0.0, dtype=dtype,
    )
    params = bench.init_model_params(
        model, jax.random.PRNGKey(0), (32, 32), 3, conditional=True
    )
    return model, params


@pytest.fixture()
def tiny_bench(monkeypatch):
    """Shrink bench's knobs and stub the timing loop (constructors still
    run for real; the sampling closure is never invoked)."""
    monkeypatch.setattr(bench, "_unet", _tiny_unet)
    monkeypatch.setattr(bench, "_dit", _tiny_dit)
    monkeypatch.setattr(bench, "_dim", _tiny_dim)
    monkeypatch.setattr(bench, "NUM_IMAGES", 2)
    monkeypatch.setattr(bench, "INFERENCE_STEPS", 2)
    monkeypatch.setattr(bench, "_timed_sps", lambda run, n=3: (1.0, 1.0))
    return bench


@pytest.mark.parametrize(
    "name", [name for name, _ in __import__("bench").FAMILY_LEGS]
)
def test_family_leg_constructs(tiny_bench, name):
    leg = dict(tiny_bench.FAMILY_LEGS)[name]
    value = leg()
    assert isinstance(value, float)


def test_train_step_leg_runs_tiny(tiny_bench):
    # Real DiffusionTrainer step (fwd+bwd+clip+AdamW+EMA) at toy size —
    # exercises the whole config -> factory -> trainer construction path.
    imgs_per_sec = tiny_bench._leg_train_step(
        batch=4, model_channels=8, num_res_blocks=1
    )
    assert imgs_per_sec > 0


def test_serving_leg_runs_tiny(tiny_bench):
    # Real engine ticks at toy geometry; the batch-mode comparator is
    # stubbed out by the _timed_sps patch.
    p50_ms, extras = tiny_bench._leg_serving(
        num_slots=2, num_requests=2, workers=1
    )
    assert p50_ms > 0
    assert extras["num_slots"] == 2
    assert np.isfinite(extras["p99_ms"])


def test_base_config_keys_accepted_by_every_sampler():
    # The exact drift that shipped r4's crash row: every sampler reached
    # through get_diffusion must accept BASE_CONFIG's keys (get_diffusion
    # filters; direct constructors must filter too — asserted by the leg
    # tests above actually constructing them).
    for sampler in ("ddpm", "ddim", "dpm++"):
        d = bench.get_diffusion(
            dict(bench.BASE_CONFIG, num_inference_steps=2), sampler
        )
        assert d is not None
