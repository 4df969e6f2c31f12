"""Zero-terminal-SNR schedules (Lin et al. 2023) — extension.

The reference's linear schedule leaves SNR(T-1) > 0, so models never see
pure noise in training yet sampling STARTS from pure noise — a train/test
mismatch Lin et al. fix by rescaling sqrt(acp) affinely to acp[T-1] = 0.
That makes eps-parameterized x0 recovery undefined at the terminal step
(0/0), which is why the samplers convert model outputs to an (eps, x0)
pair DIRECTLY per parameterization (`base.wrap_model_as_eps_x0`) instead
of funneling through eps: v/x0 outputs stay finite at SNR = 0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.diffusion import (
    DDIM, DDPM, DPMSolverPP,
)
from diffusion_models_collection_tpu.diffusion import base
from diffusion_models_collection_tpu.diffusion.schedule import NoiseSchedule
from diffusion_models_collection_tpu.factory import get_diffusion

SHAPE = (2, 8, 8, 3)
KW = dict(num_timesteps=60, beta_start=1e-4, beta_end=0.02,
          beta_schedule="linear")


def test_schedule_rescale_properties():
    ref = NoiseSchedule.create(**KW)
    z = NoiseSchedule.create(zero_terminal_snr=True, **KW)
    acp = np.asarray(z.alphas_cumprod)
    assert acp[-1] == 0.0  # terminal SNR exactly zero
    np.testing.assert_allclose(
        acp[0], np.asarray(ref.alphas_cumprod)[0], rtol=1e-6
    )  # first step unchanged
    assert (np.diff(acp) < 0).all()  # still strictly decreasing
    # betas/alphas rebuilt consistently from the rescaled cumprod
    alphas = np.asarray(z.alphas)
    np.testing.assert_allclose(np.cumprod(alphas), acp, rtol=1e-4, atol=1e-7)
    assert alphas[-1] == 0.0 and np.asarray(z.betas)[-1] == 1.0
    # the ancestral posterior stays finite everywhere
    for name in ("posterior_variance", "posterior_log_variance_clipped",
                 "posterior_mean_coef1", "posterior_mean_coef2"):
        assert np.isfinite(np.asarray(getattr(z, name))).all(), name


def test_q_sample_terminal_is_pure_noise():
    d = DDPM(prediction_type="v", zero_terminal_snr=True, **KW)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, SHAPE)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), SHAPE)
    t = jnp.full((SHAPE[0],), KW["num_timesteps"] - 1, jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(d.q_sample(x0, t, noise)), np.asarray(noise)
    )


def _exact_v_model(schedule, target):
    """Bayes-optimal v for a point-mass dataset at `target`:
    x0_hat = target always, so v = (a*x - target)/b — finite at a = 0."""

    def fn(x, t, y=None):
        a = base.extract(schedule.sqrt_alphas_cumprod, t, x.ndim)
        b = base.extract(schedule.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        return (a * x - target) / jnp.maximum(b, 1e-12)

    return jax.tree_util.Partial(fn)


def test_pair_conversion_finite_at_terminal():
    d = DDIM(prediction_type="v", zero_terminal_snr=True,
             num_inference_steps=8, **KW)
    target = 0.3 * jnp.ones(SHAPE)
    pair = base.wrap_model_as_eps_x0(d.schedule, _exact_v_model(d.schedule, target), "v")
    x = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    t = jnp.full((SHAPE[0],), KW["num_timesteps"] - 1, jnp.int32)
    eps, x0 = pair(x, t, None)
    assert np.isfinite(np.asarray(eps)).all()
    assert np.isfinite(np.asarray(x0)).all()
    # at SNR 0: eps == x (a=0, b=1) and x0 == -b*v == exact target
    np.testing.assert_allclose(np.asarray(eps), np.asarray(x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(x0), 0.3, rtol=1e-4)


@pytest.mark.parametrize("cls,kw", [
    (DDIM, {"num_inference_steps": 12}),
    (DPMSolverPP, {"num_inference_steps": 12}),
])
def test_fast_samplers_recover_point_mass_under_zero_snr(cls, kw):
    d = cls(prediction_type="v", zero_terminal_snr=True, **kw, **KW)
    target = 0.4 * jnp.ones(SHAPE)
    fn = _exact_v_model(d.schedule, target)
    out = d.sample(fn, SHAPE, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), 0.4, atol=5e-3)


def test_ddpm_ancestral_finite_and_near_point_mass_under_zero_snr():
    d = DDPM(prediction_type="v", zero_terminal_snr=True, **KW)
    target = 0.4 * jnp.ones(SHAPE)
    out = d.sample(_exact_v_model(d.schedule, target), SHAPE,
                   jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()
    # ancestral noise at t=0 is masked, posterior contracts to the target
    np.testing.assert_allclose(np.asarray(out), 0.4, atol=0.05)


def test_x0_prediction_also_supported():
    d = DDIM(prediction_type="x0", zero_terminal_snr=True,
             num_inference_steps=10, **KW)

    def x0_model(x, t, y=None):
        return 0.2 * jnp.ones_like(x)

    out = d.sample(jax.tree_util.Partial(x0_model), SHAPE, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), 0.2, atol=5e-3)


def test_eps_prediction_rejected():
    for cls in (DDPM, DDIM, DPMSolverPP):
        with pytest.raises(ValueError):
            cls(zero_terminal_snr=True, **KW)


def test_factory_passes_zero_terminal_snr():
    cfg = dict(KW, prediction_type="v", zero_terminal_snr=True)
    for method in ("ddpm", "ddim", "dpm++"):
        d = get_diffusion(cfg, method)
        assert d.zero_terminal_snr
        assert float(d.schedule.alphas_cumprod[-1]) == 0.0
    cfg2 = dict(KW)
    assert not get_diffusion(cfg2).zero_terminal_snr  # parity default


def test_pair_wrapper_matches_eps_funnel_on_standard_schedules():
    """Regression: on ordinary (nonzero-SNR) schedules the new direct
    (eps, x0) conversion agrees with round 1's eps funnel for every
    parameterization."""
    d = DDPM(**KW)
    rng = jax.random.PRNGKey(4)
    x = jax.random.normal(rng, SHAPE)
    t = jnp.array([3, 40], jnp.int32)

    def eps_fn(xx, tt, yy=None):
        return jnp.tanh(xx) * 0.5

    for ptype in ("eps", "v", "x0"):
        # express the same eps model in ptype space
        def model(xx, tt, yy=None, _p=ptype):
            eps = eps_fn(xx, tt, yy)
            if _p == "eps":
                return eps
            x0 = base.predict_x0_from_eps(d.schedule, xx, tt, eps)
            if _p == "x0":
                return x0
            a = base.extract(d.schedule.sqrt_alphas_cumprod, tt, xx.ndim)
            b = base.extract(
                d.schedule.sqrt_one_minus_alphas_cumprod, tt, xx.ndim
            )
            return a * eps - b * x0

        eps_f = base.wrap_model_as_eps(d.schedule, model, ptype)(x, t, None)
        x0_f = base.predict_x0_from_eps(d.schedule, x, t, eps_f)
        eps_p, x0_p = base.wrap_model_as_eps_x0(d.schedule, model, ptype)(x, t, None)
        np.testing.assert_allclose(
            np.asarray(eps_p), np.asarray(eps_f), rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(x0_p), np.asarray(x0_f), rtol=2e-4, atol=2e-5
        )
