"""CFG guidance rescale (Lin et al. 2023 §3.4) — extension.

High CFG scales blow up the per-sample contrast of the guided prediction;
the rescale pulls the guided x0's std back toward the conditional
branch's (x0_res = x0_g * std(x0_c)/std(x0_g)) and blends with factor
phi. We define the rescale in x0 space and re-derive eps from the
rescaled x0 so the (eps, x0) pair stays self-consistent — see
`base.cfg_eps_x0`. phi = 0 (default) is bit-exact plain CFG.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.diffusion import DDIM, DDPM, DPMSolverPP
from diffusion_models_collection_tpu.diffusion import base
from diffusion_models_collection_tpu.factory import get_diffusion

SHAPE = (3, 8, 8, 3)
KW = dict(num_timesteps=40, beta_start=1e-4, beta_end=0.02,
          beta_schedule="linear")
NUM_CLASSES = 4


def _cond_eps_model(rng):
    """A y-dependent eps model: cond/uncond branches genuinely differ."""
    w = jax.random.normal(rng, (NUM_CLASSES + 1, SHAPE[-1]))

    def fn(x, t, y):
        shift = w[y].reshape(x.shape[0], 1, 1, SHAPE[-1])
        return jnp.tanh(x) * 0.4 + 0.3 * shift

    return jax.tree_util.Partial(fn)


def _pair(schedule, model):
    return base.wrap_model_as_eps_x0(schedule, model, "eps")


def _setup():
    d = DDPM(**KW)
    model = _cond_eps_model(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    t = jnp.array([5, 20, 35], jnp.int32)
    y = jnp.array([1, 2, 3], jnp.int32)
    return d, _pair(d.schedule, model), x, t, y


def test_phi_zero_is_bit_exact_plain_cfg():
    d, pair, x, t, y = _setup()
    eps0, x00 = base.cfg_eps_x0(pair, x, t, y, jnp.float32(3.0))
    eps1, x01 = base.cfg_eps_x0(
        pair, x, t, y, jnp.float32(3.0),
        guidance_rescale=0.0, schedule=d.schedule,
    )
    np.testing.assert_array_equal(np.asarray(eps0), np.asarray(eps1))
    np.testing.assert_array_equal(np.asarray(x00), np.asarray(x01))


def test_phi_one_matches_conditional_std():
    d, pair, x, t, y = _setup()
    # the conditional branch alone (cfg_scale = 1 selects it exactly)
    _, x0_c = base.cfg_eps_x0(pair, x, t, y, jnp.float32(1.0))
    _, x0_r = base.cfg_eps_x0(
        pair, x, t, y, jnp.float32(7.0),
        guidance_rescale=1.0, schedule=d.schedule,
    )
    axes = tuple(range(1, x0_r.ndim))
    np.testing.assert_allclose(
        np.asarray(jnp.std(x0_r, axis=axes)),
        np.asarray(jnp.std(x0_c, axis=axes)),
        rtol=1e-5,
    )


def test_blend_is_convex_between_endpoints():
    d, pair, x, t, y = _setup()
    scale = jnp.float32(5.0)
    _, x0_plain = base.cfg_eps_x0(pair, x, t, y, scale)
    _, x0_full = base.cfg_eps_x0(
        pair, x, t, y, scale, guidance_rescale=1.0, schedule=d.schedule
    )
    _, x0_half = base.cfg_eps_x0(
        pair, x, t, y, scale, guidance_rescale=0.5, schedule=d.schedule
    )
    np.testing.assert_allclose(
        np.asarray(x0_half),
        0.5 * np.asarray(x0_full) + 0.5 * np.asarray(x0_plain),
        rtol=1e-5, atol=1e-6,
    )


def test_rescaled_pair_stays_consistent():
    """eps must equal (x - a*x0)/b after the rescale — samplers use both."""
    d, pair, x, t, y = _setup()
    eps, x0 = base.cfg_eps_x0(
        pair, x, t, y, jnp.float32(4.0),
        guidance_rescale=0.7, schedule=d.schedule,
    )
    a = base.extract(d.schedule.sqrt_alphas_cumprod, t, x.ndim)
    b = base.extract(d.schedule.sqrt_one_minus_alphas_cumprod, t, x.ndim)
    np.testing.assert_allclose(
        np.asarray(eps), np.asarray((x - a * x0) / b), rtol=1e-4, atol=1e-5
    )


def test_cfg_scale_one_makes_rescale_a_noop():
    d, pair, x, t, y = _setup()
    _, x0_plain = base.cfg_eps_x0(pair, x, t, y, jnp.float32(1.0))
    _, x0_r = base.cfg_eps_x0(
        pair, x, t, y, jnp.float32(1.0),
        guidance_rescale=1.0, schedule=d.schedule,
    )
    # guided == conditional at scale 1, so std ratio == 1 exactly
    np.testing.assert_allclose(
        np.asarray(x0_r), np.asarray(x0_plain), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("cls,kw", [
    (DDPM, {}),
    (DDIM, {"num_inference_steps": 8}),
    (DPMSolverPP, {"num_inference_steps": 8}),
])
def test_sampling_end_to_end(cls, kw):
    model = _cond_eps_model(jax.random.PRNGKey(2))
    rng = jax.random.PRNGKey(3)
    y = jnp.array([1, 2, 3], jnp.int32)
    plain = cls(**kw, **KW)
    res = cls(guidance_rescale=0.7, **kw, **KW)
    out_plain = plain.sample_with_cfg(model, SHAPE, y, rng, cfg_scale=4.0)
    out_res = res.sample_with_cfg(model, SHAPE, y, rng, cfg_scale=4.0)
    assert np.isfinite(np.asarray(out_res)).all()
    # phi > 0 actually changes the trajectory...
    assert not np.allclose(np.asarray(out_plain), np.asarray(out_res))
    # ...and an explicit phi = 0 object is bit-identical to the default
    zero = cls(guidance_rescale=0.0, **kw, **KW)
    out_zero = zero.sample_with_cfg(model, SHAPE, y, rng, cfg_scale=4.0)
    np.testing.assert_array_equal(np.asarray(out_plain), np.asarray(out_zero))


def test_unguided_sampling_unaffected():
    model = _cond_eps_model(jax.random.PRNGKey(2))
    rng = jax.random.PRNGKey(5)
    y = jnp.zeros((SHAPE[0],), jnp.int32)
    plain = DDIM(num_inference_steps=8, **KW)
    res = DDIM(guidance_rescale=0.9, num_inference_steps=8, **KW)
    np.testing.assert_array_equal(
        np.asarray(plain.sample(model, SHAPE, rng, y=y)),
        np.asarray(res.sample(model, SHAPE, rng, y=y)),
    )


def test_validation_rejects_out_of_range():
    for bad in (-0.1, 1.5):
        for cls in (DDPM, DDIM, DPMSolverPP):
            with pytest.raises(ValueError):
                cls(guidance_rescale=bad, **KW)


def test_factory_plumbs_guidance_rescale():
    cfg = dict(KW, guidance_rescale=0.6)
    for method in ("ddpm", "ddim", "dpm++"):
        assert get_diffusion(cfg, method).guidance_rescale == 0.6
    assert get_diffusion(dict(KW)).guidance_rescale == 0.0  # parity default


def test_factory_rejects_flow_matching_rescale():
    cfg = dict(num_timesteps=40, diffusion_type="flow_matching",
               guidance_rescale=0.5)
    with pytest.raises(ValueError, match="flow matching"):
        get_diffusion(cfg)
