"""img2img (SDEdit) + inpainting across DDPM / DDIM / FlowMatching
(extension — the reference samples from pure noise only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.diffusion import DDIM, DDPM, FlowMatching

SHAPE = (2, 8, 8, 3)


def dummy_model(x, t, y=None):
    scale = (t.astype(jnp.float32) / 100.0 + 0.1).reshape(-1, 1, 1, 1)
    out = jnp.tanh(x) * scale
    if y is not None:
        out = out + 0.01 * y.astype(jnp.float32).reshape(-1, 1, 1, 1)
    return out


def make_processes():
    return [
        DDPM(num_timesteps=40),
        DDIM(num_timesteps=40, num_inference_steps=10),
        FlowMatching(num_timesteps=40, num_inference_steps=10),
    ]


@pytest.fixture
def init_image():
    rng = jax.random.PRNGKey(11)
    return jax.random.uniform(rng, SHAPE, minval=-0.8, maxval=0.8)


def test_strength_zero_is_identity(init_image):
    for proc in make_processes():
        out = proc.img2img(dummy_model, init_image, jax.random.PRNGKey(0),
                           strength=0.0)
        np.testing.assert_allclose(out, init_image, atol=1e-6)


def test_strength_monotonicity(init_image):
    """Lower strength stays closer to the input image."""
    for proc in make_processes():
        rng = jax.random.PRNGKey(1)
        d = {
            s: float(jnp.mean(jnp.abs(
                proc.img2img(dummy_model, init_image, rng, strength=s)
                - init_image
            )))
            for s in (0.1, 0.5, 1.0)
        }
        assert d[0.1] < d[0.5] < d[1.0], (type(proc).__name__, d)


def test_img2img_deterministic_and_shaped(init_image):
    for proc in make_processes():
        rng = jax.random.PRNGKey(2)
        a = proc.img2img(dummy_model, init_image, rng, strength=0.6)
        b = proc.img2img(dummy_model, init_image, rng, strength=0.6)
        assert a.shape == SHAPE
        np.testing.assert_allclose(a, b, atol=0)
        assert np.isfinite(np.asarray(a)).all()


def test_inpainting_keep_all_returns_original(init_image):
    """mask = 0 everywhere (keep everything) ends exactly at the input."""
    mask = jnp.zeros(SHAPE, jnp.float32)
    for proc in make_processes():
        out = proc.img2img(dummy_model, init_image, jax.random.PRNGKey(3),
                           strength=1.0, mask=mask)
        np.testing.assert_allclose(out, init_image, atol=1e-5,
                                   err_msg=type(proc).__name__)


def test_inpainting_mask_region_semantics(init_image):
    """mask = 1 on the left half: right half kept exactly, left half
    regenerated (differs from the input)."""
    mask = jnp.zeros(SHAPE, jnp.float32).at[:, :, :4, :].set(1.0)
    for proc in make_processes():
        out = proc.img2img(dummy_model, init_image, jax.random.PRNGKey(4),
                           strength=1.0, mask=mask)
        np.testing.assert_allclose(
            out[:, :, 4:], init_image[:, :, 4:], atol=1e-5,
            err_msg=f"{type(proc).__name__} kept region drifted",
        )
        diff = float(jnp.mean(jnp.abs(out[:, :, :4] - init_image[:, :, :4])))
        assert diff > 1e-3, f"{type(proc).__name__} mask region unchanged"


def test_inpainting_mask_all_equals_plain_img2img(init_image):
    """mask = 1 everywhere is exactly plain img2img (projection no-op)."""
    mask = jnp.ones(SHAPE, jnp.float32)
    for proc in make_processes():
        rng = jax.random.PRNGKey(5)
        a = proc.img2img(dummy_model, init_image, rng, strength=0.7,
                         mask=mask)
        b = proc.img2img(dummy_model, init_image, rng, strength=0.7)
        np.testing.assert_allclose(a, b, atol=1e-6,
                                   err_msg=type(proc).__name__)


def test_img2img_cfg_and_validation(init_image):
    y = jnp.array([1, 2], dtype=jnp.int32)
    for proc in make_processes():
        out = proc.img2img(dummy_model, init_image, jax.random.PRNGKey(6),
                           strength=0.5, y=y, cfg_scale=2.0)
        assert out.shape == SHAPE and np.isfinite(np.asarray(out)).all()
        with pytest.raises(ValueError):
            proc.img2img(dummy_model, init_image, jax.random.PRNGKey(6),
                         strength=0.5, cfg_scale=2.0)  # CFG needs labels
        with pytest.raises(ValueError):
            proc.img2img(dummy_model, init_image, jax.random.PRNGKey(6),
                         strength=1.5)


def test_ddim_img2img_step_count_scales_with_strength(init_image):
    """The DDIM grid is truncated: strength s runs ~s*S steps (visible via
    return_all_timesteps' leading axis)."""
    ddim = DDIM(num_timesteps=100, num_inference_steps=10)
    traj = ddim.img2img(dummy_model, init_image, jax.random.PRNGKey(7),
                        strength=0.5, return_all_timesteps=True)
    assert 4 <= traj.shape[0] <= 6, traj.shape
    traj_full = ddim.img2img(dummy_model, init_image, jax.random.PRNGKey(7),
                             strength=1.0, return_all_timesteps=True)
    assert traj_full.shape[0] == 10


def test_plain_sampler_unchanged_by_img2img_plumbing():
    """known=None keeps sample()'s behavior identical (regression guard for
    the added scan parameter)."""
    ddpm = DDPM(num_timesteps=10)
    rng = jax.random.PRNGKey(42)
    out = ddpm.sample(dummy_model, SHAPE, rng)
    rng_loop, init_rng = jax.random.split(rng)
    img = jax.random.normal(init_rng, SHAPE, dtype=jnp.float32)
    for i in range(9, -1, -1):
        t = jnp.full((SHAPE[0],), i, dtype=jnp.int32)
        img = ddpm.p_sample(dummy_model, img, t, jax.random.fold_in(rng_loop, i))
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-5)


# ----------------------------------------------------- RePaint resampling
def exact_model_for(target, schedule):
    """The exact eps predictor for a point-mass data distribution at
    `target`: eps = (x_t - sqrt(acp_t) * target) / sqrt(1 - acp_t)."""
    from diffusion_models_collection_tpu.diffusion.schedule import extract

    def fn(x, t, y=None):
        a = extract(schedule.sqrt_alphas_cumprod, t, x.ndim)
        s = extract(schedule.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        return (x - a * target) / s

    return fn


@pytest.fixture
def half_mask():
    mask = np.zeros(SHAPE, np.float32)
    mask[:, :, :4, :] = 1.0  # regenerate the left half, keep the right
    return jnp.asarray(mask)


def test_repaint_validation(init_image, half_mask):
    ddpm = DDPM(num_timesteps=40)
    with pytest.raises(ValueError, match="mask"):
        ddpm.img2img(dummy_model, init_image, jax.random.PRNGKey(0),
                     strength=1.0, repaint_resample=3, repaint_jump=5)
    with pytest.raises(ValueError, match="repaint_jump"):
        ddpm.img2img(dummy_model, init_image, jax.random.PRNGKey(0),
                     strength=1.0, mask=half_mask, repaint_resample=3)
    with pytest.raises(ValueError, match="repaint_resample"):
        ddpm.img2img(dummy_model, init_image, jax.random.PRNGKey(0),
                     strength=1.0, mask=half_mask, repaint_resample=0)


def test_repaint_keeps_known_region_exact(init_image, half_mask):
    """After the full RePaint schedule the kept pixels are EXACTLY the
    originals (the final projection lands at t_next = -1 = clean)."""
    ddpm = DDPM(num_timesteps=40)
    out = ddpm.img2img(
        dummy_model, init_image, jax.random.PRNGKey(3), strength=1.0,
        mask=half_mask, repaint_jump=8, repaint_resample=3,
    )
    keep = np.asarray(half_mask) == 0.0
    np.testing.assert_allclose(np.asarray(out)[keep],
                               np.asarray(init_image)[keep], atol=1e-6)
    # and the regenerated half moved
    assert float(jnp.mean(jnp.abs(
        out[:, :, :4, :] - init_image[:, :, :4, :]
    ))) > 0.05


def test_repaint_point_mass_recovery(half_mask):
    """With the exact point-mass model, resampling must still converge to
    the target in the regenerated region — the renoise hops are valid
    forward marginals, so the chain stays on-distribution."""
    ddpm = DDPM(num_timesteps=60)
    target = jnp.full(SHAPE, 0.4, jnp.float32)
    init = jnp.full(SHAPE, -0.2, jnp.float32)
    model = exact_model_for(target, ddpm.schedule)
    out = ddpm.img2img(
        model, init, jax.random.PRNGKey(4), strength=1.0,
        mask=half_mask, repaint_jump=10, repaint_resample=4,
    )
    out = np.asarray(out)
    np.testing.assert_allclose(out[:, :, :4, :], 0.4, atol=0.12)
    np.testing.assert_allclose(out[:, :, 4:, :], -0.2, atol=1e-6)


def test_repaint_differs_from_single_pass_and_is_deterministic(
    init_image, half_mask
):
    ddpm = DDPM(num_timesteps=40)
    kw = dict(strength=1.0, mask=half_mask)
    single = ddpm.img2img(dummy_model, init_image, jax.random.PRNGKey(5),
                          **kw)
    a = ddpm.img2img(dummy_model, init_image, jax.random.PRNGKey(5),
                     repaint_jump=8, repaint_resample=3, **kw)
    b = ddpm.img2img(dummy_model, init_image, jax.random.PRNGKey(5),
                     repaint_jump=8, repaint_resample=3, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert float(jnp.max(jnp.abs(a[:, :, :4, :] - single[:, :, :4, :]))) > 1e-3


def test_repaint_trajectory_length(init_image, half_mask):
    """return_all_timesteps records every executed step: ceil(T'/j) chunks
    x r repeats x j steps (T' = t0+1 = 40 here, j = 8, r = 3 -> 120)."""
    ddpm = DDPM(num_timesteps=40)
    traj = ddpm.img2img(
        dummy_model, init_image, jax.random.PRNGKey(6), strength=1.0,
        mask=half_mask, repaint_jump=8, repaint_resample=3,
        return_all_timesteps=True,
    )
    assert traj.shape == (120,) + SHAPE


def test_repaint_with_cfg(init_image, half_mask):
    ddpm = DDPM(num_timesteps=40)
    y = jnp.asarray([1, 2])
    out = ddpm.img2img(
        dummy_model, init_image, jax.random.PRNGKey(7), strength=1.0,
        mask=half_mask, cfg_scale=2.0, y=y,
        repaint_jump=8, repaint_resample=2,
    )
    keep = np.asarray(half_mask) == 0.0
    np.testing.assert_allclose(np.asarray(out)[keep],
                               np.asarray(init_image)[keep], atol=1e-6)


def test_repaint_large_jump_respects_segment_cap():
    """repaint_jump beyond _MAX_STEPS_PER_SEGMENT still works — the
    driver sub-splits each jump chunk to honor the per-program scan cap
    (the renoise hop still spans the WHOLE jump)."""
    from diffusion_models_collection_tpu.diffusion import ddpm as ddpm_mod

    proc = DDPM(num_timesteps=260)
    shape = (1, 4, 4, 3)
    init = jnp.zeros(shape)
    mask = jnp.ones(shape)  # regenerate everything
    traj = proc.img2img(
        dummy_model, init, jax.random.PRNGKey(8), strength=1.0,
        mask=mask, repaint_jump=260, repaint_resample=2,
        return_all_timesteps=True,
    )
    # 260 steps x 2 repeats, recorded across sub-segments of <= 250
    assert traj.shape == (520,) + shape
    assert ddpm_mod._MAX_STEPS_PER_SEGMENT == 250  # cap still the tested one
