"""FreeU (Si et al. 2023, extension beyond the reference — ops/fourier.py
+ models/unet.py): the Fourier low-pass filter's spectral semantics, the
parity contract (freeu=None and the all-ones factors trace to identical
programs), parameter-tree invariance (existing UNet checkpoints apply
unchanged), and the factor plumbing through factory/config."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusion_models_collection_tpu.factory import get_model
from diffusion_models_collection_tpu.models import UNet
from diffusion_models_collection_tpu.ops.fourier import fourier_lowpass_scale


# ------------------------------------------------------ the Fourier filter
def test_lowpass_constant_image_is_pure_dc():
    """A constant map has all energy at DC (inside any threshold), so the
    filter must scale it exactly by `scale`."""
    x = jnp.full((2, 8, 8, 3), 1.7, jnp.float32)
    out = fourier_lowpass_scale(x, threshold=1, scale=0.25)
    np.testing.assert_allclose(np.asarray(out), 1.7 * 0.25, rtol=1e-5)


def test_lowpass_nyquist_checkerboard_untouched():
    """The (-1)^(i+j) checkerboard lives at the Nyquist frequency — the
    far corner of the shifted spectrum — so a threshold-1 low-pass must
    return it unchanged (up to FFT round trip)."""
    i = jnp.arange(8)
    checker = ((-1.0) ** (i[:, None] + i[None, :])).astype(jnp.float32)
    x = jnp.broadcast_to(checker[None, :, :, None], (2, 8, 8, 3))
    out = fourier_lowpass_scale(x, threshold=1, scale=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_lowpass_scale_one_is_identity():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    out = fourier_lowpass_scale(x, threshold=1, scale=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_lowpass_full_threshold_scales_everything():
    """A threshold covering the whole spectrum scales the entire map."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 2))
    out = fourier_lowpass_scale(x, threshold=8, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), 0.5 * np.asarray(x),
                               atol=1e-5)


def test_lowpass_energy_decreases_for_damping():
    """scale < 1 on the low band can only remove energy (Parseval)."""
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 3))
    out = fourier_lowpass_scale(x, threshold=2, scale=0.3)
    assert float(jnp.sum(out**2)) < float(jnp.sum(x**2))


def test_lowpass_threshold_validation():
    with pytest.raises(ValueError, match="threshold"):
        fourier_lowpass_scale(jnp.zeros((1, 8, 8, 1)), threshold=0,
                              scale=0.5)


def test_lowpass_preserves_dtype():
    x = jnp.ones((1, 4, 4, 2), jnp.bfloat16)
    assert fourier_lowpass_scale(x, 1, 0.5).dtype == jnp.bfloat16


# --------------------------------------------------------- UNet semantics
def _tiny_unet(**kw):
    return UNet(
        image_size=(8, 8),
        in_channels=3,
        model_channels=8,
        out_channels=3,
        num_res_blocks=1,
        attention_resolutions=(4,),
        channel_mult=(1, 2),
        dropout=0.0,
        **kw,
    )


def _init_io():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    t = jnp.array([3, 7], jnp.int32)
    params = _tiny_unet().init(jax.random.PRNGKey(1), x, t)
    return x, t, params


def test_unit_factors_are_bitwise_parity():
    """b=s=1 must short-circuit every FreeU op at trace time, so the
    program (and its output) is byte-identical to the default model —
    the same discipline as phi=0 guidance rescale."""
    x, t, params = _init_io()
    base = _tiny_unet().apply(params, x, t)
    ones = _tiny_unet(freeu=(1.0, 1.0, 1.0, 1.0)).apply(params, x, t)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(ones))


def test_param_tree_unchanged():
    """FreeU is parameter-free: any existing UNet checkpoint applies."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3))
    t = jnp.zeros((1,), jnp.int32)
    p0 = _tiny_unet().init(jax.random.PRNGKey(1), x, t)
    p1 = _tiny_unet(freeu=(1.2, 1.1, 0.9, 0.95)).init(
        jax.random.PRNGKey(1), x, t)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("factors", [
    (1.4, 1.2, 1.0, 1.0),   # backbone amplification only
    (1.0, 1.0, 0.5, 0.7),   # skip low-pass only
    (1.2, 1.1, 0.9, 0.95),  # the paper's combined regime
])
def test_freeu_changes_output(factors):
    x, t, params = _init_io()
    base = _tiny_unet().apply(params, x, t)
    out = _tiny_unet(freeu=factors).apply(params, x, t)
    assert out.shape == base.shape
    assert np.all(np.isfinite(np.asarray(out)))
    assert float(jnp.max(jnp.abs(out - base))) > 1e-5


def test_freeu_jits():
    x, t, params = _init_io()
    m = _tiny_unet(freeu=(1.2, 1.1, 0.9, 0.95))
    eager = m.apply(params, x, t)
    jitted = jax.jit(lambda p, x, t: m.apply(p, x, t))(params, x, t)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted),
                               rtol=1e-5, atol=1e-6)


def test_freeu_length_validation():
    x = jnp.zeros((1, 8, 8, 3))
    t = jnp.zeros((1,), jnp.int32)
    with pytest.raises(ValueError, match="freeu"):
        _tiny_unet(freeu=(1.2, 0.9)).init(jax.random.PRNGKey(0), x, t)


# ------------------------------------------------------- factory plumbing
def test_factory_plumbs_freeu_and_coerces_tuple():
    cfg = {
        "model_type": "unet",
        "image_size": (8, 8),
        "conditional": False,
        "model_params": {
            "in_channels": 3,
            "model_channels": 8,
            "out_channels": 3,
            "num_res_blocks": 1,
            "attention_resolutions": [4],
            "channel_mult": [1, 2],
            "freeu": [1.2, 1.1, 0.9, 0.95],  # JSON configs produce lists
        },
    }
    model = get_model(cfg)
    assert model.freeu == (1.2, 1.1, 0.9, 0.95)
    assert isinstance(model.freeu, tuple)
