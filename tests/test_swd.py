"""Sliced Wasserstein Distance (metrics/swd.py): pyramid exactness,
determinism, and the discrimination property that motivates it (a fully
calibrated, weight-free quality metric for this env — docs/status.md)."""

import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.metrics import SWDScore, compute_swd
from diffusion_models_collection_tpu.metrics.swd import (
    _downsample,
    _upsample,
    laplacian_pyramid,
)


def grad_imgs(n, seed, noise=0.25, size=32):
    r = np.random.default_rng(seed)
    base = np.linspace(0, 1, size, dtype=np.float32)
    return np.clip(
        r.random((n, size, size, 3), dtype=np.float32) * noise
        + (1 - noise) * base[None, :, None, None], 0, 1)


def test_laplacian_pyramid_reconstructs():
    """sum of residuals + upsampled base == original (exact telescope)."""
    x = jnp.asarray(grad_imgs(2, 0))
    pyr = laplacian_pyramid(x, levels=3)
    recon = pyr[-1]
    for res in reversed(pyr[:-1]):
        recon = _upsample(recon) + res
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x),
                               atol=1e-5)


def test_downsample_halves_resolution():
    x = jnp.asarray(grad_imgs(1, 0))
    assert _downsample(x).shape == (1, 16, 16, 3)
    assert _upsample(_downsample(x)).shape == x.shape


def test_swd_deterministic_and_keys():
    a, b = grad_imgs(16, 1), grad_imgs(16, 2)
    m1 = compute_swd(a, b, seed=3)
    m2 = compute_swd(a, b, seed=3)
    assert m1 == m2
    assert set(m1) == {"swd_32x32", "swd_16x16", "swd_avg"}
    assert m1["swd_avg"] == pytest.approx(
        (m1["swd_32x32"] + m1["swd_16x16"]) / 2)


def test_swd_discriminates_distributions():
    """identical-distribution SWD must sit far below noise/blur SWD —
    the property FID's uncalibrated fallback lacked before the He fix."""
    a, a2 = grad_imgs(48, 1), grad_imgs(48, 2)
    noise = np.random.default_rng(0).random((48, 32, 32, 3)).astype(
        np.float32)
    blocky = np.repeat(np.repeat(grad_imgs(48, 3)[:, ::2, ::2], 2, 1),
                       2, 2)
    same = compute_swd(a, a2)["swd_avg"]
    vs_noise = compute_swd(a, noise)["swd_avg"]
    vs_block = compute_swd(a, blocky)["swd_avg"]
    assert vs_noise > 10 * same, (same, vs_noise)
    assert vs_block > 2 * same, (same, vs_block)


def test_swd_grayscale_and_small_inputs():
    g = grad_imgs(8, 0)[..., :1]  # single channel
    m = SWDScore(patches_per_image=16, n_projections=32).compute(g, g)
    assert np.isfinite(m["swd_avg"])
    tiny = grad_imgs(4, 0, size=8)  # below PATCH after one level
    m2 = compute_swd(tiny, tiny)
    assert "swd_8x8" in m2 and np.isfinite(m2["swd_avg"])
