"""Kernel Inception Distance (Bińkowski et al. 2018) — extension.

The polynomial-MMD math is weight-independent, so these tests validate
the estimator itself against a pure-numpy reference and on synthetic
feature distributions with known expected behavior."""

import numpy as np
import pytest

from diffusion_models_collection_tpu.metrics import KIDScore


def _numpy_mmd2(x, y):
    """Straight-from-the-paper unbiased MMD^2, no JAX (oracle)."""
    m, d = x.shape

    def k(a, b):
        return (a @ b.T / d + 1.0) ** 3

    kxx, kyy, kxy = k(x, x), k(y, y), k(x, y)
    return (
        (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
        + (kyy.sum() - np.trace(kyy)) / (m * (m - 1))
        - 2.0 * kxy.mean()
    )


def test_matches_numpy_oracle():
    """Single full-set subset: the jitted estimator must equal the
    hand-written numpy computation exactly (one subset, m = n, so the
    random subsampling is the identity permutation set)."""
    rng = np.random.default_rng(0)
    real = rng.normal(0, 1, (24, 16)).astype(np.float32)
    fake = rng.normal(0.5, 1, (24, 16)).astype(np.float32)
    kid = KIDScore(subset_size=24, subsets=1, feature_fn=lambda x: x)
    mean, std = kid.compute_from_features(real, fake)
    # subsets of size n without replacement = a permutation; MMD^2 is
    # permutation-invariant, so the oracle on the unpermuted sets applies
    assert mean == pytest.approx(float(_numpy_mmd2(real, fake)), rel=1e-4)
    assert std == 0.0


def test_unbiased_near_zero_for_same_distribution():
    """E[MMD^2] = 0 when real and fake share a distribution; a shifted
    fake set must score decisively higher."""
    rng = np.random.default_rng(1)
    real = rng.normal(0, 1, (512, 32)).astype(np.float32)
    same = rng.normal(0, 1, (512, 32)).astype(np.float32)
    shifted = rng.normal(1.0, 1, (512, 32)).astype(np.float32)
    kid = KIDScore(subset_size=128, subsets=32, feature_fn=lambda x: x)
    mean_same, _ = kid.compute_from_features(real, same)
    mean_shift, _ = kid.compute_from_features(real, shifted)
    assert abs(mean_same) < 0.05
    assert mean_shift > 10 * abs(mean_same)
    assert mean_shift > 0.5  # cubic kernel on a unit mean shift is large


def test_subset_size_clamps_to_smaller_set():
    rng = np.random.default_rng(2)
    real = rng.normal(0, 1, (10, 8)).astype(np.float32)
    fake = rng.normal(0, 1, (6, 8)).astype(np.float32)
    kid = KIDScore(subset_size=1000, subsets=4, feature_fn=lambda x: x)
    mean, std = kid.compute_from_features(real, fake)  # must not raise
    assert np.isfinite(mean) and np.isfinite(std)


def test_seed_determinism():
    rng = np.random.default_rng(3)
    real = rng.normal(0, 1, (64, 8)).astype(np.float32)
    fake = rng.normal(0.3, 1, (64, 8)).astype(np.float32)
    a = KIDScore(subset_size=16, subsets=8, feature_fn=lambda x: x, seed=7)
    b = KIDScore(subset_size=16, subsets=8, feature_fn=lambda x: x, seed=7)
    assert a.compute_from_features(real, fake) == b.compute_from_features(
        real, fake
    )


def test_validation():
    with pytest.raises(ValueError, match="subset_size"):
        KIDScore(subset_size=1, feature_fn=lambda x: x)
    with pytest.raises(ValueError, match="subsets"):
        KIDScore(subsets=0, feature_fn=lambda x: x)
    kid = KIDScore(feature_fn=lambda x: x)
    with pytest.raises(ValueError, match="at least 2"):
        kid.compute_from_features(
            np.zeros((1, 4), np.float32), np.zeros((8, 4), np.float32)
        )
    with pytest.raises(ValueError, match=r"\(N, D\)"):
        kid.compute_from_features(
            np.zeros((4,), np.float32), np.zeros((8, 4), np.float32)
        )


def test_inception_feature_path_smoke():
    """End-to-end through the (possibly uncalibrated) InceptionV3 pool:
    identical image sets over one full-set subset give MMD^2 <= 0 shrunk
    to ~0 (kxy's diagonal makes the cross term the largest, so the
    unbiased estimate of a zero distance is slightly negative)."""
    rng = np.random.default_rng(4)
    images = rng.uniform(0, 1, (8, 16, 16, 3)).astype(np.float32)
    kid = KIDScore(subset_size=8, subsets=1)
    mean, std = kid.compute_kid(images, images, batch_size=4)
    assert mean <= 1e-6
    assert abs(mean) < 0.05
