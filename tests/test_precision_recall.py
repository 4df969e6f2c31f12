"""Improved precision & recall (Kynkaanniemi et al. 2019) — extension.

The k-NN manifold math is weight-independent, so unlike FID these tests
validate the metric itself on synthetic feature distributions with known
expected outcomes."""

import jax
import numpy as np
import pytest

from diffusion_models_collection_tpu.metrics import PrecisionRecall


def _pr(real, fake, k=3):
    pr = PrecisionRecall(k=k, feature_fn=lambda x: x)
    return pr.compute_from_features(real, fake)


def test_identical_sets_are_perfect():
    f = np.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (64, 16)), np.float32
    )
    p, r = _pr(f, f)
    assert p == 1.0 and r == 1.0


def test_disjoint_sets_are_zero():
    rng = np.random.default_rng(0)
    real = rng.normal(0.0, 0.1, (64, 16)).astype(np.float32)
    fake = rng.normal(100.0, 0.1, (64, 16)).astype(np.float32)
    p, r = _pr(real, fake)
    assert p == 0.0 and r == 0.0


def test_mode_collapse_high_precision_low_recall():
    """Fake = many copies of one real-manifold point: every fake sample
    is realistic (precision ~1) but covers almost nothing (recall low)
    — exactly the failure FID conflates."""
    rng = np.random.default_rng(1)
    real = rng.normal(0.0, 1.0, (128, 16)).astype(np.float32)
    point = real[0] + rng.normal(0, 1e-3, (96, 16)).astype(np.float32)
    p, r = _pr(real, point)
    assert p == 1.0
    assert r < 0.3


def test_partial_overlap_is_intermediate():
    rng = np.random.default_rng(2)
    real = rng.normal(0.0, 1.0, (128, 8)).astype(np.float32)
    # half the fake set on-manifold, half far away
    fake = np.concatenate([
        rng.normal(0.0, 1.0, (64, 8)),
        rng.normal(50.0, 1.0, (64, 8)),
    ]).astype(np.float32)
    p, r = _pr(real, fake)
    assert 0.3 < p < 0.8  # ~half the fakes are realistic
    assert r > 0.5        # the on-manifold half still covers real space


def test_validation():
    f = np.zeros((3, 4), np.float32)
    with pytest.raises(ValueError, match="k="):
        _pr(f, f, k=3)  # need > k samples
    with pytest.raises(ValueError, match="k must be"):
        PrecisionRecall(k=0, feature_fn=lambda x: x)


def test_inception_feature_path_smoke():
    """End-to-end through the (possibly uncalibrated) InceptionV3 pool:
    identical image sets must still score perfect P/R — the manifold
    math only needs feature determinism."""
    rng = np.random.default_rng(3)
    images = rng.uniform(0, 1, (8, 16, 16, 3)).astype(np.float32)
    pr = PrecisionRecall(k=3)
    p, r = pr.compute(images, images, batch_size=4)
    assert p == 1.0 and r == 1.0
