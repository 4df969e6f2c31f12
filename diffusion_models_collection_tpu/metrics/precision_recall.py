"""Improved precision & recall for generative models (Kynkaanniemi et
al. 2019) — extension beyond the reference's FID/IS/LPIPS set.

Manifold estimate: a set's support is the union of balls centered on
each feature vector with radius = distance to its k-th nearest neighbor
(k = 3 in the paper). Then

    precision = fraction of FAKE features inside the REAL manifold
    recall    = fraction of REAL features inside the FAKE manifold

distinguishing fidelity from coverage, which FID conflates (mode
collapse: high precision, low recall).

TPU-native: the (N, M) pairwise-distance matrices are single MXU
matmuls (||x||^2 + ||y||^2 - 2 x.y^T) inside one jitted computation;
k is static. Features default to the shared InceptionV3 pool (same
extractor instance as FID/IS when called via `calculate_all_metrics`),
with the usual uncalibrated-weights caveat.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Below this many samples per set the k=3 manifold estimate has no
# resolution for RANKING similar generators: the coverage mechanics stay
# sound (same-distribution sets score ~0.6 even at N=200 — see
# tests/test_precision_recall.py), but any generator whose features sit
# outside the reference manifold scores exactly 0, so nearby
# configurations are indistinguishable (round-3 fixture tables: every
# P&R cell 0 at N=200). The paper protocol uses N >= 10k;
# `calculate_all_metrics` skips P&R below this bound.
MIN_SAMPLES_RECOMMENDED = 1000


def _pairwise_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distances (N, M) via one matmul (MXU-friendly)."""
    a2 = jnp.sum(a**2, axis=1, keepdims=True)
    b2 = jnp.sum(b**2, axis=1, keepdims=True)
    sq = a2 + b2.T - 2.0 * (a @ b.T)
    return jnp.sqrt(jnp.clip(sq, min=0.0))


@functools.partial(jax.jit, static_argnames=("k",))
def _coverage(ref: jnp.ndarray, query: jnp.ndarray, *, k: int):
    """Fraction of `query` points inside the k-NN manifold of `ref`."""
    d_rr = _pairwise_dist(ref, ref)
    # row-sorted: index 0 is the self-distance (0), so index k is the
    # k-th nearest OTHER point — the paper's radius
    radii = jnp.sort(d_rr, axis=1)[:, k]
    d_qr = _pairwise_dist(query, ref)
    inside = (d_qr <= radii[None, :]).any(axis=1)
    return jnp.mean(inside.astype(jnp.float32))


class PrecisionRecall:
    """k-NN manifold precision/recall on InceptionV3 pool features."""

    def __init__(
        self,
        k: int = 3,
        feature_fn: Optional[Callable] = None,
        weights_path: Optional[str] = None,
        inception=None,
    ):
        self.k = int(k)
        if self.k < 1:
            raise ValueError("k must be >= 1")
        if feature_fn is None:
            from .inception import InceptionFeatures

            self._inception = inception or InceptionFeatures(weights_path)
            feature_fn = lambda batch: self._inception(batch)[0]
        self.feature_fn = feature_fn

    def extract_features(self, images, batch_size: int = 50) -> np.ndarray:
        feats = []
        for start in range(0, len(images), batch_size):
            batch = jnp.asarray(images[start : start + batch_size])
            feats.append(np.asarray(self.feature_fn(batch)))
        return np.concatenate(feats, axis=0)

    def compute_from_features(
        self, real_features, fake_features
    ) -> tuple:
        """(precision, recall) from precomputed feature arrays."""
        real = jnp.asarray(real_features, jnp.float32)
        fake = jnp.asarray(fake_features, jnp.float32)
        for name, arr in (("real", real), ("fake", fake)):
            if arr.shape[0] <= self.k:
                raise ValueError(
                    f"need more than k={self.k} {name} samples for the "
                    f"k-NN radius (got {arr.shape[0]})"
                )
        precision = float(_coverage(real, fake, k=self.k))
        recall = float(_coverage(fake, real, k=self.k))
        return precision, recall

    def compute(self, real_images, fake_images, batch_size: int = 50):
        """(precision, recall) from image arrays in [0, 1]."""
        return self.compute_from_features(
            self.extract_features(real_images, batch_size),
            self.extract_features(fake_images, batch_size),
        )
