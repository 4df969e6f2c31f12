"""Kernel Inception Distance (Bińkowski et al. 2018, "Demystifying MMD
GANs") — extension beyond the reference's FID/IS/LPIPS set.

KID is the squared maximum mean discrepancy (MMD) between real and fake
InceptionV3 pool features under the cubic polynomial kernel

    k(x, y) = (x·y / d + 1)^3        (d = feature dimension).

Unlike FID it has an UNBIASED estimator (no Gaussian assumption, no
sample-size bias), so it is meaningful on small evaluation sets where
FID systematically overestimates. Following the paper's protocol (and
torch-fidelity / clean-fid defaults) the estimator is averaged over
random subsets: `subsets` draws of `subset_size` features each, and the
reported value is mean ± std of the per-subset unbiased MMD^2
(KID_mean can legitimately be slightly negative for matching sets).

Per-subset estimator (m = subset_size, diagonal excluded on the
within-set terms, full mean on the cross term — torch-fidelity's
convention):

    MMD^2 = sum_{i != j} k(x_i, x_j) / (m (m-1))
          + sum_{i != j} k(y_i, y_j) / (m (m-1))
          - 2 mean_{i, j} k(x_i, y_j)

TPU-native: all three kernel matrices are single MXU matmuls; the
subset loop is one jitted `lax.map` over a stacked (subsets, m) index
array, so the whole estimate is one compiled program with one kernel
matrix live at a time. Features default to the shared InceptionV3 pool
(same extractor instance as FID/IS via `calculate_all_metrics`), with
the usual uncalibrated-weights caveat.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def polynomial_kernel(
    a: jnp.ndarray, b: jnp.ndarray, degree: int = 3, coef0: float = 1.0
) -> jnp.ndarray:
    """(N, M) cubic polynomial kernel matrix; gamma = 1/d (paper's k)."""
    gamma = 1.0 / a.shape[1]
    return (gamma * (a @ b.T) + coef0) ** degree


def _mmd2_unbiased(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Unbiased MMD^2 between equal-size feature subsets (m, d)."""
    m = x.shape[0]
    kxx = polynomial_kernel(x, x)
    kyy = polynomial_kernel(y, y)
    kxy = polynomial_kernel(x, y)
    sum_off_xx = jnp.sum(kxx) - jnp.trace(kxx)
    sum_off_yy = jnp.sum(kyy) - jnp.trace(kyy)
    return (
        (sum_off_xx + sum_off_yy) / (m * (m - 1))
        - 2.0 * jnp.mean(kxy)
    )


@jax.jit
def _mmd2_over_subsets(real, fake, idx_real, idx_fake):
    """Per-subset MMD^2 for stacked (subsets, m) index arrays — one
    compiled program, one kernel matrix live at a time (lax.map)."""

    def one(idx_pair):
        ir, jf = idx_pair
        return _mmd2_unbiased(real[ir], fake[jf])

    return jax.lax.map(one, (idx_real, idx_fake))


class KIDScore:
    """KID calculator on InceptionV3 pool features.

    `feature_fn`: optional override mapping (B, H, W, C) images in [0, 1]
    to (B, D) features (same contract as FIDScore / PrecisionRecall).
    """

    def __init__(
        self,
        subset_size: int = 1000,
        subsets: int = 100,
        feature_fn: Optional[Callable] = None,
        weights_path: Optional[str] = None,
        inception=None,
        seed: int = 0,
    ):
        if subset_size < 2:
            raise ValueError("subset_size must be >= 2 (unbiased MMD "
                             "divides by m(m-1))")
        if subsets < 1:
            raise ValueError("subsets must be >= 1")
        self.subset_size = int(subset_size)
        self.subsets = int(subsets)
        self.seed = int(seed)
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
        """(KID_mean, KID_std) over random subsets. Subset size clamps
        to the smaller set (paper protocol: subsets without replacement
        per draw, redrawn independently per subset)."""
        real = np.asarray(real_features, np.float32)
        fake = np.asarray(fake_features, np.float32)
        if real.ndim != 2 or fake.ndim != 2:
            raise ValueError("features must be (N, D) arrays")
        m = min(self.subset_size, len(real), len(fake))
        if m < 2:
            raise ValueError("need at least 2 real and 2 fake features")
        rng = np.random.default_rng(self.seed)
        idx_real = np.stack(
            [rng.choice(len(real), m, replace=False)
             for _ in range(self.subsets)]
        )
        idx_fake = np.stack(
            [rng.choice(len(fake), m, replace=False)
             for _ in range(self.subsets)]
        )
        vals = np.asarray(
            _mmd2_over_subsets(
                jnp.asarray(real), jnp.asarray(fake),
                jnp.asarray(idx_real), jnp.asarray(idx_fake),
            )
        )
        return float(np.mean(vals)), float(np.std(vals))

    def compute_kid(
        self, real_images, fake_images, batch_size: int = 50
    ) -> tuple:
        """(KID_mean, KID_std); images are (N, H, W, C) in [0, 1]."""
        real = self.extract_features(real_images, batch_size)
        fake = self.extract_features(fake_images, batch_size)
        return self.compute_from_features(real, fake)
