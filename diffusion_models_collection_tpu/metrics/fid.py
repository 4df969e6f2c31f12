"""Fréchet Inception Distance (parity target: reference metrics/fid.py).

Feature extraction runs batched on TPU via the Flax InceptionV3 port; the
2048x2048 Gaussian statistics and the scipy matrix square root stay on the
host exactly as in the reference (fid.py:149-193 — including the eps-offset
retry and imaginary-component handling).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np
from scipy import linalg

from .inception import InceptionFeatures


class FIDScore:
    """FID calculator (API parity: fid.py:110-216).

    `feature_fn`: optional override mapping (B, H, W, C) images in [0, 1]
    to (B, D) features — used by tests and by callers who want a custom
    embedding; defaults to InceptionV3 pool features on TPU.
    """

    def __init__(
        self,
        feature_fn: Optional[Callable] = None,
        weights_path: Optional[str] = None,
        inception: Optional[InceptionFeatures] = None,
    ):
        if feature_fn is None:
            # `inception` lets callers share one extractor (params + jit
            # cache) between FID and IS — calculate_all_metrics does.
            self._inception = inception or InceptionFeatures(weights_path)
            if not self._inception.calibrated:
                print(
                    "WARNING: InceptionV3 weights not found — FID values are "
                    "uncalibrated (set DMC_TPU_INCEPTION_WEIGHTS to a "
                    "torchvision inception_v3 .pth to calibrate)."
                )
            feature_fn = lambda batch: self._inception(batch)[0]
        self.feature_fn = feature_fn

    def compute_statistics(self, images, batch_size: int = 50):
        """Feature mean/covariance (parity: fid.py:124-154). `images` is
        (N, H, W, C) in [0, 1]."""
        n = len(images)
        feats = []
        for start in range(0, n, batch_size):
            batch = jnp.asarray(images[start : start + batch_size])
            feats.append(np.asarray(self.feature_fn(batch)))
        features = np.concatenate(feats, axis=0)
        mu = np.mean(features, axis=0)
        sigma = np.cov(features, rowvar=False)
        return mu, sigma

    @staticmethod
    def trace_sqrtm_newton_schulz(sigma_prod: np.ndarray, iters: int = 30):
        """tr(sqrtm(S)) via Newton–Schulz iteration, on the default JAX
        backend — the TPU-resident alternative to scipy's host sqrtm
        (SURVEY.md §2.2). Works on the symmetric-PSD products FID needs;
        float64-free, validated against scipy in tests."""
        import jax
        import jax.numpy as jnp

        s = jnp.asarray(sigma_prod, jnp.float32)
        dim = s.shape[0]
        norm = jnp.sqrt(jnp.sum(s * s))
        y = s / norm
        z = jnp.eye(dim, dtype=jnp.float32)
        eye3 = 3.0 * jnp.eye(dim, dtype=jnp.float32)

        def body(_, carry):
            y, z = carry
            t = 0.5 * (eye3 - z @ y)
            return y @ t, t @ z

        y, _ = jax.lax.fori_loop(0, iters, body, (y, z))
        return float(jnp.trace(y) * jnp.sqrt(norm))

    @staticmethod
    def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6):
        """Closed-form Fréchet distance between Gaussians (parity:
        fid.py:156-193)."""
        mu1 = np.atleast_1d(mu1)
        mu2 = np.atleast_1d(mu2)
        sigma1 = np.atleast_2d(sigma1)
        sigma2 = np.atleast_2d(sigma2)
        diff = mu1 - mu2

        covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
        if not np.isfinite(covmean).all():
            offset = np.eye(sigma1.shape[0]) * eps
            covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))

        if np.iscomplexobj(covmean):
            if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
                m = np.max(np.abs(covmean.imag))
                raise ValueError(f"Imaginary component {m}")
            covmean = covmean.real

        return (
            diff.dot(diff)
            + np.trace(sigma1)
            + np.trace(sigma2)
            - 2 * np.trace(covmean)
        )

    def compute_fid(self, real_images, fake_images, batch_size: int = 50):
        """(parity: fid.py:195-216)."""
        print("Computing statistics for real images...")
        mu_r, sig_r = self.compute_statistics(real_images, batch_size)
        print("Computing statistics for generated images...")
        mu_f, sig_f = self.compute_statistics(fake_images, batch_size)
        print("Calculating FID score...")
        return self.calculate_frechet_distance(mu_r, sig_r, mu_f, sig_f)
