"""Sliced Wasserstein Distance on Laplacian-pyramid patches.

The multi-scale SWD protocol of Karras et al. 2018 (Progressive GAN,
appendix A): descriptors are 7x7xC patches drawn from each level of a
Laplacian pyramid, channel-standardized, projected onto random unit
directions; the distance per level is the mean L1 gap between the SORTED
projections of the real and fake patch sets (the 1-D Wasserstein-1
distance, averaged over directions). Reported x1e3 per level plus the
level average, like the paper.

Why it exists here: FID/IS/LPIPS need pretrained torchvision weights
that this environment cannot fetch (docs/status.md) — their uncalibrated
fallbacks are only *relative* statistics. SWD needs NO learned features
at all: it is fully calibrated by construction, sensitive to both
texture sharpness (fine levels) and global structure (coarse levels),
and therefore the strongest absolute quality signal available in-env.
The reference repo has no SWD (extension).

TPU-native: patch extraction, standardization, projection and the
per-direction sorts all run as one jitted program per level; the
O(D * P log P) sort work maps onto XLA's batched sort. Randomness
(patch positions, projection directions) comes from a seeded PRNGKey so
results are reproducible.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

PATCH = 7  # descriptor side (Karras et al. 2018 use 7x7)


def _gaussian_kernel():
    # the paper's 5-tap binomial [1,4,6,4,1]/16, separable
    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32)
    k2 = np.outer(k, k)
    return jnp.asarray(k2 / k2.sum())


def _blur(x):
    """5x5 binomial blur, SAME padding, per channel (NHWC)."""
    k = _gaussian_kernel()[:, :, None, None]
    c = x.shape[-1]
    kern = jnp.tile(k, (1, 1, 1, c))  # HWIO with feature_group_count
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _downsample(x):
    return _blur(x)[:, ::2, ::2, :]


def _upsample(x):
    b, h, w, c = x.shape
    up = jnp.zeros((b, 2 * h, 2 * w, c), x.dtype)
    up = up.at[:, ::2, ::2, :].set(x)
    # 4x compensates the 3/4 zeros introduced by the dilation
    return 4.0 * _blur(up)


def laplacian_pyramid(x, levels: int):
    """[finest residual, ..., coarsest residual, low-pass base]."""
    pyr = []
    cur = x
    for _ in range(levels - 1):
        down = _downsample(cur)
        pyr.append(cur - _upsample(down))
        cur = down
    pyr.append(cur)
    return pyr


@functools.partial(jax.jit, static_argnames=("patches_per_image",))
def _extract_patches(level, rng, patches_per_image: int):
    """(B, H, W, C) -> (B * patches_per_image, PATCH*PATCH*C) at random
    positions (same positions across channels, per image)."""
    b, h, w, c = level.shape
    ky, kx = jax.random.split(rng)
    ys = jax.random.randint(ky, (b, patches_per_image), 0, h - PATCH + 1)
    xs = jax.random.randint(kx, (b, patches_per_image), 0, w - PATCH + 1)

    def per_image(img, ys_i, xs_i):
        def take(y, x):
            return jax.lax.dynamic_slice(img, (y, x, 0), (PATCH, PATCH, c))

        return jax.vmap(take)(ys_i, xs_i)  # (P, 7, 7, C)

    patches = jax.vmap(per_image)(level, ys, xs)
    return patches.reshape(b * patches_per_image, PATCH * PATCH * c)


@functools.partial(jax.jit, static_argnames=("n_projections",))
def _sliced_w1(real_desc, fake_desc, rng, n_projections: int):
    """Mean over random directions of W1 between the projected sets.

    Descriptors are standardized per feature using the REAL set's
    statistics (the paper normalizes each descriptor set; sharing real
    stats keeps the metric sensitive to mean/scale drift in fakes)."""
    mu = jnp.mean(real_desc, axis=0, keepdims=True)
    sd = jnp.std(real_desc, axis=0, keepdims=True) + 1e-8
    r = (real_desc - mu) / sd
    f = (fake_desc - mu) / sd
    dirs = jax.random.normal(rng, (r.shape[1], n_projections))
    dirs = dirs / (jnp.linalg.norm(dirs, axis=0, keepdims=True) + 1e-12)
    pr = jnp.sort(r @ dirs, axis=0)  # (P, D) sorted per direction
    pf = jnp.sort(f @ dirs, axis=0)
    return jnp.mean(jnp.abs(pr - pf))


class SWDScore:
    """Multi-scale sliced Wasserstein distance (x1e3, lower is better)."""

    def __init__(self, patches_per_image: int = 64,
                 n_projections: int = 256, seed: int = 0):
        self.patches_per_image = int(patches_per_image)
        self.n_projections = int(n_projections)
        self.seed = int(seed)

    def compute(self, real01, fake01,
                levels: Optional[int] = None) -> dict:
        """images in [0, 1], NHWC (grayscale tolerated). Returns
        {"swd_<res>x<res>": x1e3 per level, "swd_avg": mean}."""
        real = jnp.asarray(np.asarray(real01, np.float32))
        fake = jnp.asarray(np.asarray(fake01, np.float32))
        if real.ndim == 3:
            real = real[..., None]
        if fake.ndim == 3:
            fake = fake[..., None]
        # the level count derives from the REAL set's height and the two
        # pyramids are zipped — mismatched resolutions would silently
        # compare different scales (descriptor dims still match)
        if tuple(real.shape[1:3]) != tuple(fake.shape[1:3]):
            raise ValueError(
                "SWD requires equal real/fake resolutions, got "
                f"real {tuple(real.shape[1:3])} vs "
                f"fake {tuple(fake.shape[1:3])}; resize one set first."
            )
        h = int(real.shape[1])
        if levels is None:
            # pyramid down to 16px, the paper's coarsest level (min 1)
            levels = max(1, int(np.log2(max(h, PATCH * 2) / 16)) + 1)
        rng = jax.random.PRNGKey(self.seed)
        out = {}
        vals = []
        pyr_r = laplacian_pyramid(real, levels)
        pyr_f = laplacian_pyramid(fake, levels)
        for lvl, (lr, lf) in enumerate(zip(pyr_r, pyr_f)):
            res = int(lr.shape[1])
            if res < PATCH:
                continue
            rng, kp_r, kp_f, ks_r, ks_f, kd = jax.random.split(rng, 6)
            dr = _extract_patches(lr, kp_r, self.patches_per_image)
            df = _extract_patches(lf, kp_f, self.patches_per_image)
            # the sorted-projection W1 pairs same-rank quantiles, so both
            # descriptor sets must be the same size: subsample the larger
            # (real/fake image counts often differ, e.g. a 50-image eval
            # split vs 200 generated samples)
            n = min(dr.shape[0], df.shape[0])
            if dr.shape[0] > n:
                dr = dr[jax.random.permutation(ks_r, dr.shape[0])[:n]]
            if df.shape[0] > n:
                df = df[jax.random.permutation(ks_f, df.shape[0])[:n]]
            val = float(_sliced_w1(dr, df, kd, self.n_projections)) * 1e3
            out[f"swd_{res}x{res}"] = val
            vals.append(val)
        out["swd_avg"] = float(np.mean(vals)) if vals else float("nan")
        return out


def compute_swd(real01, fake01, **kwargs) -> dict:
    """Functional wrapper: multi-scale SWD x1e3 (lower is better)."""
    return SWDScore(**kwargs).compute(real01, fake01)
