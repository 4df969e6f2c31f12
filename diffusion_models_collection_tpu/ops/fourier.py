"""Spatial Fourier low-pass filter (FreeU's skip-feature attenuation).

FreeU (Si et al. 2023, "FreeU: Free Lunch in Diffusion U-Net") modulates
the UNet's up-path skip connections in the frequency domain: the lowest
spatial frequencies of the skip feature map are scaled by a factor s,
suppressing the low-frequency component that otherwise overwhelms the
backbone's denoising signal. No reference counterpart (the reference has
no training-free quality knobs); parameter-free, inference-only.

TPU notes: `jnp.fft.fftn` lowers to XLA's FFT HLO, which TPU executes
natively; the filter is O(HW log HW) on feature maps that are tiny at the
levels FreeU touches (the two deepest up stages — 4x4/8x8 at CIFAR scale),
so it is negligible next to the convs it sits between. The mask is built
with static shapes at trace time (one fused multiply on device).
"""

from __future__ import annotations

import jax.numpy as jnp


def fourier_lowpass_scale(x: jnp.ndarray, threshold: int,
                          scale: float) -> jnp.ndarray:
    """Scale the low-frequency band of an NHWC feature map by `scale`.

    The 2-D spectrum (over H, W) is shifted so DC sits at the center;
    the centered (2*threshold, 2*threshold) block — the lowest spatial
    frequencies — is multiplied by `scale` and the signal is transformed
    back. `scale == 1` is the identity (callers skip the FFT entirely in
    that case); `threshold` large enough to cover the whole spectrum
    scales the entire map.

    Args:
        x: (B, H, W, C) real feature map.
        threshold: half-width of the centered low-frequency block.
        scale: multiplier applied inside the block.

    Returns:
        Filtered map, same shape, same dtype as `x`.
    """
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    orig_dtype = x.dtype
    _, h, w, _ = x.shape
    xf = jnp.fft.fftn(x.astype(jnp.float32), axes=(1, 2))
    xf = jnp.fft.fftshift(xf, axes=(1, 2))

    crow, ccol = h // 2, w // 2
    r0, r1 = max(crow - threshold, 0), min(crow + threshold, h)
    c0, c1 = max(ccol - threshold, 0), min(ccol + threshold, w)
    mask = jnp.ones((1, h, w, 1), jnp.float32)
    mask = mask.at[:, r0:r1, c0:c1, :].set(float(scale))

    xf = jnp.fft.ifftshift(xf * mask, axes=(1, 2))
    out = jnp.fft.ifftn(xf, axes=(1, 2)).real
    return out.astype(orig_dtype)
