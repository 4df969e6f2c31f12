"""Denoiser backbones (parity: reference models/__init__.py:6-10).

Uniform contract across all three: `apply(variables, x, t, y, train=...)`
returns predicted epsilon with x in NHWC layout.
"""

from .classifier import NoisyClassifier
from .dim import DiM
from .dit import DiT
from .unet import UNet
from .vae import VAE

__all__ = ["UNet", "DiT", "DiM", "VAE", "NoisyClassifier"]
