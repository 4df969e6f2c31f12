"""Super-resolution conditioning (SR3-style cascaded diffusion, extension).

The reference generates at a single resolution only; this module adds the
cascaded-diffusion upsampling stage (Saharia et al. 2021 "SR3"; Ho et al.
2021 "Cascaded Diffusion Models"): a denoiser trained to produce the
high-resolution image *conditioned on its low-resolution version*, fed by
channel-concatenating the bilinearly-upsampled LR image to x_t. A base
checkpoint plus one or more SR checkpoints form a cascade
(tools/cascade.py); `sample.py --sr_source` super-resolves user images.

Config schema (one new top-level key; everything else is the standard
training config at the HIGH resolution):

    'super_resolution': {
        'factor': 2,            # LR = image_size / factor (must divide)
        'noise_aug': 0.0,       # conditioning-noise std in [-1,1] space
                                # (Ho et al. 2021 §3.2: gaussian conditioning
                                # augmentation; the SAME fixed level is
                                # applied at train and sampling time)
        'upsample': 'bilinear', # LR -> HR interpolation fed to the model
    }

TPU notes: the conditioning tensor is derived INSIDE the jitted train step
(area downsample = reshape-mean, upsample = jax.image.resize — both fuse
into the surrounding program); at sampling time it is a closure constant of
the jitted trajectory scan, so the per-step cost is one channel concat.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

_UPSAMPLE_METHODS = ("bilinear", "nearest")


@dataclasses.dataclass(frozen=True)
class SRSpec:
    """Validated `super_resolution` config block."""

    factor: int
    noise_aug: float = 0.0
    upsample: str = "bilinear"

    @staticmethod
    def from_config(config: dict) -> Optional["SRSpec"]:
        block = config.get("super_resolution")
        if not block:
            return None
        if not isinstance(block, dict):
            raise ValueError(
                "super_resolution must be a dict like "
                "{'factor': 2, 'noise_aug': 0.0}"
            )
        factor = int(block.get("factor", 0))
        if factor < 2:
            raise ValueError(
                f"super_resolution.factor must be an int >= 2, got "
                f"{block.get('factor')!r}"
            )
        noise_aug = float(block.get("noise_aug", 0.0))
        if noise_aug < 0:
            raise ValueError("super_resolution.noise_aug must be >= 0")
        upsample = str(block.get("upsample", "bilinear")).lower()
        if upsample not in _UPSAMPLE_METHODS:
            raise ValueError(
                f"super_resolution.upsample must be one of "
                f"{_UPSAMPLE_METHODS}, got {upsample!r}"
            )
        spec = SRSpec(factor=factor, noise_aug=noise_aug, upsample=upsample)
        # fail at composition time, not inside jit
        from .helpers import resolve_image_size

        h, w = resolve_image_size(config["image_size"])
        if h % factor or w % factor:
            raise ValueError(
                f"super_resolution.factor={factor} must divide "
                f"image_size {(h, w)}"
            )
        return spec

    def lr_hw(self, hw) -> tuple:
        return (hw[0] // self.factor, hw[1] // self.factor)


def downsample(images: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Exact area downsample (average pooling) of NHWC images.

    The canonical HR -> LR degradation for SR training pairs; a
    reshape-mean, so XLA fuses it into the train step.
    """
    n, h, w, c = images.shape
    if h % factor or w % factor:
        raise ValueError(
            f"factor {factor} must divide spatial dims {(h, w)}"
        )
    x = images.reshape(n, h // factor, factor, w // factor, factor, c)
    return x.mean(axis=(2, 4))


def upsample(images: jnp.ndarray, hw, method: str = "bilinear") -> jnp.ndarray:
    """Upsample NHWC images to spatial size `hw` (the model-input view of
    the LR conditioning)."""
    n, _, _, c = images.shape
    return jax.image.resize(images, (n, hw[0], hw[1], c), method=method)


def make_condition(
    spec: SRSpec,
    hw,
    *,
    hr_images: Optional[jnp.ndarray] = None,
    lr_images: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Build the HR-size conditioning tensor from HR images (training /
    evaluation: derive LR by area downsample) or from LR images directly
    (inference on user inputs / cascade stages).

    Conditioning noise augmentation (spec.noise_aug > 0) draws ONE noise
    realization per call — matching training, where each sample's
    conditioning is perturbed once, not per denoising step.
    """
    if (hr_images is None) == (lr_images is None):
        raise ValueError("pass exactly one of hr_images / lr_images")
    if hr_images is not None:
        lr_images = downsample(jnp.asarray(hr_images, jnp.float32),
                               spec.factor)
    else:
        lr_images = jnp.asarray(lr_images, jnp.float32)
        expect = (hw[0] // spec.factor, hw[1] // spec.factor)
        if tuple(lr_images.shape[1:3]) != expect:
            raise ValueError(
                f"LR conditioning images must be {expect} for factor "
                f"{spec.factor} at size {tuple(hw)}, got "
                f"{tuple(lr_images.shape[1:3])}"
            )
    cond = upsample(lr_images, hw, spec.upsample)
    if spec.noise_aug > 0:
        if rng is None:
            raise ValueError("noise_aug > 0 requires an rng")
        cond = cond + spec.noise_aug * jax.random.normal(
            rng, cond.shape, cond.dtype
        )
    return cond


def batch_condition(
    spec: SRSpec,
    hw,
    source,
    start: int,
    end: int,
    batch_size: int,
    rng,
    *,
    source_is_hr: bool = False,
    cycle: bool = False,
):
    """Shared CLI helper: slice `source[start:end]` (LR images, or HR
    images to downsample with `source_is_hr`), edge-pad to the compiled
    `batch_size`, and build the conditioning tensor. `cycle=True` wraps
    indices modulo len(source) (evaluation sets smaller than the
    requested sample count). One place owns the padding + RNG-fold
    conventions for sample.py / evaluate.py / tools/cascade.py."""
    import numpy as np

    source = np.asarray(source, np.float32)
    if len(source) == 0:
        raise ValueError("SR conditioning source is empty")
    if cycle:
        idx = np.arange(start, end) % len(source)
        batch = source[idx]
    else:
        batch = source[start:end]
    if len(batch) == 0:
        raise ValueError(
            f"SR conditioning slice [{start}:{end}] is empty for a "
            f"source of {len(source)} images (pass cycle=True to wrap)"
        )
    if len(batch) < batch_size:  # pad to the compiled shape
        batch = np.concatenate(
            [batch,
             np.repeat(batch[-1:], batch_size - len(batch), axis=0)],
            axis=0,
        )
    kw = {"hr_images" if source_is_hr else "lr_images": jnp.asarray(batch)}
    return make_condition(
        spec, hw, rng=jax.random.fold_in(rng, 17), **kw
    )


def _cond_call(model_fn, cond, x, t, y):
    c = cond.astype(x.dtype)
    if x.shape[0] != c.shape[0]:
        if x.shape[0] % c.shape[0]:
            raise ValueError(
                f"model batch {x.shape[0]} is not a multiple of the "
                f"conditioning batch {c.shape[0]}"
            )
        reps = x.shape[0] // c.shape[0]
        c = jnp.concatenate([c] * reps, axis=0)
    return model_fn(jnp.concatenate([x, c], axis=-1), t, y)


def wrap_model_fn(model_fn, cond: jnp.ndarray):
    """Wrap a `(x, t, y) -> eps` denoiser so every call sees
    [x ; conditioning] on the channel axis.

    Handles the fused-CFG batch: when the sampler calls with batch 2B
    (cond;uncond stacked), the conditioning tiles to match — the SAME LR
    image conditions both guidance branches (CFG guides the class label,
    not the LR input).

    The conditioning rides as a `tree_util.Partial` ARGUMENT (a traced
    pytree leaf of the model callable), so the jitted trajectory scans
    compile once and every batch's conditioning streams in without a
    retrace.
    """
    cond = jnp.asarray(cond, jnp.float32)
    return jax.tree_util.Partial(_cond_call, model_fn, cond)
