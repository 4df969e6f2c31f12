"""Noise-conditional classifier for classifier guidance (extension —
Dhariwal & Nichol 2021 "Diffusion Models Beat GANs"; the reference only
implements classifier-FREE guidance).

Architecture: the UNet's encoder half (the same ResidualBlock /
AttentionBlock / Downsample modules as models/unet.py, so TPU layout and
fusion behavior are shared) followed by GroupNorm+SiLU and a global
average pool into a linear head — a p(y | x_t, t) model over NOISY
images. Trained through the ordinary train CLI with
`model_type: 'classifier'` (utils/classifier_trainer.py); consumed at
sampling time by `diffusion/guidance.py` (sample.py
--classifier_checkpoint/--classifier_scale).

Contract: `apply(variables, x, t, train=...) -> logits (B, num_classes)`
with x the NOISY image at timestep t, labels 0..K-1 (NO +1/CFG-null
shift — the classifier never sees a null class).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import UNetTimeEmbed
from .unet import (
    AttentionBlock,
    Downsample,
    FusedGroupNormSiLU,
    ResidualBlock,
    _conv3,
)

Dtype = Any


class NoisyClassifier(nn.Module):
    """UNet-encoder classifier over noisy images (see module docstring)."""

    image_size: Tuple[int, int] = (32, 32)
    in_channels: int = 3
    model_channels: int = 64
    num_classes: int = 10
    num_res_blocks: int = 1
    attention_resolutions: Sequence[int] = (8,)
    channel_mult: Sequence[int] = (1, 2, 2)
    dropout: float = 0.1
    use_attention: bool = True
    dtype: Optional[Dtype] = None
    remat: bool = False

    @nn.compact
    def __call__(self, x, t, y=None, train: bool = False):
        # y accepted (and ignored) for the uniform (x, t, y) call shape —
        # lets generic tooling treat any model uniformly
        del y
        t_emb = UNetTimeEmbed(self.model_channels, self.dtype)(t)

        _res_cls = (
            nn.remat(ResidualBlock, static_argnums=(4,))
            if self.remat
            else ResidualBlock
        )
        res_counter = iter(range(10_000))

        def res_block_cls(*args):
            return _res_cls(*args, name=f"ResidualBlock_{next(res_counter)}")

        def attend_here(resolution):
            return self.use_attention and (
                resolution[0] in self.attention_resolutions
                or resolution[1] in self.attention_resolutions
            )

        if self.dtype is not None:
            x = x.astype(self.dtype)
        h = _conv3(self.model_channels, self.in_channels, dtype=self.dtype)(x)
        resolution = list(self.image_size)

        # the UNet's down path (unet.py:209-222), no skip stack needed
        for level, mult in enumerate(self.channel_mult):
            out_ch = self.model_channels * mult
            for _ in range(self.num_res_blocks):
                h = res_block_cls(out_ch, False, self.dropout,
                                  self.dtype)(h, t_emb, None, train)
                if attend_here(resolution):
                    h = AttentionBlock(dtype=self.dtype)(h)
            if level != len(self.channel_mult) - 1:
                h = Downsample(self.dtype)(h)
                resolution[0] //= 2
                resolution[1] //= 2

        h = FusedGroupNormSiLU(dtype=self.dtype)(h)
        h = jnp.mean(h, axis=(1, 2))  # global average pool over H, W
        logits = nn.Dense(self.num_classes, dtype=self.dtype)(h)
        # fp32 logits regardless of compute dtype (softmax/grad stability)
        return logits.astype(jnp.float32)
