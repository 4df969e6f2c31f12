"""UNet denoiser (parity target: reference models/unet.py:123-292).

TPU-native design decisions vs the reference:
  * NHWC layout throughout (XLA:TPU's native conv layout — no transposes).
  * Attention runs through `ops.multihead_attention` — a fused XLA
    einsum-softmax-einsum (measured faster than the Pallas flash kernel
    at every shipped shape; flash is opt-in via DMC_TPU_FLASH_ATTENTION,
    see ops/attention.py).
  * Same structural semantics: channel_mult levels, `num_res_blocks` per
    level, attention at levels whose running resolution intersects
    `attention_resolutions` (including the reference's exact check at
    unet.py:202,228 — resolution updated *after* the up-block is built),
    skip connections via a stack.

Uniform contract: `apply(variables, x, t, y, train=...) -> eps` with
x: (B, H, W, C) float32, t: (B,) int32, y: (B,) int32 labels where 0 is the
CFG null class (labels pre-shifted +1 by the trainer).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops import group_norm_silu, multihead_attention
from ..ops.fourier import fourier_lowpass_scale
from . import initializers as init
from .layers import LabelEmbedder, UNetTimeEmbed

Dtype = Any


class FusedGroupNormSiLU(nn.Module):
    """GroupNorm(8)+SiLU as one dispatchable op (Pallas kernel on TPU).

    Owns the same scale/bias params as nn.GroupNorm; numerics identical
    (eps 1e-5) — see ops/fused_norm.py.
    """

    num_groups: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        # normalization stats always in fp32 (group reductions over
        # H*W*C/G elements lose too much in bf16); only the output is cast
        y = group_norm_silu(x.astype(jnp.float32), scale, bias,
                            self.num_groups)
        return y.astype(self.dtype) if self.dtype is not None else y


def _conv3(features: int, in_ch: int, strides: int = 1, dtype=None,
           name: Optional[str] = None) -> nn.Conv:
    return nn.Conv(
        features,
        kernel_size=(3, 3),
        strides=(strides, strides),
        padding=((1, 1), (1, 1)),
        dtype=dtype,
        kernel_init=init.torch_default_kernel,
        bias_init=init.torch_default_bias(in_ch * 9),
        name=name,
    )


def _conv1(features: int, in_ch: int, dtype=None) -> nn.Conv:
    return nn.Conv(
        features,
        kernel_size=(1, 1),
        dtype=dtype,
        kernel_init=init.torch_default_kernel,
        bias_init=init.torch_default_bias(in_ch),
    )


class ResidualBlock(nn.Module):
    """GroupNorm(8)+SiLU+Conv ×2 with additive time/label conditioning
    (parity: reference models/unet.py:28-72)."""

    out_channels: int
    conditional: bool = False
    dropout: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, t_emb, y_emb=None, train: bool = False):
        in_ch = x.shape[-1]
        h = FusedGroupNormSiLU(dtype=self.dtype)(x)
        h = _conv3(self.out_channels, in_ch, dtype=self.dtype)(h)

        t_dim = t_emb.shape[-1]
        h = h + nn.Dense(
            self.out_channels,
            dtype=self.dtype,
            kernel_init=init.torch_default_kernel,
            bias_init=init.torch_default_bias(t_dim),
        )(nn.silu(t_emb))[:, None, None, :]

        if self.conditional and y_emb is not None:
            h = h + nn.Dense(
                self.out_channels,
                use_bias=False,
                dtype=self.dtype,
                kernel_init=init.torch_default_kernel,
            )(nn.silu(y_emb))[:, None, None, :]

        h = FusedGroupNormSiLU(dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = _conv3(self.out_channels, self.out_channels, dtype=self.dtype)(h)

        if in_ch != self.out_channels:
            x = _conv1(self.out_channels, in_ch, dtype=self.dtype)(x)
        return h + x


class AttentionBlock(nn.Module):
    """Spatial self-attention over H*W tokens (parity: unet.py:75-99).

    `perturb=True` replaces the attention map with the identity (every
    token attends only itself, so the attention output IS v) — the
    Perturbed Attention Guidance degradation (Ahn et al. 2024,
    diffusion/pag.py). Parameter-free: the same weights run both ways.
    """

    num_heads: int = 4
    dtype: Optional[Dtype] = None
    perturb: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = nn.GroupNorm(num_groups=8, epsilon=1e-5)(x.astype(jnp.float32))
        qkv = _conv1(3 * c, c, dtype=self.dtype)(hidden).reshape(b, h * w, 3, c)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = v if self.perturb else multihead_attention(q, k, v,
                                                         self.num_heads)
        out = _conv1(c, c, dtype=self.dtype)(out.reshape(b, h, w, c))
        return x + out


class Downsample(nn.Module):
    """Stride-2 conv (parity: unet.py:102-109)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return _conv3(x.shape[-1], x.shape[-1], strides=2, dtype=self.dtype)(x)


class Upsample(nn.Module):
    """Nearest ×2 + conv (parity: unet.py:112-120)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return _conv3(x.shape[-1], x.shape[-1], dtype=self.dtype)(x)


class UNet(nn.Module):
    """UNet for diffusion (constructor parity: reference unet.py:139-241).

    `num_classes=None` builds the unconditional variant; otherwise labels
    use the +1 shift / 0-null CFG convention (unet.py:174-185,256-258).
    """

    image_size: Tuple[int, int] = (32, 32)
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (16, 8)
    dropout: float = 0.1
    channel_mult: Sequence[int] = (1, 2, 2, 2)
    num_classes: Optional[int] = None
    use_attention: bool = True
    dtype: Optional[Dtype] = None
    remat: bool = False
    # Perturbed Attention Guidance degradation (diffusion/pag.py — no
    # reference counterpart): True replaces every attention map with the
    # identity. Parameter-free; the guidance wrapper runs the same
    # checkpoint once normal, once perturbed.
    pag_perturb: bool = False
    # FreeU (Si et al. 2023 — no reference counterpart): (b1, b2, s1, s2)
    # applied at the two deepest up levels — backbone features' first
    # half-channels scaled by b, skip features Fourier-low-passed by s
    # (ops/fourier.py). Parameter-free and inference-only: the same
    # checkpoint runs with or without it (param tree unchanged).
    freeu: Optional[Tuple[float, float, float, float]] = None
    # DeepCache (Ma et al. 2023 — no reference counterpart): partial
    # execution for cached-step sampling (diffusion/deepcache.py).
    #   None      — ordinary forward (byte-identical parity program).
    #   'full'    — ordinary forward that ALSO returns the up-path
    #               feature entering up level (n_levels - depth):
    #               `(eps, cache)`.
    #   'shallow' — runs only the outermost `depth` down levels and the
    #               matching up levels, splicing in a `cache` tensor from
    #               a previous 'full' call in place of the deep stack.
    # Module names are pinned to the full pass's auto-numbering, so all
    # three modes share one checkpoint's params.
    deepcache_mode: Optional[str] = None
    deepcache_depth: int = 1

    @nn.compact
    def __call__(self, x, t, y=None, train: bool = False, cache=None):
        conditional = self.num_classes is not None
        time_dim = self.model_channels * 4
        n_levels = len(self.channel_mult)
        mode = self.deepcache_mode
        depth = int(self.deepcache_depth)
        if mode not in (None, "full", "shallow"):
            raise ValueError(
                f"deepcache_mode must be None, 'full' or 'shallow', "
                f"got {mode!r}")
        if mode is not None and not (1 <= depth <= n_levels - 1):
            raise ValueError(
                f"deepcache_depth must be in [1, {n_levels - 1}] for "
                f"channel_mult {tuple(self.channel_mult)}, got {depth}")
        if mode == "shallow" and cache is None:
            raise ValueError(
                "deepcache_mode 'shallow' needs the cache tensor from a "
                "'full' forward")
        if self.freeu is not None:
            if len(self.freeu) != 4:
                raise ValueError(
                    f"freeu must be (b1, b2, s1, s2), got {self.freeu!r}")
            # validate each factor HERE (not at float() deep in the up
            # path) so a hand-edited config fails with a clear message
            # instead of an opaque trace-time error
            import math as _math

            for v in self.freeu:
                if not isinstance(v, (int, float)) or not _math.isfinite(v):
                    raise ValueError(
                        "freeu factors must be finite numbers, got "
                        f"{self.freeu!r}")

        t_emb = UNetTimeEmbed(self.model_channels, self.dtype)(t)
        y_emb = None
        if conditional and y is not None:
            y_emb = LabelEmbedder(self.num_classes, time_dim, self.dtype)(y)

        _res_cls = (
            nn.remat(ResidualBlock, static_argnums=(4,))
            if self.remat
            else ResidualBlock
        )

        # Module names replicate flax's auto-numbering of the FULL pass
        # (Conv_0 stem … Conv_1 head) so that partial execution
        # ('shallow') binds the same checkpoint params: skipped modules
        # advance the counters without being created.
        counters = {"res": 0, "attn": 0, "down": 0, "up": 0}

        def res_block(out_ch, h):
            name = f"ResidualBlock_{counters['res']}"
            counters["res"] += 1
            return _res_cls(out_ch, conditional, self.dropout, self.dtype,
                            name=name)(h, t_emb, y_emb, train)

        def attn_block(h):
            name = f"AttentionBlock_{counters['attn']}"
            counters["attn"] += 1
            return AttentionBlock(dtype=self.dtype,
                                  perturb=self.pag_perturb, name=name)(h)

        def attend_here(resolution):
            return self.use_attention and (
                resolution[0] in self.attention_resolutions
                or resolution[1] in self.attention_resolutions
            )

        if self.dtype is not None:
            x = x.astype(self.dtype)
        h = _conv3(self.model_channels, self.in_channels, dtype=self.dtype,
                   name="Conv_0")(x)
        hs = [h]
        resolution = list(self.image_size)

        # Down path (parity: unet.py:190-211). In 'shallow' mode only the
        # outermost `depth` levels run; the deeper structure is simulated
        # for name stability (resolution keeps halving so the attention
        # counter advances exactly as in the full pass).
        exec_levels = depth if mode == "shallow" else n_levels
        for level, mult in enumerate(self.channel_mult):
            out_ch = self.model_channels * mult
            run = level < exec_levels
            for _ in range(self.num_res_blocks):
                if run:
                    h = res_block(out_ch, h)
                else:
                    counters["res"] += 1
                if attend_here(resolution):
                    if run:
                        h = attn_block(h)
                    else:
                        counters["attn"] += 1
                if run:
                    hs.append(h)
            if level != n_levels - 1:
                # the last shallow level's Downsample feeds (and its skip
                # is consumed by) the cached region only — skip it too
                if run and not (mode == "shallow" and level == depth - 1):
                    name = f"Downsample_{counters['down']}"
                    counters["down"] += 1
                    h = Downsample(self.dtype, name=name)(h)
                    hs.append(h)
                else:
                    counters["down"] += 1
                resolution[0] //= 2
                resolution[1] //= 2

        # Middle (parity: unet.py:213-218) — cached region in 'shallow'
        if mode == "shallow":
            counters["res"] += 2
            if self.use_attention:
                counters["attn"] += 1
        else:
            ch = h.shape[-1]
            h = res_block(ch, h)
            if self.use_attention:
                h = attn_block(h)
            h = res_block(ch, h)

        # Up path (parity: unet.py:220-234 — note the reference updates
        # `resolution` only after building the Upsample, so the attention
        # check in the same iteration uses the pre-upsample resolution)
        j_cache = n_levels - depth  # first up level outside the cache
        deep_cache = None
        for level, mult in enumerate(reversed(self.channel_mult)):
            if mode == "full" and level == j_cache:
                deep_cache = h
            if mode == "shallow" and level == j_cache:
                h = cache if self.dtype is None else cache.astype(self.dtype)
            run = mode != "shallow" or level >= j_cache
            for i in range(self.num_res_blocks + 1):
                if run:
                    skip = hs.pop()
                    # FreeU (Si et al. 2023): at the two deepest up
                    # levels, amplify the backbone's first half-channels
                    # (b) and damp the skip's low spatial frequencies
                    # (s). Factors are static floats, so the default
                    # (None / 1.0) traces to the byte-identical parity
                    # program.
                    if self.freeu is not None and level < 2:
                        b = float(self.freeu[level])
                        s = float(self.freeu[2 + level])
                        if b != 1.0:
                            half = h.shape[-1] // 2
                            h = jnp.concatenate(
                                [h[..., :half] * b, h[..., half:]],
                                axis=-1)
                        if s != 1.0:
                            skip = fourier_lowpass_scale(skip, 1, s)
                    h = jnp.concatenate([h, skip], axis=-1)
                    h = res_block(self.model_channels * mult, h)
                else:
                    counters["res"] += 1
                if attend_here(resolution):
                    if run:
                        h = attn_block(h)
                    else:
                        counters["attn"] += 1
                if level != n_levels - 1 and i == self.num_res_blocks:
                    if run:
                        name = f"Upsample_{counters['up']}"
                        counters["up"] += 1
                        h = Upsample(self.dtype, name=name)(h)
                    else:
                        counters["up"] += 1
                    resolution[0] *= 2
                    resolution[1] *= 2

        # Output head (parity: unet.py:237-241)
        h = FusedGroupNormSiLU(dtype=self.dtype,
                               name="FusedGroupNormSiLU_0")(h)
        h = _conv3(self.out_channels, h.shape[-1], dtype=self.dtype,
                   name="Conv_1")(h)
        # uniform eps contract: fp32 out regardless of compute dtype
        out = h.astype(jnp.float32)
        if mode == "full":
            return out, deep_cache
        return out
