"""DiM — Diffusion Mamba (parity target: reference models/dim.py).

The reference depends on the `mamba_ssm` CUDA selective-scan kernel
(dim.py:11-17,104-109) and silently degrades to multi-head attention when
it's missing (dim.py:111-117). This rebuild makes the selective SSM the
first-class TPU path: a real Mamba mixer (in/out projections, causal
depthwise conv, input-dependent Δ/B/C, associative-scan recurrence via
`ops.selective_scan`) — linear in sequence length, no CUDA dependency.
An `use_attention_fallback` flag reproduces the reference's attention
variant for parity experiments.

Init note: the reference's `_basic_init` (dim.py:278-283) xavier-inits every
nn.Linear *including* Mamba's dt_proj, clobbering mamba_ssm's carefully
chosen Δ-bias init. We keep the standard Mamba Δ init (inverse-softplus of
log-uniform[1e-3, 0.1]) — better conditioned; divergence documented here.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import selective_scan
from . import initializers as init
from .dit import Mlp, SelfAttention
from .layers import (
    AdaLNModulation,
    LabelEmbedder,
    PatchEmbed,
    TimestepEmbedder,
    modulate,
    unpatchify,
)

Dtype = Any


def _a_log_init(key, shape, dtype=jnp.float32):
    """S4D-real init: A = -[1..d_state] per channel, stored as log."""
    d_inner, d_state = shape
    a = jnp.tile(jnp.arange(1, d_state + 1, dtype=dtype)[None, :], (d_inner, 1))
    return jnp.log(a)


def _dt_bias_init(dt_min: float = 1e-3, dt_max: float = 0.1,
                  dt_init_floor: float = 1e-4):
    def initfn(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, dtype)
        dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.clip(dt, min=dt_init_floor)
        # inverse softplus so that softplus(bias) == dt
        return dt + jnp.log(-jnp.expm1(-dt))

    return initfn


class Mamba(nn.Module):
    """Selective-SSM sequence mixer (TPU equivalent of mamba_ssm.Mamba with
    d_state=16, d_conv=4, expand=2 as used at reference dim.py:104-109)."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    scan_chunk_size: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, u):
        b, length, _ = u.shape
        d_inner = self.expand * self.d_model
        dt_rank = math.ceil(self.d_model / 16)

        # The torch Mamba fuses these as one in_proj Linear(d, 2*d_inner)
        # and splits; two named projections are mathematically identical
        # (same per-column fan_in init) and TP-friendly — each output dim
        # column-shards over the 'model' axis cleanly, whereas slicing a
        # sharded concatenated axis lands each half on a different shard.
        x = nn.Dense(
            d_inner,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=init.torch_default_kernel,
            name="in_proj_x",
        )(u)
        z = nn.Dense(
            d_inner,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=init.torch_default_kernel,
            name="in_proj_z",
        )(u)

        # Causal depthwise conv over the sequence axis (kernel d_conv).
        x = nn.Conv(
            d_inner,
            kernel_size=(self.d_conv,),
            padding=((self.d_conv - 1, 0),),
            feature_group_count=d_inner,
            dtype=self.dtype,
            kernel_init=init.torch_default_kernel,
            bias_init=init.torch_default_bias(self.d_conv),
            name="conv",
        )(x)
        x = nn.silu(x)

        # Input-dependent Δ, B, C.
        x_dbl = nn.Dense(
            dt_rank + 2 * self.d_state,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=init.torch_default_kernel,
            name="x_dbl",
        )(x)
        dt, B, C = jnp.split(x_dbl, [dt_rank, dt_rank + self.d_state], axis=-1)
        dt_init_std = dt_rank**-0.5

        def _dt_kernel_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(
                key, shape, dtype, -dt_init_std, dt_init_std
            )

        dt = nn.Dense(
            d_inner,
            dtype=self.dtype,
            kernel_init=_dt_kernel_init,
            bias_init=_dt_bias_init(),
            name="dt_proj",
        )(dt)
        dt = nn.softplus(dt)

        A_log = self.param("A_log", _a_log_init, (d_inner, self.d_state))
        A = -jnp.exp(A_log)
        D = self.param("D", nn.initializers.ones, (d_inner,))

        # The selective-scan kernels are fp32 (the recurrence compounds
        # rounding over L — bf16 state drifts); cast in/out at the boundary.
        y = selective_scan(
            x.astype(jnp.float32),
            dt.astype(jnp.float32),
            A,
            B.astype(jnp.float32),
            C.astype(jnp.float32),
            D,
            chunk_size=self.scan_chunk_size,
        )
        if self.dtype is not None:
            y = y.astype(self.dtype)
        y = y * nn.silu(z)
        return nn.Dense(
            self.d_model, use_bias=False, dtype=self.dtype,
            kernel_init=init.torch_default_kernel,
            name="out_proj",
        )(y)


class MambaBlock(nn.Module):
    """3-way adaLN-modulated Mamba mixer (parity: dim.py:94-143).

    Note: the DiM LayerNorms carry affine params (torch default), unlike
    DiT's affine-free norms — replicated here.
    """

    hidden_size: int
    state_size: int = 16
    dropout: float = 0.1
    use_attention_fallback: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, c, train: bool = False):
        shift, scale, gate = AdaLNModulation(self.hidden_size, 3,
                                             dtype=self.dtype)(c)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        h = modulate(h, shift, scale)
        if self.use_attention_fallback:
            # Parity: the reference's fallback is a full
            # nn.MultiheadAttention(hidden, 8, dropout) with learnable
            # qkv/out projections (dim.py:111-117,136-139) — SelfAttention
            # is the exact JAX analog (and lets reference fallback
            # checkpoints import 1:1, utils/torch_import.py).
            h = SelfAttention(8, self.dropout, self.dtype, name="attn")(
                h, train
            )
        else:
            h = Mamba(self.hidden_size, self.state_size, dtype=self.dtype)(h)
        return x + gate[:, None, :] * h


class FeedForward(nn.Module):
    """3-way adaLN-modulated MLP (parity: dim.py:146-173)."""

    hidden_size: int
    mlp_ratio: float = 4.0
    dropout: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, c, train: bool = False):
        shift, scale, gate = AdaLNModulation(self.hidden_size, 3,
                                             dtype=self.dtype)(c)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        h = modulate(h, shift, scale)
        h = Mlp(int(self.hidden_size * self.mlp_ratio), self.hidden_size,
                self.dropout, self.dtype)(h, train)
        return x + gate[:, None, :] * h


class DiMBlock(nn.Module):
    """Mamba mixer + FF (parity: dim.py:176-186)."""

    hidden_size: int
    state_size: int = 16
    mlp_ratio: float = 4.0
    dropout: float = 0.1
    use_attention_fallback: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, c, train: bool = False):
        x = MambaBlock(
            self.hidden_size, self.state_size, self.dropout,
            self.use_attention_fallback, self.dtype,
        )(x, c, train)
        x = FeedForward(self.hidden_size, self.mlp_ratio, self.dropout,
                        self.dtype)(x, c, train)
        return x


class DiMFinalLayer(nn.Module):
    """Final projection with affine LayerNorm (parity: dim.py:189-205)."""

    hidden_size: int
    patch_size: int
    out_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, c):
        shift, scale = AdaLNModulation(self.hidden_size, 2, dtype=self.dtype)(c)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = modulate(x, shift, scale)
        return nn.Dense(
            self.patch_size * self.patch_size * self.out_channels,
            dtype=self.dtype,
            kernel_init=init.zeros,
            bias_init=init.zeros,
        )(x)


class DiM(nn.Module):
    """Diffusion Mamba (constructor parity: reference dim.py:208-274)."""

    img_size: Union[int, Tuple[int, int]] = (32, 32)
    patch_size: int = 2
    in_channels: int = 3
    hidden_size: int = 768
    depth: int = 12
    state_size: int = 16
    mlp_ratio: float = 4.0
    num_classes: Optional[int] = None
    dropout: float = 0.1
    use_attention_fallback: bool = False
    dtype: Optional[Dtype] = None
    remat: bool = False
    # Output channels; None = in_channels (reference dim.py hardcodes them
    # equal). Distinct values support concat-conditioned variants (e.g.
    # super-resolution: input [x_t ; upsampled LR] = 2C, output eps = C).
    out_channels: Optional[int] = None

    def _hw(self) -> Tuple[int, int]:
        if isinstance(self.img_size, int):
            return (self.img_size, self.img_size)
        return tuple(self.img_size)

    @nn.compact
    def __call__(self, x, t, y=None, train: bool = False):
        img_h, img_w = self._hw()
        h_tokens = img_h // self.patch_size
        w_tokens = img_w // self.patch_size
        num_patches = h_tokens * w_tokens

        x = PatchEmbed(self.patch_size, self.hidden_size, self.dtype)(x)
        pos_embed = self.param(
            "pos_embed", init.normal_002, (1, num_patches, self.hidden_size)
        )
        x = x + pos_embed.astype(x.dtype)

        c = TimestepEmbedder(self.hidden_size, dtype=self.dtype)(t)
        if self.num_classes is not None and y is not None:
            c = c + LabelEmbedder(self.num_classes, self.hidden_size,
                                  self.dtype)(y)

        block_cls = (
            nn.remat(DiMBlock, static_argnums=(3,)) if self.remat else DiMBlock
        )
        for i in range(self.depth):
            # explicit name keeps the param tree identical with/without remat
            x = block_cls(
                self.hidden_size,
                self.state_size,
                self.mlp_ratio,
                self.dropout,
                self.use_attention_fallback,
                self.dtype,
                name=f"DiMBlock_{i}",
            )(x, c, train)

        out_ch = self.out_channels or self.in_channels
        x = DiMFinalLayer(self.hidden_size, self.patch_size, out_ch,
                          self.dtype)(x, c)
        x = unpatchify(x, h_tokens, w_tokens, self.patch_size, out_ch)
        # uniform eps contract: fp32 out regardless of compute dtype
        return x.astype(jnp.float32)
