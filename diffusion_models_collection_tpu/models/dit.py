"""DiT — Diffusion Transformer (parity target: reference models/dit.py).

adaLN-Zero transformer over patch tokens (Peebles & Xie 2023). TPU-native
choices: NHWC input, attention via `ops.multihead_attention` (fused XLA
attention — measured faster than the Pallas flash kernel at shipped
shapes, which stays opt-in; see ops/attention.py), exact-erf GELU, and the
reference's init scheme (xavier for all dense layers, N(0, 0.02) positional
embedding, zero-init adaLN and final projection — dit.py:227-247) so the
model starts as an identity-residual network exactly like the reference.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import multihead_attention
from ..ops import tome as tome_ops
from ..ops.quant import dense_layer
from . import initializers as init
from .layers import (
    AdaLNModulation,
    LabelEmbedder,
    PatchEmbed,
    TimestepEmbedder,
    modulate,
    unpatchify,
)

Dtype = Any


class SelfAttention(nn.Module):
    """QKV self-attention (parity: torch nn.MultiheadAttention at
    dit.py:94 — xavier in/out projections, zero biases, dropout applied to
    the attention probabilities)."""

    num_heads: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None
    # Sequence parallelism (parallel/sequence_parallel.py): when set to a
    # mesh axis name and called inside shard_map, x holds this device's
    # token shard; Q stays local while K/V are all-gathered over the axis
    # (one tiled all-gather each per block, riding ICI). No param change.
    kv_axis: Optional[str] = None
    # int8 w8a8 inference (ops/quant.py): 'int8' swaps both projections
    # for the MXU int8 path; param tree unchanged (fp32 checkpoints load
    # as-is, weights quantize at compile as jit constants)
    quant: Optional[str] = None
    # PAG degradation (diffusion/pag.py): identity attention map — the
    # attention output IS v; projections still apply. Parameter-free.
    perturb: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, key_sizes=None):
        dim = x.shape[-1]
        qkv = dense_layer(
            self.quant, 3 * dim, name="Dense_0", dtype=self.dtype,
            kernel_init=init.xavier_uniform, bias_init=init.zeros
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.kv_axis is not None:
            k = jax.lax.all_gather(k, self.kv_axis, axis=1, tiled=True)
            v = jax.lax.all_gather(v, self.kv_axis, axis=1, tiled=True)
        rng = self.make_rng("dropout") if (train and self.dropout > 0) else None
        out = v if self.perturb else multihead_attention(
            q,
            k,
            v,
            self.num_heads,
            dropout_rate=self.dropout,
            deterministic=not train,
            dropout_rng=rng,
            key_sizes=key_sizes,
        )
        return dense_layer(
            self.quant, dim, name="Dense_1", dtype=self.dtype,
            kernel_init=init.xavier_uniform, bias_init=init.zeros
        )(out)


class Mlp(nn.Module):
    """Dense -> GELU(exact) -> Dropout -> Dense -> Dropout (dit.py:97-103)."""

    hidden_dim: int
    out_dim: int
    dropout: float = 0.1
    dtype: Optional[Dtype] = None
    quant: Optional[str] = None  # see SelfAttention.quant

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = dense_layer(
            self.quant, self.hidden_dim, name="Dense_0", dtype=self.dtype,
            kernel_init=init.xavier_uniform, bias_init=init.zeros
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = dense_layer(
            self.quant, self.out_dim, name="Dense_1", dtype=self.dtype,
            kernel_init=init.xavier_uniform, bias_init=init.zeros
        )(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class DiTBlock(nn.Module):
    """adaLN-Zero transformer block (parity: dit.py:87-132).

    `num_experts > 0` swaps the dense MLP for a routed Mixture-of-Experts
    bank (models/moe.py, DiT-MoE style) — an extension with no reference
    counterpart; everything else in the block is unchanged.
    """

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.1
    dtype: Optional[Dtype] = None
    kv_axis: Optional[str] = None  # see SelfAttention.kv_axis
    num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    # Token Merging (ops/tome.py, ToMeSD): merge spec.r redundant tokens
    # before attention (proportional attention keeps merged multiplicity
    # exact) and unmerge after, so the residual stream keeps all tokens.
    # tome_mlp extends the merge around the MLP (fresh plan, bigger
    # speedup, more approximation — ToMeSD's quality-vs-speed knob).
    tome: Optional[tome_ops.ToMeSpec] = None
    tome_mlp: bool = False
    # int8 w8a8 inference (ops/quant.py): quantizes the block's four big
    # matmuls (qkv/out/mlp); adaLN stays fp32 (tiny, conditioning-critical)
    quant: Optional[str] = None
    pag_perturb: bool = False  # see SelfAttention.perturb

    @nn.compact
    def __call__(self, x, c, train: bool = False):
        if self.tome is not None and self.kv_axis is not None:
            raise ValueError(
                "token merging needs the full token set on one device — "
                "it does not compose with sequence parallelism"
            )
        if self.quant is not None and train:
            raise ValueError(
                "quant='int8' is inference-only (rounding has no "
                "gradient); train with fp32/bf16 and quantize at serving"
            )
        (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp) = (
            AdaLNModulation(self.hidden_size, 6, dtype=self.dtype)(c)
        )
        h = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         dtype=self.dtype)(x)
        h = modulate(h, shift_msa, scale_msa)
        attn = SelfAttention(self.num_heads, self.dropout, self.dtype,
                             self.kv_axis, quant=self.quant,
                             perturb=self.pag_perturb)
        if self.tome is not None and not self.pag_perturb:
            # (identity attention is token-local — merging would only
            # change the degradation, not save work, so PAG bypasses it)
            plan = tome_ops.build_plan(h, self.tome)
            h = tome_ops.unmerge(
                plan,
                attn(tome_ops.merge(plan, h), train,
                     key_sizes=tome_ops.sizes(plan)),
            )
        else:
            h = attn(h, train)
        x = x + gate_msa[:, None, :] * h

        h = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         dtype=self.dtype)(x)
        h = modulate(h, shift_mlp, scale_mlp)
        if self.num_experts > 0:
            from .moe import MoeMlp

            mlp = MoeMlp(
                int(self.hidden_size * self.mlp_ratio), self.hidden_size,
                self.num_experts, self.moe_top_k, self.moe_capacity_factor,
                self.dropout, self.dtype,
            )
        else:
            mlp = Mlp(int(self.hidden_size * self.mlp_ratio),
                      self.hidden_size, self.dropout, self.dtype,
                      quant=self.quant)
        if self.tome is not None and self.tome_mlp:
            plan = tome_ops.build_plan(h, self.tome)
            h = tome_ops.unmerge(plan, mlp(tome_ops.merge(plan, h), train))
        else:
            h = mlp(h, train)
        x = x + gate_mlp[:, None, :] * h
        return x


class FinalLayer(nn.Module):
    """2-way adaLN + zero-init linear to patch pixels (dit.py:135-151)."""

    hidden_size: int
    patch_size: int
    out_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, c):
        shift, scale = AdaLNModulation(self.hidden_size, 2, dtype=self.dtype)(c)
        x = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         dtype=self.dtype)(x)
        x = modulate(x, shift, scale)
        return nn.Dense(
            self.patch_size * self.patch_size * self.out_channels,
            dtype=self.dtype,
            kernel_init=init.zeros,
            bias_init=init.zeros,
        )(x)


class DiT(nn.Module):
    """Diffusion Transformer (constructor parity: reference dit.py:154-225).

    Contract: `apply(variables, x, t, y, train=...) -> eps`, x NHWC.
    """

    img_size: Union[int, Tuple[int, int]] = (32, 32)
    patch_size: int = 2
    in_channels: int = 3
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: Optional[int] = None
    dropout: float = 0.1
    dtype: Optional[Dtype] = None
    remat: bool = False
    # Output channels; None = in_channels (reference dit.py hardcodes them
    # equal). Distinct values support concat-conditioned variants (e.g.
    # super-resolution: input [x_t ; upsampled LR] = 2C, output eps = C).
    out_channels: Optional[int] = None
    # Mixture-of-Experts extension (models/moe.py): num_experts > 0 swaps
    # every block's MLP for a top-k routed expert bank; expert parallelism
    # shards the stacked expert weights (parallel/expert_parallel.py).
    num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    # Token Merging (ops/tome.py — training-free inference acceleration;
    # no reference counterpart): fraction of patch tokens merged before
    # every block's attention (and MLP when tome_mlp). Parameter-free —
    # any checkpoint samples unchanged; intended for inference (set via
    # sample.py/evaluate.py --tome_ratio), merging during training
    # changes the objective.
    tome_ratio: float = 0.0
    tome_sx: int = 2
    tome_sy: int = 2
    tome_mlp: bool = False
    # int8 w8a8 inference (ops/quant.py — no reference counterpart):
    # 'int8' contracts every block's qkv/out/mlp matmul through the v5e
    # MXU int8 path (per-token dynamic activation scales, per-channel
    # weight scales folded at compile). Param tree unchanged — any fp32
    # checkpoint applies; set via sample.py/serve.py --quantize int8.
    quant: Optional[str] = None
    # PAG degradation (diffusion/pag.py): identity attention everywhere.
    pag_perturb: bool = False

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

        # remat: recompute block activations in the backward instead of
        # storing them (jax.checkpoint) — trades ~1/3 more FLOPs for O(depth)
        # less activation HBM, the TPU lever for bigger batches/models.
        block_cls = (
            nn.remat(DiTBlock, static_argnums=(3,)) if self.remat else DiTBlock
        )
        tome_spec = (
            tome_ops.ToMeSpec.from_ratio(
                h_tokens, w_tokens, self.tome_ratio, self.tome_sx,
                self.tome_sy,
            )
            if self.tome_ratio else None
        )
        for i in range(self.depth):
            # explicit name keeps the param tree identical whether or not
            # remat wraps the class (checkpoints stay interchangeable)
            x = block_cls(
                self.hidden_size, self.num_heads, self.mlp_ratio, self.dropout,
                self.dtype, num_experts=self.num_experts,
                moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
                tome=tome_spec, tome_mlp=self.tome_mlp, quant=self.quant,
                pag_perturb=self.pag_perturb,
                name=f"DiTBlock_{i}",
            )(x, c, train)

        out_ch = self.out_channels or self.in_channels
        x = FinalLayer(self.hidden_size, self.patch_size, out_ch,
                       self.dtype)(x, c)
        x = unpatchify(x, h_tokens, w_tokens, self.patch_size, out_ch)
        # uniform eps contract: fp32 out regardless of compute dtype
        return x.astype(jnp.float32)
