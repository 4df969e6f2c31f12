"""Fused GroupNorm + SiLU for NHWC activations.

The UNet applies GroupNorm(8)+SiLU before every conv (reference
models/unet.py:34-55,237-241) — at CIFAR sampling shapes this chain is a
measurable slice of the HBM traffic. The Pallas kernel computes the
whole thing in one HBM read + one write per image: group statistics via
one-hot matmuls on the MXU (no cross-lane shuffles — a (1, C) row times a
constant (C, G) one-hot reduces groups; multiplying by its (G, C)
transpose broadcasts them back), then normalize+affine+SiLU on the VPU.

Dispatch: Pallas on TPU when C is lane-aligned; XLA fallback otherwise
(also the numerical reference for the parity tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dispatch

_LANE = 128
_EPS = 1e-5


def group_norm_silu_xla(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, num_groups: int
) -> jnp.ndarray:
    """Reference implementation: GroupNorm (torch semantics, eps=1e-5)
    followed by SiLU, on (B, H, W, C)."""
    b, h, w, c = x.shape
    gs = c // num_groups
    xg = x.reshape(b, h * w, num_groups, gs)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    y = (xg - mean) * jax.lax.rsqrt(var + _EPS)
    y = y.reshape(b, h, w, c) * scale + bias
    return y * jax.nn.sigmoid(y)


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int):
    x = x_ref[0]  # (HW, C)
    hw, c = x.shape
    gs = c // num_groups
    n = float(hw * gs)

    # constant one-hot group matrices, built from 2-D iota
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // gs
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    M = (ch == gr).astype(jnp.float32)  # (C, G)
    MT = M.T  # constant fold — (G, C)

    xs = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    xss = jnp.sum(x * x, axis=0, keepdims=True)
    sg = jnp.dot(xs, M, preferred_element_type=jnp.float32)  # (1, G)
    ssg = jnp.dot(xss, M, preferred_element_type=jnp.float32)
    mean_g = sg / n
    var_g = ssg / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + _EPS)
    mean_c = jnp.dot(mean_g, MT, preferred_element_type=jnp.float32)  # (1, C)
    inv_c = jnp.dot(inv_g, MT, preferred_element_type=jnp.float32)

    y = (x - mean_c) * inv_c * scale_ref[...] + bias_ref[...]
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups",))
def _gn_silu_pallas(x2d, scale, bias, num_groups: int):
    batch, hw, c = x2d.shape
    return pl.pallas_call(
        functools.partial(_gn_silu_kernel, num_groups=num_groups),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
    )(x2d, scale.reshape(1, -1), bias.reshape(1, -1))


def _pallas_supported(x: jnp.ndarray, num_groups: int) -> bool:
    b, h, w, c = x.shape
    if c % _LANE != 0 or c % num_groups != 0:
        return False
    if h * w < 8:  # sublane tile minimum
        return False
    # VMEM: x + out blocks (x2 pipeline buffering)
    return h * w * c * 4 * 4 <= 12 * 1024 * 1024


# Measured end-to-end VERDICT (v5e, CIFAR UNet DDIM-50 CFG bench): the
# Pallas kernel wins its microbenchmark (e.g. 1.38 -> 0.95 ms at
# 160x32x32x128) but LOSES end-to-end (62.8 -> 43.2 samples/s): a
# pallas_call is an optimization barrier, and XLA was already fusing the
# GN+SiLU chain into the adjacent convolution fusions. The kernel is kept
# behind an explicit opt-in (DMC_TPU_FUSED_GN_PALLAS=1) with parity tests;
# the default path lets XLA fuse.
import os

_FORCE_PALLAS_ENV = "DMC_TPU_FUSED_GN_PALLAS"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _group_norm_silu_core(x, scale, bias, num_groups):
    if (
        os.environ.get(_FORCE_PALLAS_ENV, "0") == "1"
        and dispatch.pallas_enabled()
        and _pallas_supported(x, num_groups)
    ):
        b, h, w, c = x.shape
        out = _gn_silu_pallas(
            x.reshape(b, h * w, c), scale, bias, num_groups
        )
        return out.reshape(b, h, w, c)
    return group_norm_silu_xla(x, scale, bias, num_groups)


def _core_fwd(x, scale, bias, num_groups):
    return _group_norm_silu_core(x, scale, bias, num_groups), (x, scale, bias)


def _core_bwd(num_groups, residuals, g):
    # Recompute-based backward through the XLA reference (GN+SiLU is cheap
    # to recompute; keeps the Pallas forward differentiable).
    x, scale, bias = residuals
    _, vjp_fn = jax.vjp(
        lambda *a: group_norm_silu_xla(*a, num_groups), x, scale, bias
    )
    return vjp_fn(g)


_group_norm_silu_core.defvjp(_core_fwd, _core_bwd)


def group_norm_silu(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, num_groups: int
) -> jnp.ndarray:
    """Fused GroupNorm+SiLU with Pallas/XLA dispatch, (B, H, W, C)."""
    return _group_norm_silu_core(x, scale, bias, num_groups)
