"""int8 (w8a8) dense matmul for TPU inference — extension beyond the
reference (which has no quantized path; its models are fp32/fp16 torch,
reference models/dit.py).

The v5e MXU executes int8 x int8 -> int32 contractions measurably
faster than bf16/fp32 (probed on this chip with a serially-dependent
4096^3 matmul chain INCLUDING requantization: 162.6 int8 vs 115.7 bf16
vs 101.7 fp32 T(FL)OP/s — docs/benchmarks.md). This module exposes that
path as a drop-in dense layer for inference.

End-to-end VERDICT at the shipped model scale (same discipline as the
GN+SiLU kernel): int8 LOSES — DiT-CIFAR (hidden 384) DDIM-50 CFG runs
33.7 samples/s vs 43.5 fp32 (0.78x; 64px: 4.3 vs 4.96). At K=384 the
matmuls are too small for the MXU delta to outrun the per-call dynamic
quantization (absmax reduce + round + clip + cast over every
activation). The raw-matmul probe shows the headroom arrives at larger
hidden sizes (the 4096-dim chain wins 1.4x), so the path stays OPT-IN
(`--quantize int8`) for big-model serving rather than a default.
Numbers: docs/benchmarks.md.

* weights: symmetric per-output-channel absmax scales. In the serving
  paths the parameters ride as jit-closure constants, so XLA constant-
  folds the weight quantization ONCE at compile — zero runtime cost,
  and the checkpoint stays fp32 (no conversion step, identical param
  tree).
* activations: dynamic symmetric per-token absmax scales, computed
  in-graph (one VPU reduction per call) — no calibration data needed.

Inference-only by design: the rounding is not differentiated (no STE),
and training keeps the fp32/bf16 path.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def int8_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(..., K) x (K, N) -> (..., N) through the int8 MXU path.

    Symmetric absmax quantization: per-token rows of x, per-output-
    channel columns of w; int32 accumulation; fp32 dequantize.
    """
    s_w = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0  # (1, N)
    s_w = jnp.maximum(s_w, 1e-12)
    wq = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)

    xf = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0  # (..., 1)
    s_x = jnp.maximum(s_x, 1e-12)
    xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)

    lead = xq.shape[:-1]
    acc = jax.lax.dot_general(
        xq.reshape(-1, xq.shape[-1]), wq,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).reshape(*lead, w.shape[1])
    return acc.astype(jnp.float32) * s_x * s_w


class Int8Dense(nn.Module):
    """Drop-in replacement for `nn.Dense` that contracts through
    `int8_matmul`. Parameters are IDENTICAL to nn.Dense ('kernel',
    'bias', fp32) — construct it with the name the Dense it replaces
    would have gotten (e.g. name='Dense_0') and any fp32 checkpoint
    loads unchanged; quantization happens in-graph (constant-folded for
    jit-constant params)."""

    features: int
    dtype: Optional[Any] = None  # accepted for interface parity; the
    # int8 path fixes its own compute types (int8 -> int32 -> fp32)
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", self.bias_init, (self.features,), jnp.float32
        )
        out = int8_matmul(x, kernel) + bias
        return out.astype(x.dtype) if self.dtype is None else out.astype(
            self.dtype
        )


def dense_layer(quant: Optional[str], features: int, *, name: str,
                dtype=None, kernel_init=None, bias_init=None):
    """The Dense/Int8Dense switch used by the DiT blocks: `quant` is the
    model's `quant` field (None = fp32/bf16 nn.Dense, 'int8' = the MXU
    int8 path). The explicit `name` keeps the param tree identical
    across both choices."""
    kw = {}
    if kernel_init is not None:
        kw["kernel_init"] = kernel_init
    if bias_init is not None:
        kw["bias_init"] = bias_init
    if quant is None:
        return nn.Dense(features, dtype=dtype, name=name, **kw)
    if str(quant) != "int8":
        raise ValueError(f"Unknown quant mode: {quant!r} (only 'int8')")
    return Int8Dense(features, dtype=dtype, name=name, **kw)
