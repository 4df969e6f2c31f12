"""Flash-attention crossover bench: raw op, flash vs XLA, sweeping L.

The round-2 end-to-end verdict demoted the Pallas flash kernel to opt-in
because it LOSES at every shipped CIFAR shape (L=256, head_dim 64 —
docs/benchmarks.md). This tool maps where it WINS: the same raw
`dot_product_attention` call (head_dim 64) swept over sequence lengths
up to DiT-96x96/p2 scale (L=2304) and beyond, forward and train-mode
fwd+bwd, flash on vs off. Run on the real TPU backend:

    python tools/bench_flash_crossover.py

Prints one JSON line per (L, mode) with ms/call for both paths and the
flash speedup. Timing per the verify-skill rules: warmup with host
readback, median of 5 with a readback per call.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_collection_tpu.platform_setup import (
    host_fingerprinted_cache_dir,
)

jax.config.update(
    "jax_compilation_cache_dir",
    host_fingerprinted_cache_dir("/root/.jax_cache"),
)

from diffusion_models_collection_tpu.ops import dispatch
from diffusion_models_collection_tpu.ops.attention import (
    dot_product_attention,
)

HEAD_DIM = 64
HEADS = 6
# batch scaled down as L grows so the (B*H, L, L) XLA score tensor stays
# within HBM; work per config stays substantial either way
CONFIGS = [  # (L, batch)
    (256, 32),
    (512, 16),
    (1024, 8),
    (2048, 4),
    (2304, 4),   # DiT 96x96 / patch 2 — the shipped DiM config's L
    (4096, 2),
]


def _median_ms(fn, n=5):
    fn()  # warmup/compile, with readback inside fn
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    times.sort()
    return 1e3 * times[len(times) // 2]


def bench(L, batch, train, pallas):
    os.environ["DMC_TPU_FLASH_ATTENTION"] = "1" if pallas else "0"
    with dispatch.use_pallas(pallas):
        rng = jax.random.PRNGKey(0)
        q, k, v = (
            jax.device_put(
                jax.random.normal(jax.random.fold_in(rng, i),
                                  (batch, HEADS, L, HEAD_DIM)),
                jax.devices()[0],
            )
            for i in range(3)
        )

        if train:
            @jax.jit
            def call(q, k, v):
                def loss(args):
                    return jnp.mean(dot_product_attention(*args) ** 2)

                l, g = jax.value_and_grad(loss)((q, k, v))
                return l + sum(jnp.sum(x) for x in g)
        else:
            @jax.jit
            def call(q, k, v):
                return jnp.sum(dot_product_attention(q, k, v))

        def run():
            return float(call(q, k, v))  # host readback

        return _median_ms(run)


def main():
    for L, batch in CONFIGS:
        for train in (False, True):
            xla_ms = bench(L, batch, train, pallas=False)
            flash_ms = bench(L, batch, train, pallas=True)
            print(json.dumps({
                "L": L, "batch": batch, "heads": HEADS,
                "head_dim": HEAD_DIM,
                "mode": "fwd+bwd" if train else "fwd",
                "xla_ms": round(xla_ms, 3),
                "flash_ms": round(flash_ms, 3),
                "flash_speedup": round(xla_ms / flash_ms, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
