"""End-to-end verdict bench for the Pallas flash-attention kernel.

VERDICT round-1 discipline (same as the GN+SiLU kernel): the kernel stays
default-on only if it beats the XLA attention path at the SHIPPED model
shapes — DiT-CIFAR (configs/cifar10_dit.py: hidden 384, 6 heads -> head_dim
64, 32x32/p2 -> L=256) and UNet-CIFAR (attention at resolution 16: L=256,
head_dim 64). Three legs, each timed flash-on vs flash-off (ops.dispatch
`use_pallas` wraps trace + execution so the decision is baked into each
jitted program):

  1. DiT DDIM-50 fused-CFG sampling, 80 images   (inference path)
  2. DiT train-mode fwd+bwd, batch 128, dropout 0 (training path; the
     flash kernel only fires in training when attention dropout is
     inactive — shipped configs with dropout 0.1 train on the XLA path)
  3. UNet DDIM-50 fused-CFG sampling, 80 images  (inference path)

Methodology mirrors bench.py: one warmup (with host readback — on the
tunneled TPU block_until_ready alone can return early), median of 5 timed
runs, host readback per run. Run on the real TPU backend:

    python tools/bench_flash_attention.py
"""

import json
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

from diffusion_models_collection_tpu.factory import (
    eval_model_fn,
    get_diffusion,
    init_model_params,
)
from diffusion_models_collection_tpu.models import DiT, UNet
from diffusion_models_collection_tpu.ops import dispatch

DIFFUSION_CFG = {
    "num_timesteps": 1000,
    "beta_start": 1e-4,
    "beta_end": 0.02,
    "beta_schedule": "linear",
    "num_inference_steps": 50,
    "ddim_eta": 0.0,
}
NUM_IMAGES = 80
CFG_SCALE = 3.0


def _median_time(fn, n=5):
    fn()  # warmup / compile (inside the dispatch context)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    return times[-1] if med < 0.05 else med


def _make_dit():
    model = DiT(img_size=(32, 32), patch_size=2, in_channels=3,
                hidden_size=384, depth=12, num_heads=6, mlp_ratio=4.0,
                dropout=0.0, num_classes=10)
    params = init_model_params(
        model, jax.random.PRNGKey(0), (32, 32), 3, conditional=True
    )
    return model, jax.device_put(params, jax.devices()[0])


def _make_unet():
    model = UNet(image_size=(32, 32), in_channels=3, model_channels=128,
                 out_channels=3, num_res_blocks=2,
                 attention_resolutions=(16, 8), channel_mult=(1, 2, 2, 2),
                 num_classes=10)
    params = init_model_params(
        model, jax.random.PRNGKey(0), (32, 32), 3, conditional=True
    )
    return model, jax.device_put(params, jax.devices()[0])


def sample_leg(make_model, pallas: bool) -> float:
    """DDIM-50 fused-CFG samples/sec at the bench shapes."""
    with dispatch.use_pallas(pallas):
        model, params = make_model()
        model_fn = eval_model_fn(model, params)
        diffusion = get_diffusion(DIFFUSION_CFG, sampling_method="ddim")
        shape = (NUM_IMAGES, 32, 32, 3)
        labels = jnp.asarray((jnp.arange(NUM_IMAGES) % 10) + 1, jnp.int32)

        def run(seed=[0]):
            seed[0] += 1
            out = diffusion.sample_with_cfg(
                model_fn, shape, labels, jax.random.PRNGKey(seed[0]),
                cfg_scale=CFG_SCALE,
            )
            return np.asarray(out[:1])

        return NUM_IMAGES / _median_time(run)


def train_leg(make_model, pallas: bool, batch=128) -> float:
    """Train-mode fwd+bwd imgs/sec (MSE head, dropout rngs threaded)."""
    with dispatch.use_pallas(pallas):
        model, params = make_model()
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, 32, 32, 3))
        t = jnp.zeros((batch,), jnp.int32)
        y = jnp.ones((batch,), jnp.int32)

        @jax.jit
        def step(x, t, y, rng):
            def loss_fn(p):
                eps = model.apply(
                    {"params": p}, x, t, y, train=True,
                    rngs={"dropout": rng},
                )
                return jnp.mean(eps**2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            return loss, jax.tree_util.tree_map(jnp.sum, grads)

        def run(seed=[0]):
            seed[0] += 1
            loss, _ = step(x, t, y, jax.random.PRNGKey(seed[0]))
            return float(loss)

        return batch / _median_time(run)


def main():
    results = {}
    legs = [
        ("dit_ddim50_sps", lambda p: sample_leg(_make_dit, p)),
        ("dit_train_fwdbwd_imgs_per_s", lambda p: train_leg(_make_dit, p)),
        ("unet_ddim50_sps", lambda p: sample_leg(_make_unet, p)),
    ]
    for name, leg in legs:
        for mode, pallas in (("flash", True), ("xla", False)):
            key = f"{name}_{mode}"
            results[key] = round(leg(pallas), 2)
            print(f"{key}: {results[key]}", file=sys.stderr)
    for name, _ in legs:
        f, x = results[f"{name}_flash"], results[f"{name}_xla"]
        results[f"{name}_speedup"] = round(f / x, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
