"""Generate a SYNTHETIC metric-golden bundle from our own ports.

`tools/make_metric_goldens.py` needs torchvision/lpips to produce the
canonical bundle; this environment has neither (zero egress), so until a
real bundle exists the gated tests in tests/test_metrics.py
(`DMC_TPU_METRIC_GOLDENS`) would be dead code. This tool produces a
bundle in the EXACT same .npz schema whose "canonical" outputs come from
our own Flax InceptionV3/LPIPS ports, with the `state::` entries built by
the INVERSE weight mapping (flax tree -> torch-layout keys).

What consuming it proves (tests/test_metrics.py::
test_metric_goldens_synthetic_bundle): bundle IO, the `state::`
extraction, `convert_torchvision_state` / `convert_lpips_state`, the
preprocessing/resize path and the parity assertions all EXECUTE — i.e.
the moment a real torchvision bundle appears, the gated tests are known
to run. What it cannot prove: graph parity against torchvision itself
(that requires the real bundle; docs/status.md tracks this).

No torch/torchvision needed — state:: values are plain numpy arrays in
torch layout (OIHW kernels, transposed fc), which is exactly what the
converters accept.

    python tools/make_synthetic_goldens.py --out synthetic_goldens.npz
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def fixed_inputs(n=8, size=299, seed=1234):
    """Same structured inputs as tools/make_metric_goldens.py."""
    rng = np.random.default_rng(seed)
    base = np.linspace(0, 1, size, dtype=np.float32)
    imgs = rng.random((n, size, size, 3), dtype=np.float32) * 0.5
    imgs += 0.5 * base[None, :, None, None]
    return np.clip(imgs, 0.0, 1.0)


def inception_state_from_params(params) -> dict:
    """Inverse of metrics.inception.convert_torchvision_state: flax param
    tree -> torchvision-layout numpy state dict."""
    state = {}

    def walk(tree, path):
        for key, val in tree.items():
            p = path + [key]
            if isinstance(val, dict):
                walk(val, p)
                continue
            arr = np.asarray(val)
            if key == "kernel" and p[-2] == "conv":
                state[".".join(p[:-1]) + ".weight"] = arr.transpose(
                    3, 2, 0, 1)  # HWIO -> OIHW
            elif p[-2] == "fc":
                name = {"kernel": "weight", "bias": "bias"}[key]
                state[f"fc.{name}"] = arr.T if key == "kernel" else arr
            elif key.startswith("bn_"):
                name = {
                    "bn_scale": "weight",
                    "bn_bias": "bias",
                    "bn_mean": "running_mean",
                    "bn_var": "running_var",
                }[key]
                state[".".join(p[:-1]) + f".bn.{name}"] = arr

    walk(params, [])
    return state


def lpips_state_from_scorer(scorer) -> dict:
    """Inverse of metrics.lpips_score.convert_lpips_state: scorer params
    -> lpips-package-layout numpy state dict (net.sliceK.N / linJ keys)."""
    feature_ids = {"conv1": ("slice1", "0"), "conv2": ("slice2", "3"),
                   "conv3": ("slice3", "6"), "conv4": ("slice4", "8"),
                   "conv5": ("slice5", "10")}
    state = {}
    for conv, (slc, fid) in feature_ids.items():
        entry = scorer.params[conv]
        state[f"net.{slc}.{fid}.weight"] = np.asarray(
            entry["kernel"]).transpose(3, 2, 0, 1)  # HWIO -> OIHW
        state[f"net.{slc}.{fid}.bias"] = np.asarray(entry["bias"])
    for j, lin in enumerate(scorer.lins):
        arr = np.asarray(lin)
        state[f"lin{j}.model.1.weight"] = arr.reshape(1, -1, 1, 1)
    return state


def build_bundle() -> dict:
    from diffusion_models_collection_tpu.metrics.inception import (
        InceptionV3,
        preprocess,
    )
    from diffusion_models_collection_tpu.metrics.lpips_score import (
        LPIPSScore,
    )

    bundle = {}

    # ------------------------------------------------------- inception
    model = InceptionV3()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3))
    )["params"]
    apply = jax.jit(
        lambda x: model.apply({"params": params}, preprocess(x))
    )

    inputs = fixed_inputs(size=299)
    small = fixed_inputs(size=32)
    pool, logits = apply(jnp.asarray(inputs))
    pool_s, logits_s = apply(jnp.asarray(small))
    bundle.update(
        inputs=inputs, small_inputs=small,
        pool=np.asarray(pool), logits=np.asarray(logits),
        pool_small=np.asarray(pool_s), logits_small=np.asarray(logits_s),
    )
    for key, arr in inception_state_from_params(params).items():
        bundle[f"state::{key}"] = arr

    # ----------------------------------------------------------- lpips
    scorer = LPIPSScore()
    a = fixed_inputs(n=4, size=64, seed=77) * 2.0 - 1.0  # [-1, 1] schema
    b = fixed_inputs(n=4, size=64, seed=78) * 2.0 - 1.0
    dists = [
        scorer.compute_lpips((a[i:i + 1] + 1) / 2, (b[i:i + 1] + 1) / 2)
        for i in range(len(a))
    ]
    bundle.update(
        lpips_inputs_a=a.astype(np.float32),
        lpips_inputs_b=b.astype(np.float32),
        lpips_dists=np.asarray(dists, np.float32),
    )
    for key, arr in lpips_state_from_scorer(scorer).items():
        bundle[f"lpips_state::{key}"] = arr
    return bundle


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="synthetic_goldens.npz")
    args = ap.parse_args()
    bundle = build_bundle()
    np.savez_compressed(args.out, **bundle)
    print(f"wrote {args.out}: {len(bundle)} arrays "
          f"(SYNTHETIC — validates the golden pipeline, not torchvision "
          f"parity)")


if __name__ == "__main__":
    main()
