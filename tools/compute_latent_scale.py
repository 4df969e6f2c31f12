"""Calibrate `latent_scale_factor` for a latent-diffusion config
(extension): LDM's sigma normalization (Rombach et al. 2022 app. G)
rescales latents toward unit variance before diffusing, so the noise
schedule's SNR semantics match pixel-space training.

Measures the per-element std of posterior-MODE latents over a few
batches of the config's dataset and prints 1/std — paste it into the
diffusion config as `latent_scale_factor`.

    python tools/compute_latent_scale.py --config <latent cfg .py> \
        [--batches 8]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from diffusion_models_collection_tpu.platform_setup import apply_platform_env

apply_platform_env()

from diffusion_models_collection_tpu.factory import get_dataloader, get_dataset
from diffusion_models_collection_tpu.utils.helpers import (
    load_config,
    resolve_image_size,
)
from diffusion_models_collection_tpu.utils.latent import LatentCodec


def compute_scale(config: dict, batches: int = 8) -> dict:
    """Mean/std of unscaled posterior-mode latents over `batches`."""
    codec = LatentCodec(config["vae_checkpoint"], scale_factor=1.0)
    dataset = get_dataset(config, train=True)
    loader = get_dataloader(config, dataset, train=True,
                            seed=config.get("seed", 42))
    acc_sum = acc_sq = 0.0
    count = 0
    for i, (images, _) in enumerate(loader):
        if i >= batches:
            break
        z = np.asarray(codec.encode_mode(np.asarray(images, np.float32)))
        acc_sum += float(z.sum())
        acc_sq += float((z.astype(np.float64) ** 2).sum())
        count += z.size
    if count == 0:
        raise RuntimeError("dataset yielded no batches")
    mean = acc_sum / count
    var = max(acc_sq / count - mean**2, 1e-12)
    std = var**0.5
    return {
        "latent_mean": round(mean, 6),
        "latent_std": round(std, 6),
        "latent_scale_factor": round(1.0 / std, 6),
        "batches": min(batches, i + 1),
        "elements": count,
    }


def main():
    parser = argparse.ArgumentParser(
        description="Compute LDM sigma normalization for a latent config"
    )
    parser.add_argument("--config", type=str, required=True,
                        help="latent-diffusion config (.py/.yaml/.json) "
                             "with vae_checkpoint + dataset keys")
    parser.add_argument("--batches", type=int, default=8)
    args = parser.parse_args()
    config = load_config(Path(args.config))
    config["image_size"] = resolve_image_size(config["image_size"])
    print(json.dumps(compute_scale(config, args.batches)))


if __name__ == "__main__":
    main()
