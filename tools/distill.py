"""Distillation entry point (extension beyond the reference): two
methods, selected by the config key `distill_method`.

- 'progressive' (default; Salimans & Ho 2022): halve the DDIM step
  count per stage. Keys: `distill_steps`, `distill_stages`.
- 'consistency' (Song et al. 2023): distill into a 1-4-step consistency
  model. Keys: `consistency_grid_size`, `distill_cfg_scale`,
  `consistency_sample_steps`, `target_ema_decay`, `sigma_data`,
  `timestep_scaling` (see utils/consistency_trainer.py).

Usage:
    python tools/distill.py --config configs/my_distill.py

The config supplies `teacher_checkpoint`, the dataset/loader keys (same
schema as training configs) and the distillation keys
(`distill_steps`, `distill_stages`, `epochs`, optimizer settings).
Each progressive stage writes `distilled_{N:04d}step.ckpt` into
`save_dir` (consistency writes `consistency_model.ckpt`); sample
with the ordinary CLI:

    python sample.py --checkpoint <save_dir>/distilled_0004step.ckpt \
        --sampling_method ddim --num_inference_steps 4

(pass --num_inference_steps explicitly: the sample CLI's own default of
50 overrides the checkpoint's embedded step count, reference-parity
behavior; evaluate.py defaults to the embedded value.)
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from diffusion_models_collection_tpu.platform_setup import apply_platform_env

apply_platform_env()

from diffusion_models_collection_tpu.factory import get_dataloader, get_dataset
from diffusion_models_collection_tpu.utils.consistency_trainer import (
    ConsistencyDistillationTrainer,
)
from diffusion_models_collection_tpu.utils.distill_trainer import (
    DistillationTrainer,
)
from diffusion_models_collection_tpu.utils.helpers import (
    format_duration,
    load_config,
    resolve_image_size,
    set_seed,
)


def main():
    parser = argparse.ArgumentParser(
        description="Progressively distill a trained diffusion checkpoint"
    )
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args()

    config = load_config(Path(args.config))
    config["image_size"] = resolve_image_size(config["image_size"])
    rng = set_seed(config.get("seed", 42) + jax.process_index())

    dataset = get_dataset(config, train=True)
    loader = get_dataloader(
        config, dataset, train=True, seed=config.get("seed", 42)
    )
    method = str(config.get("distill_method", "progressive")).lower()
    if method == "consistency":
        trainer = ConsistencyDistillationTrainer(loader, config, rng=rng)
    elif method == "progressive":
        trainer = DistillationTrainer(loader, config, rng=rng)
    else:
        raise ValueError(
            f"Unknown distill_method: {method!r} "
            "(expected 'progressive' or 'consistency')"
        )
    trainer.distill()


if __name__ == "__main__":
    start = time.time()
    main()
    print(f"Total distillation time: {format_duration(time.time() - start)}")
