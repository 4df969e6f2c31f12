"""Reflow entry point (extension beyond the reference): rectify a
trained flow-matching checkpoint so few-step (eventually 1-step) Euler
sampling approaches the full-ODE result (Liu et al. 2023).

Usage:
    python tools/reflow.py --config configs/my_reflow.py

The config supplies `teacher_checkpoint` (a `diffusion_type:
'flow_matching'` checkpoint), optimizer settings, and the reflow keys
(`reflow_pairs`, `reflow_rounds`, `teacher_sample_steps`,
`reflow_cfg_scale`, `epochs` — see utils/reflow_trainer.py). No dataset
keys: the pair set is synthesized from the teacher itself. Each round
writes `reflow_round{k}.ckpt` into `save_dir`; sample with the ordinary
CLI at any step count:

    python sample.py --checkpoint <save_dir>/reflow_round1.ckpt \
        --num_inference_steps 1
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from diffusion_models_collection_tpu.platform_setup import apply_platform_env

apply_platform_env()

from diffusion_models_collection_tpu.utils.helpers import (
    format_duration,
    load_config,
    set_seed,
)
from diffusion_models_collection_tpu.utils.reflow_trainer import ReflowTrainer


def main():
    parser = argparse.ArgumentParser(
        description="Rectify (reflow) a trained flow-matching checkpoint"
    )
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args()

    config = load_config(Path(args.config))
    rng = set_seed(config.get("seed", 42) + jax.process_index())
    ReflowTrainer(config, rng=rng).reflow()


if __name__ == "__main__":
    start = time.time()
    main()
    print(f"Total reflow time: {format_duration(time.time() - start)}")
