"""Training entry point (parity target: reference train.py).

Usage: python train.py --config configs/cifar10_unet.py

TPU-native launch model: ONE process per host drives all local TPU chips
through a jax.sharding Mesh — there is no torchrun-style per-device process
spawn and no NCCL process group (reference train.py:296-336). Multi-host
runs call `jax.distributed.initialize()` when the standard JAX cluster env
is present; the config's `gpu_ids`/`port` keys are accepted and ignored
(documented divergence — device selection belongs to the runtime).
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax

from diffusion_models_collection_tpu.platform_setup import (
    apply_platform_env,
    configure_compile_cache,
)

apply_platform_env()
configure_compile_cache()

from diffusion_models_collection_tpu.factory import (
    get_dataloader,
    get_dataset,
    get_diffusion,
    get_model,
)
from diffusion_models_collection_tpu.utils import DiffusionTrainer, VAETrainer
from diffusion_models_collection_tpu.utils.helpers import (
    format_duration,
    load_config,
    resolve_image_size,
    set_seed,
)


def maybe_init_distributed():
    """Multi-host init (the torchrun analog): triggered by JAX cluster env
    vars (JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def main():
    parser = argparse.ArgumentParser(description="Train diffusion models")
    parser.add_argument(
        "--config", type=str, required=True, help="Path to config file"
    )
    args = parser.parse_args()

    maybe_init_distributed()

    config = load_config(Path(args.config))
    config["image_size"] = resolve_image_size(config["image_size"])

    # per-process seed offset (parity: train.py:240 set_seed(seed + rank))
    rng = set_seed(config.get("seed", 42) + jax.process_index())

    if jax.process_index() == 0:
        print(f"Devices: {jax.device_count()} ({jax.default_backend()})")

    print("Creating model...")
    model = get_model(config)

    print("Loading dataset...")
    train_dataset = get_dataset(config, train=True)
    train_loader = get_dataloader(
        config, train_dataset, train=True, seed=config.get("seed", 42)
    )

    if str(config.get("model_type", "")).lower() == "vae":
        # stage 1 of latent diffusion (extension): train the KL-VAE alone;
        # diffusion configs then point `vae_checkpoint` at its output
        trainer = VAETrainer(
            model=model,
            train_loader=train_loader,
            config=config,
            rng=rng,
            resume_path=config.get("resume_path"),
        )
        trainer.train()
        trainer.cleanup()
        return

    if str(config.get("model_type", "")).lower() == "classifier":
        # extension: noise-conditional classifier for classifier guidance
        # (Dhariwal & Nichol 2021) — consumed by sample.py's
        # --classifier_checkpoint/--classifier_scale flags
        from diffusion_models_collection_tpu.utils.classifier_trainer import (
            ClassifierTrainer,
        )

        trainer = ClassifierTrainer(
            model=model,
            train_loader=train_loader,
            config=config,
            rng=rng,
            resume_path=config.get("resume_path"),
        )
        trainer.train()
        trainer.cleanup()
        return

    if str(config.get("diffusion_type", "ddpm")).lower() == "consistency":
        # extension: from-scratch consistency TRAINING (Song et al. 2023
        # Alg. 3 — teacher-free, same-noise adjacent-time pairs).
        # Consistency DISTILLATION of an existing DDPM checkpoint lives
        # in tools/distill.py (distill_method: 'consistency').
        from diffusion_models_collection_tpu.utils.consistency_trainer import (
            ConsistencyTrainingTrainer,
        )

        trainer = ConsistencyTrainingTrainer(
            model=model,
            train_loader=train_loader,
            config=config,
            rng=rng,
            resume_path=config.get("resume_path"),
        )
        trainer.train()
        trainer.cleanup()
        return
    diffusion = get_diffusion(config)  # training always DDPM (train.py:59-70)

    # The trainer builds its own mesh from the config: a 1-D 'data' mesh
    # by default, or a 2-D (data, model) mesh when `tensor_parallel: N`
    # is set (utils/trainer.py:135-153). Passing a prebuilt 1-D mesh here
    # would make the advertised TP config key unreachable from the CLI.
    trainer = DiffusionTrainer(
        model=model,
        diffusion=diffusion,
        train_loader=train_loader,
        config=config,
        rng=rng,
        resume_path=config.get("resume_path"),
    )
    trainer.train()
    trainer.cleanup()


if __name__ == "__main__":
    start_time = time.time()
    main()
    print(f"Total training time: {format_duration(time.time() - start_time)}")
