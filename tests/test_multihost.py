"""Multi-host (multi-process) execution: the torchrun/DDP replacement.

Spawns TWO separate Python processes that form a real
`jax.distributed` cluster over a local coordinator (2 virtual CPU devices
per process -> a 4-device global data-parallel mesh), run the actual
DiffusionTrainer for an epoch (per-process loader shards assembled into
global batches via `make_array_from_process_local_data`), and in-training
sampling with the rank-0 save gate. This is the CI stand-in for a real
multi-host TPU pod (SURVEY §5.8: one process per host over DCN).
"""

import json
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

WORKER = textwrap.dedent(
    """
    import json, os, sys

    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_dir = sys.argv[3]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 local x 2 processes

    sys.path.insert(0, %(repo)r)
    from diffusion_models_collection_tpu.factory import (
        get_dataloader, get_dataset, get_diffusion, get_model)
    from diffusion_models_collection_tpu.utils import DiffusionTrainer
    from diffusion_models_collection_tpu.utils.tracker import NullTracker

    config = {
        "model_type": "unet",
        "model_params": {
            "image_size": (8, 8), "in_channels": 3, "model_channels": 16,
            "out_channels": 3, "num_res_blocks": 1,
            "attention_resolutions": (4,), "channel_mult": (1, 2),
        },
        "dataset": "synthetic",
        "image_size": (8, 8),
        "conditional": True,
        "num_classes": 10,
        "num_timesteps": 10,
        "beta_start": 1e-4, "beta_end": 0.02, "beta_schedule": "linear",
        "loss_type": "l2",
        "epochs": 1, "batch_size": 16,
        "optimizer": "adamw", "learning_rate": 1e-3, "weight_decay": 0.0,
        "gradient_accumulation_steps": 1,
        "use_ema": True, "ema_decay": 0.9,
        "cfg_dropout_prob": 0.2, "cfg_scale": 1.5,
        "use_scheduler": False,
        "save_dir": os.path.join(out_dir, "ckpt"),
        "sample_dir": os.path.join(out_dir, "samples"),
        "save_interval": 1, "sample_interval": 1, "sample_start_epoch": 1,
        "num_samples": 4,
        "seed": 0, "use_swanlab": False,
    }
    model = get_model(config)
    diffusion = get_diffusion(config)
    ds = get_dataset(config, train=True)
    loader = get_dataloader(config, ds, train=True, seed=0)
    # local batch = global / process_count
    assert loader.batch_size == 8

    trainer = DiffusionTrainer(model, diffusion, loader, config=config,
                               tracker=NullTracker())
    assert trainer.world_size == 4
    trainer.train()  # full loop: train epoch + checkpoint + sampling

    with open(os.path.join(out_dir, f"rank{pid}.json"), "w") as f:
        json.dump({"best_loss": trainer.best_loss,
                   "is_main": trainer.is_main_process}, f)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_training(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER % {"repo": str(Path(__file__).resolve().parents[1])})
    port = _free_port()

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"rank failed:\n{out[-3000:]}"

    r0 = json.loads((tmp_path / "rank0.json").read_text())
    r1 = json.loads((tmp_path / "rank1.json").read_text())
    assert r0["is_main"] and not r1["is_main"]
    # the loss is a global mean — identical on every process
    assert r0["best_loss"] == pytest.approx(r1["best_loss"], rel=1e-6)
    # rank-0-only artifacts
    assert (tmp_path / "ckpt" / "current_model.ckpt").exists()
    assert (tmp_path / "samples" / "epoch_0001.png").exists()
