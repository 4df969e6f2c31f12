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
    overrides = json.loads(sys.argv[4]) if len(sys.argv) > 4 else {}

    # xla_cpu_collective_timeout_seconds: the gloo communicator setup has
    # a connect timeout ("connect timeout after Nms, move on!") after which
    # the half-formed communicator hangs every rank FOREVER. Rank arrival
    # skew (one rank hits the shared compile cache, the other compiles
    # cold; 1-core CI scheduling) can exceed the default, so raise it well
    # past worst-case compile time. Diagnosed from faulthandler stacks:
    # both ranks blocked on the first collective execution's readback.
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=2 "
        "--xla_cpu_collective_timeout_seconds=600"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    # share the suite's persistent compile cache (tests/conftest.py) —
    # without it every worker recompiles the whole train program from
    # scratch, and two cold workers on a small CI host can blow the
    # communicate() timeout
    sys.path.insert(0, os.path.join(%(repo)r, "tests"))
    from cache_dir import cpu_cache_dir
    jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
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
    config.update(overrides)
    model = get_model(config)
    diffusion = get_diffusion(config)
    ds = get_dataset(config, train=True)
    loader = get_dataloader(config, ds, train=True, seed=0)
    # local batch = global / process_count
    assert loader.batch_size == 8

    trainer = DiffusionTrainer(model, diffusion, loader, config=config,
                               tracker=NullTracker())
    assert trainer.world_size == 4
    if config.get("tensor_parallel", 1) > 1:
        # (data, model) mesh across the 2-process cluster: data axis spans
        # processes, model axis stays intra-process (jax device order puts
        # each process's local devices together)
        assert trainer.mesh.axis_names == ("data", "model")
        assert trainer.mesh.devices.shape == (2, 2)
    if config.get("fsdp"):
        from diffusion_models_collection_tpu.parallel import sharded_fraction
        assert sharded_fraction(trainer.state.params) > 0.5
        # ZeRO shards span BOTH hosts -> checkpointing must gather
        # collectively (trainer._gather_for_save before the rank-0 gate)
        assert any(
            trainer._needs_collective_gather(l)
            for l in jax.tree_util.tree_leaves(trainer.state.params)
        )
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


def _run_cluster(tmp_path, overrides=None):
    import json as _json

    worker = tmp_path / "worker.py"
    worker.write_text(WORKER % {"repo": str(Path(__file__).resolve().parents[1])})
    port = _free_port()
    args = [_json.dumps(overrides)] if overrides else []
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), str(tmp_path)]
            + args,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    return procs


def _run_cluster_checked(tmp_path, overrides=None, attempts=2, deadline=450):
    """Run the 2-process cluster; poll for both rank files; retry once.

    The XLA CPU (gloo) collective stack has a rare communicator-setup race
    on loaded 1-core CI hosts that deadlocks both ranks permanently (the
    per-rank connect "move on" timeout poisons the communicator; see the
    XLA_FLAGS note in WORKER). A bounded poll + one retry on a fresh port
    keeps the suite deterministic without masking real failures: genuine
    regressions fail on both attempts and surface the worker output.
    """
    import time

    last_outputs = None
    for attempt in range(attempts):
        for pid in (0, 1):
            rank_file = tmp_path / f"rank{pid}.json"
            if rank_file.exists():
                rank_file.unlink()
        procs = _run_cluster(tmp_path, overrides)
        t0 = time.monotonic()
        while time.monotonic() - t0 < deadline:
            if all((tmp_path / f"rank{p}.json").exists() for p in (0, 1)):
                break
            if all(p.poll() is not None for p in procs):
                break
            time.sleep(2.0)
        hung = any(p.poll() is None for p in procs) and not all(
            (tmp_path / f"rank{p}.json").exists() for p in (0, 1)
        )
        if hung:
            for p in procs:
                p.kill()
        outputs = []
        for p in procs:
            out, _ = p.communicate(timeout=120)
            outputs.append(out)
        last_outputs = [(p.returncode, out) for p, out in zip(procs, outputs)]
        ok = not hung and all(p.returncode == 0 for p in procs)
        if ok:
            return
        print(
            f"[multihost] attempt {attempt + 1}/{attempts} "
            f"{'hung (killed)' if hung else 'failed'}; "
            + ("retrying on a fresh port" if attempt + 1 < attempts else "")
        )
    details = "\n\n".join(
        f"rank rc={rc}:\n{out[-3000:]}" for rc, out in (last_outputs or [])
    )
    raise AssertionError(f"cluster run failed after {attempts} attempts\n{details}")


def test_two_process_training(tmp_path):
    _run_cluster_checked(tmp_path)

    r0 = json.loads((tmp_path / "rank0.json").read_text())
    r1 = json.loads((tmp_path / "rank1.json").read_text())
    assert r0["is_main"] and not r1["is_main"]
    # the loss is a global mean — identical on every process
    assert r0["best_loss"] == pytest.approx(r1["best_loss"], rel=1e-6)
    # rank-0-only artifacts
    assert (tmp_path / "ckpt" / "current_model.ckpt").exists()
    assert (tmp_path / "samples" / "epoch_0001.png").exists()


def test_two_process_fsdp(tmp_path):
    """FSDP across a REAL 2-process cluster: the ZeRO 'data' axis spans
    both hosts, so no single rank can materialize the state — the
    checkpoint path's collective gather (every process participates
    before the rank-0 write gate) must produce a standard-layout file
    that loads anywhere."""
    overrides = {
        "model_type": "dit",
        "model_params": {"in_channels": 3, "patch_size": 4,
                         "hidden_size": 32, "depth": 2, "num_heads": 4},
        "fsdp": True,
        "fsdp_min_size": 512,
    }
    _run_cluster_checked(tmp_path, overrides)
    r0 = json.loads((tmp_path / "rank0.json").read_text())
    r1 = json.loads((tmp_path / "rank1.json").read_text())
    assert r0["best_loss"] == pytest.approx(r1["best_loss"], rel=1e-6)
    # the gathered checkpoint is standard-layout and loads in-process
    from diffusion_models_collection_tpu.utils.checkpoint import (
        load_checkpoint,
    )

    payload = load_checkpoint(tmp_path / "ckpt" / "current_model.ckpt")
    params = payload["model_state_dict"]
    assert "DiTBlock_0" in params
    import numpy as np

    qkv = np.asarray(
        params["DiTBlock_0"]["SelfAttention_0"]["Dense_0"]["kernel"]
    )
    assert qkv.shape == (32, 96) and np.isfinite(qkv).all()


def test_two_process_tensor_parallel(tmp_path):
    """DP x TP across a REAL 2-process jax.distributed cluster: the
    (data, model) mesh's data axis spans processes (DCN analog), the
    Megatron-sharded DiT params live on the intra-process model axis.
    Round-2 extension of the dryrun's single-process TP evidence."""
    overrides = {
        "model_type": "dit",
        "model_params": {"in_channels": 3, "patch_size": 4,
                         "hidden_size": 32, "depth": 2, "num_heads": 4},
        "tensor_parallel": 2,
        # in-training sampling on a TP mesh is exercised single-process in
        # test_tensor_parallel; skip it here to keep the cluster run lean
        "sample_start_epoch": 100,
    }
    _run_cluster_checked(tmp_path, overrides)
    r0 = json.loads((tmp_path / "rank0.json").read_text())
    r1 = json.loads((tmp_path / "rank1.json").read_text())
    assert r0["best_loss"] == pytest.approx(r1["best_loss"], rel=1e-6)
    assert (tmp_path / "ckpt" / "current_model.ckpt").exists()
