"""Trainer e2e with the DiT and DiM backbones (tiny shapes, CPU): one
epoch runs, loss finite, grads flow through adaLN/attention/selective-scan
paths including the selective-scan custom_vjp."""

import math

import jax.numpy as jnp
import pytest

from diffusion_models_collection_tpu.datasets import (
    DataLoader,
    DiffusionDataset,
    ImageTransform,
)
from diffusion_models_collection_tpu.diffusion import DDPM
from diffusion_models_collection_tpu.models import DiM, DiT
from diffusion_models_collection_tpu.utils import DiffusionTrainer
from diffusion_models_collection_tpu.utils.tracker import NullTracker

SIZE = (8, 8)


def make_trainer(tmp_path, model, conditional=True, **overrides):
    cfg = {
        "model_type": "dit",
        "model_params": {"in_channels": 3},
        "image_size": SIZE,
        "conditional": conditional,
        "num_classes": 10 if conditional else None,
        "num_timesteps": 10,
        "beta_start": 1e-4,
        "beta_end": 0.02,
        "beta_schedule": "cosine",
        "loss_type": "huber",
        "epochs": 1,
        "batch_size": 16,
        "optimizer": "adam",
        "learning_rate": 1e-3,
        "weight_decay": 1e-4,
        "gradient_accumulation_steps": 1,
        "use_ema": True,
        "ema_decay": 0.9,
        "cfg_dropout_prob": 0.2,
        "use_scheduler": False,
        "save_dir": str(tmp_path / "ckpt"),
        "sample_dir": str(tmp_path / "samples"),
        "sample_interval": 100,
        "sample_start_epoch": 100,
        "seed": 0,
        "use_swanlab": False,
    }
    cfg.update(overrides)
    ds = DiffusionDataset(
        "synthetic", conditional=conditional,
        transform=ImageTransform(SIZE, train=True), image_size=SIZE,
        n_train=32,
    )
    loader = DataLoader(ds, batch_size=16, seed=0, prefetch=0)
    diffusion = DDPM(10, beta_schedule="cosine")
    return DiffusionTrainer(model, diffusion, loader, config=cfg,
                            tracker=NullTracker(),
                            resume_path=cfg.get("resume_path"))


def test_dit_trains(tmp_path):
    model = DiT(img_size=SIZE, patch_size=4, in_channels=3, hidden_size=32,
                depth=2, num_heads=4, num_classes=10)
    trainer = make_trainer(tmp_path, model)
    losses = [trainer.train_epoch(e) for e in range(1, 4)]
    assert all(math.isfinite(l) for l in losses)
    assert min(losses[1:]) < losses[0]


def test_dim_trains(tmp_path):
    model = DiM(img_size=SIZE, patch_size=4, in_channels=3, hidden_size=32,
                depth=2, state_size=4, num_classes=10)
    trainer = make_trainer(tmp_path, model)
    losses = [trainer.train_epoch(e) for e in range(1, 4)]
    assert all(math.isfinite(l) for l in losses)
    assert min(losses[1:]) < losses[0]


def test_dim_attention_fallback_trains(tmp_path):
    """The reference's attention-fallback variant (dim.py:111-117) exists
    behind a flag for parity experiments."""
    model = DiM(img_size=SIZE, patch_size=4, in_channels=3, hidden_size=32,
                depth=1, num_classes=10, use_attention_fallback=True)
    trainer = make_trainer(tmp_path, model)
    loss = trainer.train_epoch(1)
    assert math.isfinite(loss)


def test_dim_trainer_tensor_parallel(tmp_path):
    """`tensor_parallel: 2` on the 8-device CPU mesh: DiM trains on a 4x2
    (data, model) mesh with Megatron-sharded params and the scan under its
    shard_map context; loss finite and params actually sharded."""
    from jax.sharding import PartitionSpec as P

    model = DiM(img_size=SIZE, patch_size=4, in_channels=3, hidden_size=32,
                depth=2, state_size=4, num_classes=10)
    trainer = make_trainer(tmp_path, model, tensor_parallel=2)
    assert trainer.mesh.axis_names == ("data", "model")
    assert trainer.mesh.devices.shape == (4, 2)
    loss = trainer.train_epoch(1)
    assert math.isfinite(loss)
    k = trainer.state.params["DiMBlock_0"]["MambaBlock_0"]["Mamba_0"][
        "in_proj_x"]["kernel"]
    assert k.sharding.spec == P(None, "model")
    samples = trainer.sample_images(epoch=1, num_samples=4)
    assert samples.shape[0] == 4


def test_dim_trainer_tp_with_bf16(tmp_path):
    """tensor_parallel + mixed_precision compose: the bf16 Mamba casts to
    fp32 at the scan boundary inside the shard_map."""
    model = DiM(img_size=SIZE, patch_size=4, in_channels=3, hidden_size=32,
                depth=1, state_size=4, num_classes=10, dtype=jnp.bfloat16)
    trainer = make_trainer(tmp_path, model, tensor_parallel=2)
    assert math.isfinite(trainer.train_epoch(1))


def test_dit_trainer_pipeline_parallel(tmp_path):
    """`pipeline_parallel: 2` on the 8-device CPU mesh: the trainer builds
    the 4x2 (data, stage) mesh, holds PP-layout state, trains a DiT, and
    matches the data-parallel-only trainer's losses exactly (dropout off,
    sharding-invariant threefry streams). Also: in-training sampling runs
    through the pipeline and the saved checkpoint uses the STANDARD param
    layout (loadable by non-PP runs)."""
    import numpy as np

    from diffusion_models_collection_tpu.utils.checkpoint import (
        load_checkpoint,
    )

    def dit():
        return DiT(img_size=SIZE, patch_size=4, in_channels=3,
                   hidden_size=32, depth=2, num_heads=4, num_classes=10,
                   dropout=0.0)

    common = dict(dropout_rng_impl="threefry", sample_interval=1,
                  sample_start_epoch=1, save_interval=1)
    pp_tr = make_trainer(tmp_path / "pp", dit(), pipeline_parallel=2,
                         **common)
    assert pp_tr.mesh.axis_names == ("data", "stage")
    assert pp_tr.mesh.devices.shape == (4, 2)
    assert set(pp_tr.state.params) == {"blocks", "rest"}
    pp_losses = [pp_tr.train_epoch(e) for e in (1, 2, 3)]

    dp_tr = make_trainer(tmp_path / "dp", dit(), **common)
    dp_losses = [dp_tr.train_epoch(e) for e in (1, 2, 3)]
    assert all(math.isfinite(l) for l in pp_losses)
    np.testing.assert_allclose(pp_losses, dp_losses, rtol=2e-5)

    # pipeline sampling path
    samples = pp_tr.sample_images(epoch=1, num_samples=8)
    assert samples.shape == (8, SIZE[0], SIZE[1], 3)

    # checkpoint written in the standard layout
    pp_tr.save_checkpoint(epoch=3)
    payload = load_checkpoint(tmp_path / "pp" / "ckpt" / "current_model.ckpt")
    assert "DiTBlock_0" in payload["model_state_dict"]
    assert "blocks" not in payload["model_state_dict"]

    # ...and a fresh PP trainer resumes from it (params re-stacked, and the
    # optimizer state — saved in PP layout — restores structurally)
    resumed = make_trainer(
        tmp_path / "pp2", dit(), pipeline_parallel=2,
        resume_path=str(tmp_path / "pp" / "ckpt" / "current_model.ckpt"),
        **common,
    )
    assert resumed.start_epoch == 4


def test_dit_trainer_sequence_parallel(tmp_path):
    """`sequence_parallel: 2` on the 8-device CPU mesh: the trainer builds
    the 4x2 (data, seq) mesh, keeps the STANDARD (replicated) param
    layout, trains a DiT, and matches the data-parallel-only trainer's
    losses exactly (dropout off, sharding-invariant threefry streams).
    In-training sampling runs through the SP apply."""
    import numpy as np

    def dit():
        return DiT(img_size=SIZE, patch_size=4, in_channels=3,
                   hidden_size=32, depth=2, num_heads=4, num_classes=10,
                   dropout=0.0)

    common = dict(dropout_rng_impl="threefry", sample_interval=1,
                  sample_start_epoch=1)
    sp_tr = make_trainer(tmp_path / "sp", dit(), sequence_parallel=2,
                         **common)
    assert sp_tr.mesh.axis_names == ("data", "seq")
    assert sp_tr.mesh.devices.shape == (4, 2)
    assert "DiTBlock_0" in sp_tr.state.params  # standard layout
    sp_losses = [sp_tr.train_epoch(e) for e in (1, 2, 3)]

    dp_tr = make_trainer(tmp_path / "dp", dit(), **common)
    dp_losses = [dp_tr.train_epoch(e) for e in (1, 2, 3)]
    assert all(math.isfinite(l) for l in sp_losses)
    np.testing.assert_allclose(sp_losses, dp_losses, rtol=2e-5)

    samples = sp_tr.sample_images(epoch=1, num_samples=8)
    assert samples.shape == (8, SIZE[0], SIZE[1], 3)


def test_dim_trainer_pipeline_parallel(tmp_path):
    """`pipeline_parallel: 2` with the DiM backbone: the Mamba block stack
    runs as a GPipe pipeline (scans inside each stage) and matches the
    data-parallel-only twin's losses exactly; checkpoints stay in the
    STANDARD DiMBlock_* layout."""
    import numpy as np

    from diffusion_models_collection_tpu.utils.checkpoint import (
        load_checkpoint,
    )

    def dim():
        return DiM(img_size=SIZE, patch_size=4, in_channels=3,
                   hidden_size=32, depth=2, state_size=4, num_classes=10,
                   dropout=0.0)

    common = dict(dropout_rng_impl="threefry", sample_interval=1,
                  sample_start_epoch=1, save_interval=1)
    pp_tr = make_trainer(tmp_path / "pp", dim(), pipeline_parallel=2,
                         **common)
    assert pp_tr.mesh.axis_names == ("data", "stage")
    assert set(pp_tr.state.params) == {"blocks", "rest"}
    pp_losses = [pp_tr.train_epoch(e) for e in (1, 2, 3)]

    dp_tr = make_trainer(tmp_path / "dp", dim(), **common)
    dp_losses = [dp_tr.train_epoch(e) for e in (1, 2, 3)]
    assert all(math.isfinite(l) for l in pp_losses)
    np.testing.assert_allclose(pp_losses, dp_losses, rtol=2e-5)

    samples = pp_tr.sample_images(epoch=1, num_samples=8)
    assert samples.shape == (8, SIZE[0], SIZE[1], 3)

    pp_tr.save_checkpoint(epoch=3)
    payload = load_checkpoint(tmp_path / "pp" / "ckpt" / "current_model.ckpt")
    assert "DiMBlock_0" in payload["model_state_dict"]
    assert "blocks" not in payload["model_state_dict"]


def test_dim_trainer_sequence_parallel(tmp_path):
    """`sequence_parallel: 2` with the DiM backbone: the Mamba selective
    scan runs DISTRIBUTED over the seq axis (local associative scans +
    carried state summaries + halo'd causal conv) and the trainer matches
    the data-parallel-only twin's losses exactly (dropout off)."""
    import numpy as np

    def dim():
        # patch 2 -> 16 tokens: 8 local tokens per seq shard (>= the
        # 3-token causal-conv halo the DiM SP path requires)
        return DiM(img_size=SIZE, patch_size=2, in_channels=3,
                   hidden_size=32, depth=2, state_size=4, num_classes=10,
                   dropout=0.0)

    common = dict(dropout_rng_impl="threefry", sample_interval=1,
                  sample_start_epoch=1)
    sp_tr = make_trainer(tmp_path / "sp", dim(), sequence_parallel=2,
                         **common)
    assert sp_tr.mesh.axis_names == ("data", "seq")
    assert "DiMBlock_0" in sp_tr.state.params  # standard layout
    sp_losses = [sp_tr.train_epoch(e) for e in (1, 2, 3)]

    dp_tr = make_trainer(tmp_path / "dp", dim(), **common)
    dp_losses = [dp_tr.train_epoch(e) for e in (1, 2, 3)]
    assert all(math.isfinite(l) for l in sp_losses)
    np.testing.assert_allclose(sp_losses, dp_losses, rtol=2e-5)

    samples = sp_tr.sample_images(epoch=1, num_samples=8)
    assert samples.shape == (8, SIZE[0], SIZE[1], 3)


def test_pipeline_parallel_rejects_bad_configs(tmp_path):
    model = DiT(img_size=SIZE, patch_size=4, in_channels=3, hidden_size=32,
                depth=2, num_heads=4, num_classes=10)
    # PP x TP is SUPPORTED for DiT (test_dit_trainer_pp_x_tp); with SP it
    # stays rejected
    with pytest.raises(ValueError, match="cannot be combined"):
        make_trainer(tmp_path, model, pipeline_parallel=2,
                     sequence_parallel=2)
    with pytest.raises(ValueError, match="not divisible"):
        make_trainer(tmp_path, model, pipeline_parallel=3)
    unet = __import__(
        "diffusion_models_collection_tpu.models", fromlist=["UNet"]
    ).UNet(image_size=SIZE, in_channels=3, model_channels=8, out_channels=3,
           num_res_blocks=1, attention_resolutions=(), channel_mult=(1,))
    with pytest.raises(ValueError, match="DiT and DiM"):
        make_trainer(tmp_path, unet, pipeline_parallel=2)
    fb = DiM(img_size=SIZE, patch_size=4, in_channels=3, hidden_size=32,
             depth=2, state_size=4, num_classes=10,
             use_attention_fallback=True)
    with pytest.raises(ValueError, match="fallback"):
        make_trainer(tmp_path, fb, pipeline_parallel=2)


def test_sequence_parallel_rejects_bad_configs(tmp_path):
    model = DiT(img_size=SIZE, patch_size=4, in_channels=3, hidden_size=32,
                depth=2, num_heads=4, num_classes=10)
    # SP x TP is SUPPORTED (test_dit_trainer_sp_x_tp); with PP it stays
    # rejected (both own the block-stack dataflow)
    with pytest.raises(ValueError, match="cannot be combined"):
        make_trainer(tmp_path, model, sequence_parallel=2,
                     pipeline_parallel=2)
    with pytest.raises(ValueError, match="not divisible"):
        # SIZE/4 -> 4 tokens; 3 does not divide 4
        make_trainer(tmp_path, model, sequence_parallel=3)
    fb = DiM(img_size=SIZE, patch_size=4, in_channels=3, hidden_size=32,
             depth=2, state_size=4, num_classes=10,
             use_attention_fallback=True)
    with pytest.raises(ValueError, match="fallback"):
        make_trainer(tmp_path, fb, sequence_parallel=2)
    dim = DiM(img_size=SIZE, patch_size=4, in_channels=3, hidden_size=32,
              depth=2, state_size=4, num_classes=10)
    with pytest.raises(ValueError, match="halo"):
        # 4 tokens over 2 shards = 2 local < the 3-token conv halo
        make_trainer(tmp_path, dim, sequence_parallel=2)


def test_dit_trainer_pp_x_tp(tmp_path):
    """`pipeline_parallel: 2` + `tensor_parallel: 2` on the 8-device CPU
    mesh: the trainer builds the 2x2x2 (data, stage, model) mesh, the
    stacked blocks carry BOTH the stage sharding and the Megatron 'model'
    specs, and three epochs of training match the data-parallel-only
    trainer's losses exactly (GPipe + GSPMD-auto Megatron == serial math).
    Checkpoints still save in the standard layout."""
    import numpy as np

    from diffusion_models_collection_tpu.utils.checkpoint import (
        load_checkpoint,
    )

    def dit():
        return DiT(img_size=SIZE, patch_size=4, in_channels=3,
                   hidden_size=32, depth=2, num_heads=4, num_classes=10,
                   dropout=0.0)

    common = dict(dropout_rng_impl="threefry", sample_interval=1,
                  sample_start_epoch=1, save_interval=1)
    tr = make_trainer(tmp_path / "pptp", dit(), pipeline_parallel=2,
                      tensor_parallel=2, **common)
    assert tr.mesh.axis_names == ("data", "stage", "model")
    assert tr.mesh.devices.shape == (2, 2, 2)
    qkv = tr.state.params["blocks"]["SelfAttention_0"]["Dense_0"]["kernel"]
    spec = str(qkv.sharding.spec)
    assert "stage" in spec and "model" in spec, spec
    losses = [tr.train_epoch(e) for e in (1, 2, 3)]

    dp_tr = make_trainer(tmp_path / "dp", dit(), **common)
    dp_losses = [dp_tr.train_epoch(e) for e in (1, 2, 3)]
    assert all(math.isfinite(l) for l in losses)
    np.testing.assert_allclose(losses, dp_losses, rtol=2e-5)

    # sampling runs through the composed pipeline, checkpoint is standard
    samples = tr.sample_images(epoch=1, num_samples=8)
    assert samples.shape == (8, SIZE[0], SIZE[1], 3)
    tr.save_checkpoint(epoch=3)
    payload = load_checkpoint(
        tmp_path / "pptp" / "ckpt" / "current_model.ckpt")
    assert "DiTBlock_0" in payload["model_state_dict"]


def test_pp_x_tp_rejects_dim(tmp_path):
    """DiM's Pallas scan needs its own 'model'-axis shard_map, which can't
    nest inside the pipeline's manual context — reject up front."""
    model = DiM(img_size=SIZE, patch_size=4, in_channels=3, hidden_size=32,
                depth=2, state_size=4, num_classes=10, dropout=0.0)
    with pytest.raises(ValueError, match="DiT"):
        make_trainer(tmp_path, model, model_type="dim",
                     pipeline_parallel=2, tensor_parallel=2)


def test_dit_trainer_sp_x_tp(tmp_path):
    """`sequence_parallel: 2` + `tensor_parallel: 2` on the 8-device CPU
    mesh: the trainer builds the 2x2x2 (data, seq, model) mesh, params
    carry the Megatron 'model' specs while staying in the standard
    layout, and three epochs match the data-parallel-only trainer's
    losses exactly."""
    import numpy as np

    def dit():
        return DiT(img_size=SIZE, patch_size=4, in_channels=3,
                   hidden_size=32, depth=2, num_heads=4, num_classes=10,
                   dropout=0.0)

    common = dict(dropout_rng_impl="threefry", sample_interval=1,
                  sample_start_epoch=1)
    tr = make_trainer(tmp_path / "sptp", dit(), sequence_parallel=2,
                      tensor_parallel=2, **common)
    assert tr.mesh.axis_names == ("data", "seq", "model")
    assert tr.mesh.devices.shape == (2, 2, 2)
    qkv = tr.state.params["DiTBlock_0"]["SelfAttention_0"]["Dense_0"][
        "kernel"]
    assert "model" in str(qkv.sharding.spec), qkv.sharding.spec
    losses = [tr.train_epoch(e) for e in (1, 2, 3)]

    dp_tr = make_trainer(tmp_path / "dp", dit(), **common)
    dp_losses = [dp_tr.train_epoch(e) for e in (1, 2, 3)]
    assert all(math.isfinite(l) for l in losses)
    np.testing.assert_allclose(losses, dp_losses, rtol=2e-5)

    samples = tr.sample_images(epoch=1, num_samples=8)
    assert samples.shape == (8, SIZE[0], SIZE[1], 3)


def test_dim_trainer_sp_x_tp(tmp_path):
    """SP x TP for DiM: the distributed selective scan (seq axis) and
    the Megatron channel sharding (auto 'model' axis) compose through
    the trainer; losses match the DP twin exactly."""
    import numpy as np

    def dim():
        # patch 2 -> 16 tokens: 8 local per seq shard (>= the 3-token halo)
        return DiM(img_size=SIZE, patch_size=2, in_channels=3,
                   hidden_size=32, depth=2, state_size=4, num_classes=10,
                   dropout=0.0)

    common = dict(dropout_rng_impl="threefry", sample_interval=1,
                  sample_start_epoch=1)
    tr = make_trainer(tmp_path / "sptp", dim(), sequence_parallel=2,
                      tensor_parallel=2, **common)
    assert tr.mesh.axis_names == ("data", "seq", "model")
    in_proj = tr.state.params["DiMBlock_0"]["MambaBlock_0"]["Mamba_0"][
        "in_proj_x"]["kernel"]
    assert "model" in str(in_proj.sharding.spec), in_proj.sharding.spec
    losses = [tr.train_epoch(e) for e in (1, 2, 3)]

    dp_tr = make_trainer(tmp_path / "dp", dim(), **common)
    dp_losses = [dp_tr.train_epoch(e) for e in (1, 2, 3)]
    assert all(math.isfinite(l) for l in losses)
    np.testing.assert_allclose(losses, dp_losses, rtol=2e-5)
