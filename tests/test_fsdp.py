"""FSDP / ZeRO state sharding (extension — the reference's DDP replicates
the full model+optimizer on every rank, SURVEY.md §2.3): params, Adam
moments and EMA stored sharded over the 'data' axis; XLA derives the
all-gather / reduce-scatter dataflow. Exactness vs plain DP and
checkpoint interchange on the 8-device virtual CPU mesh."""

import math

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from diffusion_models_collection_tpu.models import DiM, DiT, UNet
from diffusion_models_collection_tpu.parallel import (
    fsdp_spec,
    sharded_fraction,
)
from tests.test_trainer_backbones import SIZE, make_trainer


def test_fsdp_spec_rule():
    # largest divisible dim is sharded; ties break toward the last dim
    assert fsdp_spec((256, 1024), 8, min_size=1) == P(None, "data")
    assert fsdp_spec((1024, 256), 8, min_size=1) == P("data", None)
    assert fsdp_spec((512, 512), 8, min_size=1) == P(None, "data")
    # conv kernel: out-channels (last) is the big divisible axis
    assert fsdp_spec((3, 3, 64, 128), 8, min_size=1) == \
        P(None, None, None, "data")
    # indivisible and sub-min-size leaves replicate
    assert fsdp_spec((257, 129), 8, min_size=1) == P()
    assert fsdp_spec((64,), 8, min_size=1000) == P()
    assert fsdp_spec((), 8, min_size=1) == P()
    # a dim equal to n_shards still shards (1 element per device)
    assert fsdp_spec((8,), 8, min_size=1) == P("data")


def _dit():
    return DiT(img_size=SIZE, patch_size=4, in_channels=3, hidden_size=32,
               depth=2, num_heads=4, num_classes=10, dropout=0.0)


@pytest.mark.parametrize("model_ctor", [
    _dit,
    lambda: DiM(img_size=SIZE, patch_size=4, in_channels=3, hidden_size=32,
                depth=2, state_size=4, num_classes=10, dropout=0.0),
    lambda: UNet(image_size=SIZE, in_channels=3, model_channels=32,
                 out_channels=3, num_res_blocks=1,
                 attention_resolutions=(4,), channel_mult=(1, 2),
                 num_classes=10, dropout=0.0),
], ids=["dit", "dim", "unet"])
def test_fsdp_matches_data_parallel(tmp_path, model_ctor):
    """fsdp: true trains on the 8-device mesh with sharded state and
    reproduces the plain-DP trainer's losses exactly (dropout off,
    sharding-invariant threefry streams). Most parameter mass actually
    lives sharded; in-training sampling works off sharded params."""
    common = dict(dropout_rng_impl="threefry", sample_interval=1,
                  sample_start_epoch=1)
    fs_tr = make_trainer(tmp_path / "fsdp", model_ctor(), fsdp=True,
                         fsdp_min_size=512, **common)
    assert fs_tr.mesh.axis_names == ("data",)
    frac = sharded_fraction(fs_tr.state.params)
    assert frac > 0.5, f"only {frac:.0%} of param elements sharded"
    # Adam moments follow the params' shardings (same shapes, same rule)
    assert sharded_fraction(fs_tr.state.opt_state) > 0.3
    fs_losses = [fs_tr.train_epoch(e) for e in (1, 2, 3)]
    # state stays sharded after donated steps (out_shardings pinned)
    assert sharded_fraction(fs_tr.state.params) == pytest.approx(frac)

    dp_tr = make_trainer(tmp_path / "dp", model_ctor(), **common)
    dp_losses = [dp_tr.train_epoch(e) for e in (1, 2, 3)]
    assert all(math.isfinite(l) for l in fs_losses)
    np.testing.assert_allclose(fs_losses, dp_losses, rtol=2e-5)

    samples = fs_tr.sample_images(epoch=1, num_samples=8)
    assert samples.shape == (8, SIZE[0], SIZE[1], 3)


def test_fsdp_checkpoint_interchange(tmp_path):
    """Checkpoints gather to the standard host layout: an FSDP run's file
    loads into a plain-DP trainer and vice versa, with identical params."""
    fs_tr = make_trainer(tmp_path / "a", _dit(), fsdp=True,
                         fsdp_min_size=512, dropout_rng_impl="threefry")
    fs_tr.train_epoch(1)
    fs_tr.save_checkpoint(epoch=1)
    ckpt = str(tmp_path / "a" / "ckpt" / "current_model.ckpt")

    dp_tr = make_trainer(tmp_path / "b", _dit(), resume_path=ckpt,
                         dropout_rng_impl="threefry")
    assert dp_tr.start_epoch == 2
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        fs_tr.state.params, dp_tr.state.params,
    )

    # and back: the DP checkpoint re-places sharded under FSDP
    dp_tr.save_checkpoint(epoch=2)
    ckpt2 = str(tmp_path / "b" / "ckpt" / "current_model.ckpt")
    fs2 = make_trainer(tmp_path / "c", _dit(), fsdp=True,
                       fsdp_min_size=512, resume_path=ckpt2,
                       dropout_rng_impl="threefry")
    assert fs2.start_epoch == 3
    assert sharded_fraction(fs2.state.params) > 0.5
    loss = fs2.train_epoch(3)
    assert math.isfinite(loss)


def test_fsdp_rejects_model_sharding_combos(tmp_path):
    model = _dit()
    for key in ("pipeline_parallel", "sequence_parallel"):
        with pytest.raises(ValueError, match="fsdp cannot be combined"):
            make_trainer(tmp_path, model, fsdp=True, **{key: 2})


def test_hybrid_fsdp_tensor_parallel_matches_dp(tmp_path):
    """`fsdp: true` + `tensor_parallel: 2` (hybrid ZeRO x Megatron): the
    QKV kernel shards over BOTH mesh axes ('data' on its TP-free input
    dim, 'model' on its output dim), Adam moments follow their params,
    and losses still match the plain-DP trainer exactly."""
    from jax.sharding import PartitionSpec as P

    common = dict(dropout_rng_impl="threefry", sample_interval=1,
                  sample_start_epoch=1)
    hy_tr = make_trainer(tmp_path / "hybrid", _dit(), fsdp=True,
                         fsdp_min_size=512, tensor_parallel=2, **common)
    assert hy_tr.mesh.axis_names == ("data", "model")
    assert hy_tr.mesh.devices.shape == (4, 2)
    qkv = hy_tr.state.params["DiTBlock_0"]["SelfAttention_0"]["Dense_0"][
        "kernel"]
    assert qkv.sharding.spec == P("data", "model"), qkv.sharding.spec
    # Adam mu/nu for the same leaf carry the same hybrid sharding
    params_struct = jax.tree_util.tree_structure(hy_tr.state.params)
    mu_like = [
        n for n in jax.tree_util.tree_leaves(
            hy_tr.state.opt_state,
            is_leaf=lambda n: jax.tree_util.tree_structure(n)
            == params_struct,
        )
        if jax.tree_util.tree_structure(n) == params_struct
        and not isinstance(n, jax.Array)
    ]
    assert mu_like, "no params-structured subtree found in opt_state"
    mu_leaf = mu_like[0]["DiTBlock_0"]["SelfAttention_0"]["Dense_0"]["kernel"]
    assert mu_leaf.sharding.spec == P("data", "model")

    hy_losses = [hy_tr.train_epoch(e) for e in (1, 2, 3)]

    dp_tr = make_trainer(tmp_path / "dp", _dit(), **common)
    dp_losses = [dp_tr.train_epoch(e) for e in (1, 2, 3)]
    assert all(math.isfinite(l) for l in hy_losses)
    np.testing.assert_allclose(hy_losses, dp_losses, rtol=2e-5)

    samples = hy_tr.sample_images(epoch=1, num_samples=8)
    assert samples.shape == (8, SIZE[0], SIZE[1], 3)
