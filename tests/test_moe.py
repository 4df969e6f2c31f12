"""Mixture-of-Experts DiT + expert parallelism (extension — the reference
has no MoE anywhere, SURVEY.md §2.3 "EP: NO (no MoE)").

Covers: routing/dispatch/combine numerics vs a dense computation, capacity
overflow semantics, the Switch load-balance aux loss, MoE-DiT training
through the trainer (aux loss included), EP==DP loss parity on the
8-device virtual mesh, expert-axis sharding placement, and the config
validation surface.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from diffusion_models_collection_tpu.models import DiT
from diffusion_models_collection_tpu.models.moe import MoeMlp, moe_capacity
from tests.test_trainer_backbones import SIZE, make_trainer


def _moe_dit(num_experts=4, top_k=2):
    return DiT(img_size=SIZE, patch_size=4, in_channels=3, hidden_size=32,
               depth=2, num_heads=4, num_classes=10, dropout=0.0,
               num_experts=num_experts, moe_top_k=top_k)


# --------------------------------------------------------------- layer math

def test_capacity_formula():
    assert moe_capacity(256, 8, 2, 1.25) == 80
    assert moe_capacity(4, 4, 2, 1.25) == 3
    assert moe_capacity(1, 64, 1, 1.0) == 1  # floor at 1


def test_moe_matches_dense_when_topk_is_all_experts():
    """With top_k == E and ample capacity nothing is dropped, so the MoE
    output must equal the dense mixture sum_e p_e * expert_e(x) computed
    by hand from the same parameters."""
    E, d, h = 4, 16, 32
    m = MoeMlp(hidden_dim=h, out_dim=d, num_experts=E, top_k=E,
               capacity_factor=float(E), dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, d))
    vs = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(vs, x)

    p = vs["params"]
    logits = x @ p["router"]["kernel"] + p["router"]["bias"]
    probs = jax.nn.softmax(logits, axis=-1)
    dense = jnp.zeros_like(x)
    for e in range(E):
        he = jax.nn.gelu(x @ p["w1"][e] + p["b1"][e], approximate=False)
        oe = he @ p["w2"][e] + p["b2"][e]
        dense = dense + probs[..., e:e + 1] * oe
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=2e-5, atol=2e-6)


def test_moe_capacity_overflow_drops_tokens():
    """Tokens beyond an expert's capacity get a zero MoE contribution
    (the block residual carries them). Force every token onto expert 0
    with capacity 1: only the first token per batch row survives."""
    E, d = 2, 8
    S = 4
    m = MoeMlp(hidden_dim=16, out_dim=d, num_experts=E, top_k=1,
               capacity_factor=1.0 / S, dropout=0.0)  # C = 1
    x = jax.random.normal(jax.random.PRNGKey(0), (2, S, d))
    vs = m.init(jax.random.PRNGKey(1), x)
    # router picking expert 0 for every token, with prob ~1
    params = dict(vs["params"])
    params["router"] = {
        "kernel": jnp.zeros_like(vs["params"]["router"]["kernel"]),
        "bias": jnp.array([50.0, -50.0]),
    }
    out = m.apply({"params": params}, x)
    out = np.asarray(out)
    # row 0 of each batch lands in expert 0 slot 0; rows 1.. overflow
    assert np.abs(out[:, 0]).max() > 0
    np.testing.assert_array_equal(out[:, 1:], 0.0)


def test_aux_loss_uniform_router_is_one_and_concentration_grows_it():
    E, d = 4, 8
    m = MoeMlp(hidden_dim=16, out_dim=d, num_experts=E, top_k=2,
               capacity_factor=2.0, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, d))
    vs = m.init(jax.random.PRNGKey(1), x)

    def aux_with_router(kernel_scale, bias):
        v = {"params": dict(vs["params"])}
        v["params"]["router"] = {
            "kernel": vs["params"]["router"]["kernel"] * kernel_scale,
            "bias": jnp.asarray(bias, jnp.float32),
        }
        _, sown = m.apply(v, x, mutable=["losses"])
        (leaf,) = jax.tree_util.tree_leaves(sown["losses"])
        return float(leaf)

    # zero logits -> uniform probs -> E * sum_e f_e / E = 1 exactly
    assert aux_with_router(0.0, [0.0] * E) == pytest.approx(1.0, abs=1e-6)
    # all mass on expert 0 -> top-2 routing still fills slot 1 (ties pick
    # expert 1), so f = [1/2, 1/2, 0, 0], p ~ [1, 0, 0, 0] -> loss = 2.0
    assert aux_with_router(0.0, [50.0, -50.0, -50.0, -50.0]) == \
        pytest.approx(2.0, abs=1e-3)


def test_moe_grads_reach_all_experts():
    m = _moe_dit()
    x = jax.random.normal(jax.random.PRNGKey(2), (4,) + SIZE + (3,))
    t = jnp.array([1, 3, 5, 7])
    y = jnp.array([1, 2, 3, 4])
    vs = m.init({"params": jax.random.PRNGKey(3)}, x, t, y)
    # adaLN-Zero inits every block gate to exactly 0, which cuts the grad
    # path to the expert weights at init — perturb params so the gates
    # (and the eps-loss path through the experts) are live.
    leaves, treedef = jax.tree_util.tree_flatten(vs["params"])
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )

    def loss(p):
        eps, sown = m.apply({"params": p}, x, t, y, train=False,
                            mutable=["losses"])
        vals = jax.tree_util.tree_leaves(sown["losses"])
        return jnp.mean(eps ** 2) + 0.01 * sum(vals) / len(vals)

    g = jax.grad(loss)(params)
    w1g = g["DiTBlock_0"]["MoeMlp_0"]["w1"]
    per_expert = np.asarray(jnp.sum(jnp.abs(w1g), axis=(1, 2)))
    assert (per_expert > 0).all(), per_expert
    # the router learns too
    assert float(jnp.sum(jnp.abs(
        g["DiTBlock_0"]["MoeMlp_0"]["router"]["kernel"]))) > 0


# ------------------------------------------------------------- trainer + EP

def test_moe_dit_trains(tmp_path):
    trainer = make_trainer(tmp_path, _moe_dit())
    losses = [trainer.train_epoch(e) for e in range(1, 4)]
    assert all(math.isfinite(l) for l in losses)
    assert min(losses[1:]) < losses[0]


def test_expert_parallel_matches_data_parallel(tmp_path):
    """expert_parallel: 4 on the 8-device mesh (dp=2 x ep=4) reproduces
    the plain-DP trainer's losses — the sharding is metadata only."""
    common = dict(dropout_rng_impl="threefry")
    ep_tr = make_trainer(tmp_path / "ep", _moe_dit(), expert_parallel=4,
                         **common)
    assert ep_tr.mesh.axis_names == ("data", "expert")
    assert dict(zip(ep_tr.mesh.axis_names, ep_tr.mesh.devices.shape)) == \
        {"data": 2, "expert": 4}

    # stacked expert weights sharded over 'expert'; dense leaves replicated
    p = ep_tr.state.params["DiTBlock_0"]["MoeMlp_0"]
    assert p["w1"].sharding.spec == P("expert", None, None)
    assert p["w2"].sharding.spec == P("expert", None, None)
    assert p["b1"].sharding.spec == P("expert", None)
    qkv = ep_tr.state.params["DiTBlock_0"]["SelfAttention_0"]["Dense_0"]
    assert qkv["kernel"].sharding.spec == P()
    # EMA follows the same placement
    e = ep_tr.state.ema_params["DiTBlock_0"]["MoeMlp_0"]
    assert e["w1"].sharding.spec == P("expert", None, None)

    ep_losses = [ep_tr.train_epoch(e) for e in (1, 2, 3)]
    dp_tr = make_trainer(tmp_path / "dp", _moe_dit(), **common)
    dp_losses = [dp_tr.train_epoch(e) for e in (1, 2, 3)]
    assert all(math.isfinite(l) for l in ep_losses)
    np.testing.assert_allclose(ep_losses, dp_losses, rtol=2e-5)

    # params stay expert-sharded after donated steps (jit may drop the
    # trailing Nones from the spec — P('expert') is the same sharding)
    p = ep_tr.state.params["DiTBlock_0"]["MoeMlp_0"]
    assert p["w1"].sharding.spec[0] == "expert"

    samples = ep_tr.sample_images(epoch=1, num_samples=8)
    assert samples.shape == (8, SIZE[0], SIZE[1], 3)


def test_moe_aux_loss_enters_training_objective(tmp_path):
    """The trainer adds moe_aux_weight * load-balance loss: with a huge
    weight the reported loss must sit far above the weight-0 run."""
    tr0 = make_trainer(tmp_path / "w0", _moe_dit(), moe_aux_weight=0.0,
                       dropout_rng_impl="threefry")
    l0 = tr0.train_epoch(1)
    tr1 = make_trainer(tmp_path / "w1", _moe_dit(), moe_aux_weight=100.0,
                       dropout_rng_impl="threefry")
    l1 = tr1.train_epoch(1)
    assert l1 > l0 + 50.0  # aux ≈ 1 at init -> +100-ish


def test_expert_parallel_checkpoint_interchange(tmp_path):
    """EP checkpoints gather to the standard host layout and reload into
    a plain-DP trainer bit-identically."""
    ep_tr = make_trainer(tmp_path / "a", _moe_dit(), expert_parallel=2,
                         dropout_rng_impl="threefry")
    ep_tr.train_epoch(1)
    ep_tr.save_checkpoint(epoch=1)
    ckpt = str(tmp_path / "a" / "ckpt" / "current_model.ckpt")

    dp_tr = make_trainer(tmp_path / "b", _moe_dit(), resume_path=ckpt,
                         dropout_rng_impl="threefry")
    assert dp_tr.start_epoch == 2
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        ep_tr.state.params, dp_tr.state.params,
    )


def test_expert_parallel_validation(tmp_path):
    # EP needs a MoE model
    plain = DiT(img_size=SIZE, patch_size=4, in_channels=3, hidden_size=32,
                depth=2, num_heads=4, num_classes=10, dropout=0.0)
    with pytest.raises(ValueError, match="needs a MoE model"):
        make_trainer(tmp_path / "v1", plain, expert_parallel=2)
    # divisibility
    with pytest.raises(ValueError, match="not divisible"):
        make_trainer(tmp_path / "v2", _moe_dit(num_experts=4),
                     expert_parallel=3)
    # no TP/PP/SP composition
    with pytest.raises(ValueError, match="composes with plain data"):
        make_trainer(tmp_path / "v3", _moe_dit(), expert_parallel=2,
                     tensor_parallel=2)
    # MoE models reject PP/SP (their shard_map bodies drop the aux loss)
    with pytest.raises(ValueError, match="num_experts > 0"):
        make_trainer(tmp_path / "v4", _moe_dit(), pipeline_parallel=2)


def test_moe_torch_export_rejected():
    """MoE checkpoints cannot round-trip into the (dense-only) reference
    DiT — the exporter must say so instead of KeyError-ing."""
    from diffusion_models_collection_tpu.utils.torch_export import (
        export_torch_state_dict,
    )

    m = _moe_dit()
    x = jnp.zeros((1,) + SIZE + (3,))
    vs = m.init({"params": jax.random.PRNGKey(0)}, x, jnp.array([0]),
                jnp.array([1]))
    cfg = {"image_size": SIZE, "conditional": True,
           "model_params": {"img_size": SIZE, "patch_size": 4,
                            "in_channels": 3, "hidden_size": 32,
                            "depth": 2, "num_heads": 4,
                            "num_experts": 4}}
    with pytest.raises(ValueError, match="no reference counterpart"):
        export_torch_state_dict(vs["params"], "dit", cfg)
