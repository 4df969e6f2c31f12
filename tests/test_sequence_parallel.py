"""Sequence parallelism (extension — SURVEY.md §2.3 lists none in the
reference): DiT patch tokens sharded over a 'seq' mesh axis, Q local,
K/V all-gathered per block. Equivalence vs the unsharded DiT on the
8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from diffusion_models_collection_tpu.models import DiT
from diffusion_models_collection_tpu.parallel import (
    data_seq_mesh,
    make_sequence_parallel_apply,
)
from diffusion_models_collection_tpu.parallel import mesh as pmesh


def _setup(dropout=0.0, remat=False):
    model = DiT(img_size=(8, 8), patch_size=2, in_channels=3, hidden_size=32,
                depth=2, num_heads=4, num_classes=10, dropout=dropout,
                remat=remat)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 8, 3))
    t = jnp.arange(8) % 10
    y = (jnp.arange(8) % 10) + 1
    params = model.init(jax.random.PRNGKey(1), x, t, y)["params"]
    # adaLN-Zero final layers are zero-init: a FRESH DiT outputs exactly
    # 0 for any input, making output-parity assertions vacuous — perturb
    # so every layer carries signal through the sharded paths
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(
            jax.random.PRNGKey(99), p.shape, p.dtype),
        params,
    )
    return model, params, x, t, y


def _place(mesh, params, *batch):
    sharding = NamedSharding(mesh, P("data"))
    return (pmesh.replicate(mesh, params),
            *(jax.device_put(a, sharding) for a in batch))


@pytest.mark.parametrize("dp,sp", [(1, 2), (2, 4), (1, 8)])
def test_sequence_parallel_forward_matches_unsharded(dp, sp):
    model, params, x, t, y = _setup()
    ref = model.apply({"params": params}, x, t, y, train=False)
    mesh = data_seq_mesh(dp, sp)
    apply_fn = make_sequence_parallel_apply(model, mesh)
    pr, xs, ts, ys = _place(mesh, params, x, t, y)
    out = apply_fn(pr, xs, ts, ys, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sequence_parallel_grads_match_unsharded():
    """shard_map's transpose psums the per-token-shard parameter
    cotangents — grads of the replicated params equal the unsharded
    model's grads."""
    model, params, x, t, y = _setup()
    tgt = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    mesh = data_seq_mesh(2, 4)
    apply_fn = make_sequence_parallel_apply(model, mesh)
    pr, xs, ts, ys, tgts = _place(mesh, params, x, t, y, tgt)

    g_sp = jax.jit(jax.grad(
        lambda p: jnp.mean((apply_fn(p, xs, ts, ys) - tgts) ** 2)
    ))(pr)
    g_ref = jax.grad(
        lambda p: jnp.mean(
            (model.apply({"params": p}, x, t, y, train=False) - tgt) ** 2
        )
    )(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        ),
        g_sp, g_ref,
    )


def test_sequence_parallel_remat_matches():
    """remat=True recomputes block activations in the backward without
    changing the result."""
    model, params, x, t, y = _setup(remat=True)
    ref = model.apply({"params": params}, x, t, y, train=False)
    mesh = data_seq_mesh(2, 4)
    apply_fn = make_sequence_parallel_apply(model, mesh)
    pr, xs, ts, ys = _place(mesh, params, x, t, y)
    out = apply_fn(pr, xs, ts, ys, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    g = jax.jit(jax.grad(
        lambda p: jnp.mean(apply_fn(p, xs, ts, ys) ** 2)
    ))(pr)
    assert all(
        bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(g)
    )


def test_sequence_parallel_dropout_train_runs():
    """With dropout on, masks are per-shard streams (no exact-parity
    claim) — the train path must still produce finite outputs/grads."""
    model, params, x, t, y = _setup(dropout=0.3)
    mesh = data_seq_mesh(2, 4)
    apply_fn = make_sequence_parallel_apply(model, mesh)
    pr, xs, ts, ys = _place(mesh, params, x, t, y)
    rng = jax.random.PRNGKey(7)
    out = apply_fn(pr, xs, ts, ys, dropout_rng=rng, train=True)
    assert bool(jnp.all(jnp.isfinite(out)))
    g = jax.jit(jax.grad(
        lambda p: jnp.mean(
            apply_fn(p, xs, ts, ys, dropout_rng=rng, train=True) ** 2
        )
    ))(pr)
    assert all(
        bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(g)
    )


def test_sequence_parallel_unconditional_matches_unsharded():
    """y=None must SKIP the label embedding (models/dit.py semantics) —
    the zeros placeholder that rides through shard_map must not inject
    the null-class embedding (regression: round-2 review)."""
    model, params, x, t, _ = _setup()
    # adaLN-Zero final layer is zero-init → fresh params output zeros for
    # ANY conditioning; perturb so label (non-)injection is observable
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(
            jax.random.PRNGKey(3), p.shape, p.dtype),
        params)
    ref = model.apply({"params": params}, x, t, None, train=False)
    mesh = data_seq_mesh(2, 4)
    apply_fn = make_sequence_parallel_apply(model, mesh)
    pr, xs, ts = _place(mesh, params, x, t)
    out = apply_fn(pr, xs, ts, None, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # and it genuinely differs from a REAL class (y=0 is the null row,
    # masked to exact zero by LabelEmbedder — identical to y=None by design)
    y1 = jnp.ones((8,), jnp.int32)
    labeled = apply_fn(pr, xs, ts, jax.device_put(
        y1, jax.sharding.NamedSharding(mesh, P("data"))), train=False)
    assert not np.allclose(np.asarray(out), np.asarray(labeled))


def test_sequence_parallel_rejects_indivisible_tokens():
    model = DiT(img_size=(6, 6), patch_size=2, in_channels=3, hidden_size=32,
                depth=2, num_heads=4, num_classes=10)  # 9 tokens
    mesh = data_seq_mesh(1, 2)
    with pytest.raises(AssertionError, match="not divisible"):
        make_sequence_parallel_apply(model, mesh)


def test_sequence_parallel_dropout_decorrelated_across_data_shards():
    """Data shards must draw DISTINCT dropout masks (regression: round-2
    review — the rng was only folded per layer/seq index, so dp ranks
    applied byte-identical masks to different examples). Feed identical
    inputs to both dp shards: identical masks would make their outputs
    bit-equal."""
    model, params, x, t, y = _setup(dropout=0.3)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(
            jax.random.PRNGKey(3), p.shape, p.dtype),
        params)
    x = jnp.concatenate([x[:4], x[:4]])
    t = jnp.concatenate([t[:4], t[:4]])
    y = jnp.concatenate([y[:4], y[:4]])
    mesh = data_seq_mesh(2, 4)
    apply_fn = make_sequence_parallel_apply(model, mesh)
    pr, xs, ts, ys = _place(mesh, params, x, t, y)
    out = np.asarray(apply_fn(pr, xs, ts, ys,
                              dropout_rng=jax.random.PRNGKey(7), train=True))
    assert not np.allclose(out[:4], out[4:])


# ---- SP x TP composition: 3-axis (data, seq, model) mesh -----------------

def test_sp_tp_forward_and_grads_match_unsharded():
    """DP x SP x TP: the token-sharded shard_map is manual over
    (data, seq) while 'model' stays a GSPMD auto axis — Megatron-sharded
    params flow through the SP body (Q local / K,V all-gathered per
    block) and XLA inserts the per-block all-reduces. Forward AND param
    grads == the plain unsharded model."""
    from diffusion_models_collection_tpu.parallel.sequence_parallel import (
        data_seq_model_mesh,
    )
    from diffusion_models_collection_tpu.parallel.tensor_parallel import (
        shard_model_params,
    )

    model, params, x, t, y = _setup()
    ref = model.apply({"params": params}, x, t, y, train=False)
    mesh = data_seq_model_mesh(2, 2, 2)
    sharded = shard_model_params(mesh, params)
    qkv = sharded["DiTBlock_0"]["SelfAttention_0"]["Dense_0"]["kernel"]
    assert "model" in str(qkv.sharding.spec), qkv.sharding.spec
    apply_fn = make_sequence_parallel_apply(model, mesh)
    out = apply_fn(sharded, x, t, y, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    tgt = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    g_sp = jax.grad(
        lambda p: jnp.mean((apply_fn(p, x, t, y) - tgt) ** 2)
    )(sharded)
    g_ref = jax.grad(
        lambda p: jnp.mean(
            (model.apply({"params": p}, x, t, y, train=False) - tgt) ** 2
        )
    )(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-5
        ),
        g_sp, g_ref,
    )
