"""Pipeline parallelism (extension — SURVEY.md §2.3 lists none in the
reference): GPipe microbatch schedule as shard_map + ppermute over a
'stage' mesh axis. Equivalence vs the unpipelined DiT on the 8-device
virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from diffusion_models_collection_tpu.models import DiT
from diffusion_models_collection_tpu.parallel import (
    data_stage_mesh,
    make_pipeline_apply,
    shard_dit_params_pp,
    stack_block_params,
    unstack_block_params,
)


def _setup(dropout=0.0, depth=4):
    model = DiT(img_size=(8, 8), patch_size=2, in_channels=3, hidden_size=32,
                depth=depth, num_heads=4, num_classes=10, dropout=dropout)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 8, 3))
    t = jnp.arange(8) % 10
    y = (jnp.arange(8) % 10) + 1
    params = model.init(jax.random.PRNGKey(1), x, t, y)["params"]
    # adaLN-Zero final layers are zero-init: a FRESH DiT outputs exactly
    # 0 for any input, making output-parity assertions vacuous — perturb
    # so every layer carries signal through the pipeline
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(
            jax.random.PRNGKey(99), p.shape, p.dtype),
        params,
    )
    return model, params, x, t, y


@pytest.mark.parametrize("dp,pp", [(1, 2), (2, 4)])
def test_pipeline_forward_matches_unpipelined(dp, pp):
    model, params, x, t, y = _setup()
    ref = model.apply({"params": params}, x, t, y, train=False)
    mesh = data_stage_mesh(dp, pp)
    stacked, rest = shard_dit_params_pp(mesh, params, model.depth)
    apply_fn = make_pipeline_apply(model, mesh, num_microbatches=4)
    out = apply_fn(stacked, rest, x, t, y, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_grads_match_unpipelined():
    """Autodiff through the ppermute pipeline == per-block grads of the
    plain model (GPipe backward derived automatically)."""
    model, params, x, t, y = _setup()
    tgt = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    mesh = data_stage_mesh(2, 4)
    stacked, rest = shard_dit_params_pp(mesh, params, model.depth)
    apply_fn = make_pipeline_apply(model, mesh)

    g_pp = jax.grad(
        lambda st: jnp.mean((apply_fn(st, rest, x, t, y) - tgt) ** 2)
    )(stacked)
    g_ref = jax.grad(
        lambda p: jnp.mean(
            (model.apply({"params": p}, x, t, y, train=False) - tgt) ** 2
        )
    )(params)
    g_ref_stacked, _ = stack_block_params(g_ref, model.depth)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=5e-5),
        g_pp, g_ref_stacked,
    )


def test_stack_unstack_roundtrip():
    model, params, *_ = _setup()
    stacked, rest = stack_block_params(params, model.depth)
    back = unstack_block_params(stacked, rest, model.depth)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), params, back
    )


def test_pipeline_train_step_decreases_loss():
    """Jitted PP train step (dropout active, rng threaded) learns."""
    model, params, x, t, y = _setup(dropout=0.1)
    mesh = data_stage_mesh(2, 2)
    stacked, rest = shard_dit_params_pp(mesh, params, model.depth)
    apply_fn = make_pipeline_apply(model, mesh)
    tx = optax.adam(1e-3)
    opt_state = tx.init((stacked, rest))
    tgt = jax.random.normal(jax.random.PRNGKey(3), x.shape)

    @jax.jit
    def step(stacked, rest, opt_state, rng):
        def loss_fn(st, rs):
            out = apply_fn(st, rs, x, t, y, dropout_rng=rng, train=True)
            return jnp.mean((out - tgt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            stacked, rest)
        updates, opt_state = tx.update(grads, opt_state, (stacked, rest))
        stacked, rest = optax.apply_updates((stacked, rest), updates)
        return stacked, rest, opt_state, loss

    losses = []
    rng = jax.random.PRNGKey(4)
    for i in range(8):
        rng, sub = jax.random.split(rng)
        stacked, rest, opt_state, loss = step(stacked, rest, opt_state, sub)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert min(losses[1:]) < losses[0], losses


def test_pipeline_unconditional_matches_unpipelined():
    """y=None must SKIP the label embedding (models/dit.py semantics) —
    the zeros placeholder that rides through shard_map must not inject
    the null-class embedding (regression: round-2 review; PP counterpart
    of the SP test)."""
    model, params, x, t, _ = _setup()
    # adaLN-Zero final layer is zero-init -> fresh params output zeros for
    # ANY conditioning; perturb so label (non-)injection is observable
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(
            jax.random.PRNGKey(3), p.shape, p.dtype),
        params)
    ref = model.apply({"params": params}, x, t, None, train=False)
    mesh = data_stage_mesh(2, 4)
    stacked, rest = shard_dit_params_pp(mesh, params, model.depth)
    apply_fn = make_pipeline_apply(model, mesh, num_microbatches=4)
    out = apply_fn(stacked, rest, x, t, None, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # and it genuinely differs from a REAL class (y=0 is the null row,
    # masked to exact zero by LabelEmbedder — identical to y=None)
    labeled = apply_fn(stacked, rest, x, t, jnp.ones((8,), jnp.int32),
                       train=False)
    assert not np.allclose(np.asarray(out), np.asarray(labeled))


def test_pipeline_dropout_decorrelated_across_data_shards():
    """Data shards must draw DISTINCT dropout masks (regression: round-2
    review — the rng was only folded per tick/layer, so dp ranks applied
    byte-identical masks to different examples)."""
    model, params, x, t, y = _setup(dropout=0.3)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(
            jax.random.PRNGKey(3), p.shape, p.dtype),
        params)
    x = jnp.concatenate([x[:4], x[:4]])
    t = jnp.concatenate([t[:4], t[:4]])
    y = jnp.concatenate([y[:4], y[:4]])
    mesh = data_stage_mesh(2, 4)
    stacked, rest = shard_dit_params_pp(mesh, params, model.depth)
    apply_fn = make_pipeline_apply(model, mesh, num_microbatches=2)
    out = np.asarray(apply_fn(stacked, rest, x, t, y,
                              dropout_rng=jax.random.PRNGKey(7), train=True))
    assert not np.allclose(out[:4], out[4:])


# ------------------------------------------------------------------ DiM PP
def _setup_dim(depth=4):
    from diffusion_models_collection_tpu.models import DiM

    model = DiM(img_size=(8, 8), patch_size=2, in_channels=3, hidden_size=32,
                depth=depth, state_size=4, num_classes=10, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 8, 3))
    t = jnp.arange(8) % 10
    y = (jnp.arange(8) % 10) + 1
    params = model.init(jax.random.PRNGKey(1), x, t, y)["params"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(
            jax.random.PRNGKey(99), p.shape, p.dtype),
        params)
    return model, params, x, t, y


def test_pipeline_dim_forward_matches_unpipelined():
    """The DiM (Mamba) block stack pipelines through the same GPipe
    schedule — the selective scans run inside each stage unchanged."""
    model, params, x, t, y = _setup_dim()
    ref = model.apply({"params": params}, x, t, y, train=False)
    mesh = data_stage_mesh(2, 4)
    stacked, rest = shard_dit_params_pp(mesh, params, model.depth,
                                        prefix="DiMBlock_")
    apply_fn = make_pipeline_apply(model, mesh, num_microbatches=4)
    out = apply_fn(stacked, rest, x, t, y, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_dim_grads_match_unpipelined():
    model, params, x, t, y = _setup_dim()
    tgt = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    mesh = data_stage_mesh(2, 4)
    stacked, rest = shard_dit_params_pp(mesh, params, model.depth,
                                        prefix="DiMBlock_")
    apply_fn = make_pipeline_apply(model, mesh)

    g_pp = jax.grad(
        lambda st: jnp.mean((apply_fn(st, rest, x, t, y) - tgt) ** 2)
    )(stacked)
    g_ref = jax.grad(
        lambda p: jnp.mean(
            (model.apply({"params": p}, x, t, y, train=False) - tgt) ** 2
        )
    )(params)
    ref_stacked, _ = stack_block_params(g_ref, model.depth,
                                        prefix="DiMBlock_")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5
        ),
        g_pp, ref_stacked,
    )


def test_pipeline_dim_rejects_attention_fallback():
    from diffusion_models_collection_tpu.models import DiM

    model = DiM(img_size=(8, 8), patch_size=2, in_channels=3, hidden_size=32,
                depth=2, num_classes=10, use_attention_fallback=True)
    with pytest.raises(AssertionError, match="fallback"):
        make_pipeline_apply(model, data_stage_mesh(1, 2))


# ---- PP x TP composition: 3-axis (data, stage, model) mesh ---------------

def test_pipeline_tp_forward_matches_unpipelined():
    """DP x PP x TP: the pipeline shard_map is manual over (data, stage)
    while 'model' stays a GSPMD auto axis — the Megatron-sharded stacked
    blocks flow through the GPipe schedule and XLA inserts the per-block
    all-reduces. Forward == the plain unsharded model."""
    from diffusion_models_collection_tpu.parallel import (
        data_stage_model_mesh,
    )

    model, params, x, t, y = _setup()
    ref = model.apply({"params": params}, x, t, y, train=False)
    mesh = data_stage_model_mesh(2, 2, 2)
    stacked, rest = shard_dit_params_pp(mesh, params, model.depth)
    # the Megatron specs actually landed: QKV column-parallel over 'model'
    qkv = stacked["SelfAttention_0"]["Dense_0"]["kernel"]
    assert "model" in str(qkv.sharding.spec) and \
        "stage" in str(qkv.sharding.spec), qkv.sharding.spec
    out_proj = stacked["SelfAttention_0"]["Dense_1"]["kernel"]
    assert "model" in str(out_proj.sharding.spec), out_proj.sharding.spec
    apply_fn = make_pipeline_apply(model, mesh, num_microbatches=2)
    out = apply_fn(stacked, rest, x, t, y, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_tp_grads_match_unpipelined():
    """Autodiff through the partial-manual pipeline with Megatron-sharded
    blocks == per-block grads of the plain model."""
    from diffusion_models_collection_tpu.parallel import (
        data_stage_model_mesh,
    )

    model, params, x, t, y = _setup()
    tgt = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    mesh = data_stage_model_mesh(2, 2, 2)
    stacked, rest = shard_dit_params_pp(mesh, params, model.depth)
    apply_fn = make_pipeline_apply(model, mesh)

    g_pp = jax.grad(
        lambda st: jnp.mean((apply_fn(st, rest, x, t, y) - tgt) ** 2)
    )(stacked)
    g_ref = jax.grad(
        lambda p: jnp.mean(
            (model.apply({"params": p}, x, t, y, train=False) - tgt) ** 2
        )
    )(params)
    g_ref_stacked, _ = stack_block_params(g_ref, model.depth)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-5
        ),
        g_pp, g_ref_stacked,
    )
