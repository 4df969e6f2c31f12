"""DiT tensor parallelism: Megatron sharding rules over a (data, model)
mesh produce identical math to the replicated computation."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from diffusion_models_collection_tpu.models import DiT
from diffusion_models_collection_tpu.parallel.tensor_parallel import (
    data_model_mesh,
    shard_dit_params,
)


def _perturb(params, scale=0.02):
    """adaLN-Zero final layers are zero-init: a FRESH DiT/DiM outputs
    exactly 0 for any input, which would make forward-parity assertions
    vacuous (zeros == zeros) — perturb so every layer carries signal."""
    return jax.tree_util.tree_map(
        lambda p: p + scale * jax.random.normal(
            jax.random.PRNGKey(99), p.shape, p.dtype),
        params,
    )


def _tiny_dit_and_params():
    model = DiT(img_size=(8, 8), patch_size=4, in_channels=3, hidden_size=64,
                depth=2, num_heads=4, num_classes=10, dropout=0.0)
    x = jnp.zeros((4, 8, 8, 3))
    t = jnp.zeros((4,), jnp.int32)
    y = jnp.zeros((4,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, y)["params"]
    return model, _perturb(params)


def test_mesh_shape():
    mesh = data_model_mesh(2, 4)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (2, 4)


def test_tp_sharding_rules_applied():
    mesh = data_model_mesh(2, 4)
    model, params = _tiny_dit_and_params()
    sharded = shard_dit_params(mesh, params)
    block = sharded["DiTBlock_0"]
    qkv = block["SelfAttention_0"]["Dense_0"]["kernel"]
    out = block["SelfAttention_0"]["Dense_1"]["kernel"]
    mlp_up = block["Mlp_0"]["Dense_0"]["kernel"]
    assert qkv.sharding.spec == P(None, "model")
    assert out.sharding.spec == P("model", None)
    assert mlp_up.sharding.spec == P(None, "model")
    # non-block params replicated
    pos = sharded["pos_embed"]
    assert pos.sharding.spec == P()


def test_tp_forward_matches_replicated():
    mesh = data_model_mesh(2, 4)
    model, params = _tiny_dit_and_params()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
    t = jnp.array([0, 5, 9, 3], jnp.int32)
    y = jnp.array([1, 2, 3, 4], jnp.int32)

    ref = model.apply({"params": params}, x, t, y)

    sharded_params = shard_dit_params(mesh, params)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(
        lambda p, xx: model.apply({"params": p}, xx, t, y)
    )(sharded_params, x_sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_tp_grads_match_replicated():
    mesh = data_model_mesh(2, 4)
    model, params = _tiny_dit_and_params()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
    t = jnp.zeros((4,), jnp.int32)
    y = jnp.ones((4,), jnp.int32)

    def loss(p, xx):
        return jnp.mean(model.apply({"params": p}, xx, t, y) ** 2)

    g_ref = jax.grad(loss)(params, x)
    sharded_params = shard_dit_params(mesh, params)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    g_tp = jax.jit(jax.grad(loss))(sharded_params, x_sharded)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_tp), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5
        )


# ----------------------------------------------------------------- DiM TP
def _tiny_dim_and_params():
    from diffusion_models_collection_tpu.models import DiM

    model = DiM(img_size=(8, 8), patch_size=4, in_channels=3, hidden_size=32,
                depth=2, state_size=4, num_classes=10, dropout=0.0)
    x = jnp.zeros((4, 8, 8, 3))
    t = jnp.zeros((4,), jnp.int32)
    y = jnp.zeros((4,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, y)["params"]
    return model, _perturb(params)


def test_dim_tp_sharding_rules_applied():
    from diffusion_models_collection_tpu.parallel.tensor_parallel import (
        shard_dim_params,
    )

    mesh = data_model_mesh(2, 4)
    model, params = _tiny_dim_and_params()
    sharded = shard_dim_params(mesh, params)
    mamba = sharded["DiMBlock_0"]["MambaBlock_0"]["Mamba_0"]
    assert mamba["in_proj_x"]["kernel"].sharding.spec == P(None, "model")
    assert mamba["in_proj_z"]["kernel"].sharding.spec == P(None, "model")
    assert mamba["dt_proj"]["kernel"].sharding.spec == P(None, "model")
    assert mamba["dt_proj"]["bias"].sharding.spec == P("model")
    assert mamba["x_dbl"]["kernel"].sharding.spec == P("model", None)
    assert mamba["out_proj"]["kernel"].sharding.spec == P("model", None)
    assert mamba["A_log"].sharding.spec == P("model", None)
    assert mamba["D"].sharding.spec == P("model")
    assert mamba["conv"]["kernel"].sharding.spec == P(None, None, "model")
    ff = sharded["DiMBlock_0"]["FeedForward_0"]
    assert ff["Mlp_0"]["Dense_0"]["kernel"].sharding.spec == P(None, "model")
    assert ff["Mlp_0"]["Dense_1"]["kernel"].sharding.spec == P("model", None)


def test_dim_tp_forward_and_grads_match_replicated():
    """DiM under (data, model) TP — the selective scan runs inside a
    shard_map over the model axis (scan_tensor_parallel context) while the
    projections shard via GSPMD metadata; outputs and grads must match the
    replicated computation."""
    from diffusion_models_collection_tpu.ops.selective_scan import (
        scan_tensor_parallel,
    )
    from diffusion_models_collection_tpu.parallel.tensor_parallel import (
        shard_dim_params,
    )

    mesh = data_model_mesh(2, 4)
    model, params = _tiny_dim_and_params()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
    t = jnp.array([0, 5, 9, 3], jnp.int32)
    y = jnp.array([1, 2, 3, 4], jnp.int32)

    def loss(p, xx):
        return jnp.mean(model.apply({"params": p}, xx, t, y) ** 2)

    ref = model.apply({"params": params}, x, t, y)
    g_ref = jax.grad(loss)(params, x)

    sharded_params = shard_dim_params(mesh, params)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    with scan_tensor_parallel(mesh, "model"):
        out = jax.jit(
            lambda p, xx: model.apply({"params": p}, xx, t, y)
        )(sharded_params, x_sharded)
        g_tp = jax.jit(jax.grad(loss))(sharded_params, x_sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_tp), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5
        )
