"""Backbone contracts: shapes, conditioning, init semantics, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.models import DiM, DiT, UNet
from diffusion_models_collection_tpu.models.layers import (
    sinusoidal_time_embedding_dit,
    sinusoidal_time_embedding_unet,
    unpatchify,
)

B, H, W, C = 2, 16, 16, 3


def make(model):
    x = jnp.zeros((B, H, W, C))
    t = jnp.zeros((B,), jnp.int32)
    y = jnp.zeros((B,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, t, y)
    return variables


SMALL_UNET = dict(
    image_size=(H, W), in_channels=C, model_channels=32, out_channels=C,
    num_res_blocks=1, attention_resolutions=(8,), channel_mult=(1, 2),
)
SMALL_DIT = dict(
    img_size=(H, W), patch_size=4, in_channels=C, hidden_size=64, depth=2,
    num_heads=4,
)
SMALL_DIM = dict(
    img_size=(H, W), patch_size=4, in_channels=C, hidden_size=64, depth=2,
    state_size=4,
)


@pytest.mark.parametrize(
    "cls,kwargs",
    [(UNet, SMALL_UNET), (DiT, SMALL_DIT), (DiM, SMALL_DIM)],
    ids=["unet", "dit", "dim"],
)
def test_forward_shape_unconditional(cls, kwargs):
    model = cls(**kwargs)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C))
    t = jnp.array([0, 99], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(variables, x, t)
    assert out.shape == (B, H, W, C)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize(
    "cls,kwargs",
    [(UNet, SMALL_UNET), (DiT, SMALL_DIT), (DiM, SMALL_DIM)],
    ids=["unet", "dit", "dim"],
)
def test_conditional_null_label_differs(cls, kwargs):
    """y=0 (null) must behave like unconditional; y>0 must change output."""
    model = cls(**kwargs, num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C))
    t = jnp.array([10, 10], jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), x, t, jnp.zeros((B,), jnp.int32)
    )
    # Perturb params: DiT/DiM zero-init their final layers, so outputs at
    # init are identically zero and label effects would be invisible.
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    variables = jax.tree_util.tree_unflatten(
        treedef,
        [
            l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, keys)
        ],
    )
    out_null = model.apply(variables, x, t, jnp.zeros((B,), jnp.int32))
    out_cls = model.apply(variables, x, t, jnp.array([3, 7], jnp.int32))
    assert not np.allclose(out_null, out_cls)
    # labels are clamped to [0, num_classes] (reference unet.py:257)
    out_over = model.apply(variables, x, t, jnp.array([10, 10], jnp.int32))
    out_clamped = model.apply(variables, x, t, jnp.array([99, 99], jnp.int32))
    np.testing.assert_allclose(out_over, out_clamped, rtol=1e-6)


@pytest.mark.parametrize(
    "cls,kwargs", [(DiT, SMALL_DIT), (DiM, SMALL_DIM)], ids=["dit", "dim"]
)
def test_zero_init_final_layer(cls, kwargs):
    """adaLN-Zero: at init the final projection is zero, so output == 0
    (reference dit.py:239-247, dim.py:288-298)."""
    model = cls(**kwargs)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C))
    t = jnp.array([5, 5], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(variables, x, t)
    np.testing.assert_allclose(out, 0.0, atol=1e-7)


def test_unet_attention_resolution_quirk():
    """Attention applied where running resolution hits attention_resolutions,
    with the reference's exact up-path ordering (unet.py:202,228-233)."""
    model = UNet(**{**SMALL_UNET, "attention_resolutions": (16,)})
    x = jnp.zeros((1, H, W, C))
    t = jnp.zeros((1,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, t)
    names = " ".join(variables["params"].keys())
    assert "AttentionBlock" in names
    # attention_resolutions=(4,): only the innermost 8x8... not matched for
    # 16x16 with one downsample (resolutions 16, 8) => no attention blocks
    # except the middle block (always attends when use_attention=True).
    model2 = UNet(**{**SMALL_UNET, "attention_resolutions": (4,)})
    v2 = model2.init(jax.random.PRNGKey(0), x, t)
    attn_count_1 = sum("AttentionBlock" in k for k in variables["params"])
    attn_count_2 = sum("AttentionBlock" in k for k in v2["params"])
    assert attn_count_2 == 1  # middle only
    assert attn_count_1 > attn_count_2


def test_unet_no_attention():
    model = UNet(**SMALL_UNET, use_attention=False)
    x = jnp.zeros((1, H, W, C))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))
    assert not any("AttentionBlock" in k for k in variables["params"])


def test_dropout_train_vs_eval():
    model = UNet(**SMALL_UNET, dropout=0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C))
    t = jnp.zeros((B,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, t)
    e1 = model.apply(variables, x, t)
    e2 = model.apply(variables, x, t)
    np.testing.assert_array_equal(e1, e2)  # eval deterministic
    d1 = model.apply(variables, x, t, train=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    d2 = model.apply(variables, x, t, train=True,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(d1, d2)


def test_time_embeddings():
    t = jnp.array([0.0, 1.0, 10.0])
    e = sinusoidal_time_embedding_unet(t, 32)
    assert e.shape == (3, 32)
    # t=0: sin part 0, cos part 1
    np.testing.assert_allclose(e[0, :16], 0.0, atol=1e-7)
    np.testing.assert_allclose(e[0, 16:], 1.0, atol=1e-7)
    e2 = sinusoidal_time_embedding_dit(t, 32)
    assert e2.shape == (3, 32)
    np.testing.assert_allclose(e2[0, :16], 1.0, atol=1e-7)  # cos first
    np.testing.assert_allclose(e2[0, 16:], 0.0, atol=1e-7)


def test_unpatchify_roundtrip():
    """unpatchify must invert patchify's pixel layout (dit.py:249-261)."""
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (2, 8, 8, 3))
    p = 4
    # manual patchify: (B, h, p, w, q, c) ordering
    patches = img.reshape(2, 2, p, 2, p, 3).transpose(0, 1, 3, 2, 4, 5)
    tokens = patches.reshape(2, 4, p * p * 3)
    out = unpatchify(tokens, 2, 2, p, 3)
    np.testing.assert_array_equal(out, img)


def test_label_embedder_null_row_zero():
    from diffusion_models_collection_tpu.models.layers import LabelEmbedder

    emb = LabelEmbedder(num_classes=5, hidden_size=8)
    y = jnp.array([0, 1, 5])
    variables = emb.init(jax.random.PRNGKey(0), y)
    out = emb.apply(variables, y)
    np.testing.assert_allclose(out[0], 0.0, atol=0)
    assert float(jnp.abs(out[1]).sum()) > 0
    # clamp: y=99 -> y=5
    out2 = emb.apply(variables, jnp.array([99]))
    np.testing.assert_array_equal(out2[0], out[2])


def test_non_square_image():
    model = UNet(
        image_size=(16, 32), in_channels=1, model_channels=16, out_channels=1,
        num_res_blocks=1, channel_mult=(1, 2), attention_resolutions=(8,),
    )
    x = jnp.zeros((1, 16, 32, 1))
    t = jnp.zeros((1,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(variables, x, t)
    assert out.shape == (1, 16, 32, 1)


# ------------------------------------------------------- mixed precision
@pytest.mark.parametrize(
    "cls,kwargs",
    [(UNet, SMALL_UNET), (DiT, SMALL_DIT), (DiM, SMALL_DIM)],
    ids=["unet", "dit", "dim"],
)
def test_bf16_compute_dtype_matches_fp32(cls, kwargs):
    """`dtype=bfloat16` keeps params fp32 and the fp32-eps output contract,
    and stays within bf16 rounding of the fp32 forward. Zero-init final
    layers make the init-params output exactly 0, so params are randomized
    for a meaningful comparison."""
    m32 = cls(**kwargs)
    mbf = cls(**kwargs, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C))
    t = jnp.array([3, 900], jnp.int32)
    variables = mbf.init(jax.random.PRNGKey(0), x, t)
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)  # master weights
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [0.05 * jax.random.normal(k, l.shape, l.dtype)
         for k, l in zip(keys, leaves)],
    )
    o32 = m32.apply({"params": params}, x, t)
    obf = mbf.apply({"params": params}, x, t)
    assert obf.dtype == jnp.float32
    rel = float(jnp.max(jnp.abs(o32 - obf)) / (jnp.max(jnp.abs(o32)) + 1e-8))
    assert rel < 0.05, rel


# ---------------------------------------------------------------- remat
@pytest.mark.parametrize(
    "cls,kwargs",
    [(UNet, SMALL_UNET), (DiT, SMALL_DIT), (DiM, SMALL_DIM)],
    ids=["unet", "dit", "dim"],
)
def test_remat_identical_params_and_grads(cls, kwargs):
    """`remat=True` (jax.checkpoint per block) keeps the param tree AND the
    gradients identical to the plain model — only the backward's memory/
    recompute schedule changes."""
    m0 = cls(**kwargs)
    m1 = cls(**kwargs, remat=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C))
    t = jnp.array([1, 7], jnp.int32)
    params = m0.init(jax.random.PRNGKey(0), x, t)["params"]
    p1 = m1.init(jax.random.PRNGKey(0), x, t)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p1)

    def loss(mod):
        return lambda p: jnp.mean(mod.apply({"params": p}, x, t) ** 2)

    g0 = jax.grad(loss(m0))(params)
    g1 = jax.grad(loss(m1))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)
