"""Perturbed Attention Guidance (Ahn et al. 2024, extension beyond the
reference — diffusion/pag.py): the guidance formula, the identity-
attention model degradation on UNet/DiT, parameter-tree invariance (the
same checkpoint runs both branches), and sampling under jit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusion_models_collection_tpu.diffusion import DDIM, pag_model_fn
from diffusion_models_collection_tpu.factory import eval_model_fn, get_model
from diffusion_models_collection_tpu.models.dit import SelfAttention
from diffusion_models_collection_tpu.models.unet import AttentionBlock


# ----------------------------------------------------------------- wrapper
def test_pag_formula():
    """eps' = eps + s * (eps - eps_perturbed), elementwise."""
    rng = np.random.default_rng(0)
    eps = jnp.asarray(rng.normal(size=(2, 4, 4, 3)).astype(np.float32))
    eps_p = jnp.asarray(rng.normal(size=(2, 4, 4, 3)).astype(np.float32))

    fn = pag_model_fn(
        jax.tree_util.Partial(lambda x, t, y=None: eps),
        jax.tree_util.Partial(lambda x, t, y=None: eps_p),
        2.5,
    )
    out = fn(jnp.zeros((2, 4, 4, 3)), jnp.zeros((2,), jnp.int32), None)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(eps + 2.5 * (eps - eps_p)),
        rtol=1e-6, atol=1e-7,
    )


def test_pag_scale_zero_is_identity():
    fn = pag_model_fn(
        jax.tree_util.Partial(lambda x, t, y=None: jnp.tanh(x)),
        jax.tree_util.Partial(lambda x, t, y=None: jnp.zeros_like(x)),
        0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3))
    np.testing.assert_allclose(
        np.asarray(fn(x, jnp.zeros((2,), jnp.int32))),
        np.asarray(jnp.tanh(x)), atol=1e-7,
    )


# ------------------------------------------------- identity-attention math
def test_unet_attention_perturb_single_token_exact():
    """With one spatial token the softmax attention map IS the identity,
    so the perturbed path must match the normal path bit-for-bit — an
    exact check that `perturb` replaces the map and nothing else."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 1, 8))
    normal = AttentionBlock(num_heads=2)
    params = normal.init(jax.random.PRNGKey(1), x)
    out_n = normal.apply(params, x)
    out_p = AttentionBlock(num_heads=2, perturb=True).apply(params, x)
    np.testing.assert_array_equal(np.asarray(out_n), np.asarray(out_p))


def test_dit_attention_perturb_single_token_exact():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 16))
    normal = SelfAttention(num_heads=4)
    params = normal.init(jax.random.PRNGKey(1), x)
    out_n = normal.apply(params, x)
    out_p = SelfAttention(num_heads=4, perturb=True).apply(params, x)
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(out_p),
                               rtol=1e-5, atol=1e-6)


def test_unet_attention_perturb_multi_token_differs():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    normal = AttentionBlock(num_heads=2)
    params = normal.init(jax.random.PRNGKey(1), x)
    out_n = normal.apply(params, x)
    out_p = AttentionBlock(num_heads=2, perturb=True).apply(params, x)
    assert out_n.shape == out_p.shape
    assert float(jnp.max(jnp.abs(out_n - out_p))) > 1e-4


# --------------------------------------------- whole-model checkpoint reuse
UNET_CFG = {
    "model_type": "unet",
    "image_size": (8, 8),
    "conditional": True,
    "num_classes": 5,
    "model_params": {
        "image_size": (8, 8), "in_channels": 3, "model_channels": 16,
        "out_channels": 3, "num_res_blocks": 1,
        "attention_resolutions": (4,), "channel_mult": (1, 2),
        "use_attention": True, "dropout": 0.0,
    },
}

DIT_CFG = {
    "model_type": "dit",
    "image_size": (8, 8),
    "conditional": False,
    "model_params": {
        "in_channels": 3, "patch_size": 2, "hidden_size": 32,
        "depth": 2, "num_heads": 4,
    },
}


@pytest.mark.parametrize("cfg", [UNET_CFG, DIT_CFG],
                         ids=["unet", "dit"])
def test_perturbed_model_shares_param_tree(cfg):
    """pag_perturb is parameter-free: the perturbed variant inits the
    IDENTICAL param tree (same leaves, shapes, dtypes), so any existing
    checkpoint runs both branches — and its forward genuinely differs."""
    model = get_model(cfg)
    p_cfg = dict(cfg, model_params=dict(cfg["model_params"],
                                        pag_perturb=True))
    p_model = get_model(p_cfg)

    x = jnp.ones((2, 8, 8, 3))
    t = jnp.asarray([3, 7])
    y = jnp.asarray([1, 2]) if cfg["conditional"] else None
    params = model.init(jax.random.PRNGKey(0), x, t, y)["params"]
    p_params = p_model.init(jax.random.PRNGKey(0), x, t, y)["params"]
    chk = jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape and a.dtype == b.dtype,
        params, p_params,
    )
    assert all(jax.tree_util.tree_leaves(chk))

    # nudge off init so zero-init layers (DiT's adaLN-Zero final layer)
    # don't make both variants output exactly 0
    params_nz = jax.tree_util.tree_map(lambda a: a + 0.05, params)
    xr = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 3))
    out_n = model.apply({"params": params_nz}, xr, t, y, train=False)
    out_p = p_model.apply({"params": params_nz}, xr, t, y, train=False)
    assert out_n.shape == out_p.shape
    assert float(jnp.max(jnp.abs(out_n - out_p))) > 1e-5


def test_pag_sampling_under_jit():
    """The PAG-wrapped callable is a pytree (Partial-of-Partials): the
    DDIM lax.scan trajectory traces and runs with it, and scale=0
    reproduces the unguided trajectory exactly."""
    model = get_model(UNET_CFG)
    p_model = get_model(dict(
        UNET_CFG,
        model_params=dict(UNET_CFG["model_params"], pag_perturb=True),
    ))
    x = jnp.ones((1, 8, 8, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1,), jnp.int32))["params"]
    base_fn = eval_model_fn(model, params)
    pert_fn = eval_model_fn(p_model, params)

    ddim = DDIM(num_timesteps=10, num_inference_steps=5)
    shape = (2, 8, 8, 3)
    y = jnp.asarray([1, 3])
    ref = ddim.sample(base_fn, shape, jax.random.PRNGKey(4), y=y)
    out0 = ddim.sample(pag_model_fn(base_fn, pert_fn, 0.0), shape,
                       jax.random.PRNGKey(4), y=y)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    out2 = ddim.sample(pag_model_fn(base_fn, pert_fn, 2.0), shape,
                       jax.random.PRNGKey(4), y=y)
    assert float(jnp.max(jnp.abs(out2 - ref))) > 1e-4
