"""Cross-framework parity: import reference PyTorch weights and verify the
JAX forward matches the actual torch reference model numerically.

These tests run the REAL reference modules (under torch-CPU) from
/root/reference when present — the strongest possible parity evidence for
the importer (utils/torch_import.py). Skipped when the reference tree is
absent (the importer's structural mapping is still covered by the
synthetic Mamba roundtrip below, which needs no reference code).
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.models import DiM, DiT, UNet
from diffusion_models_collection_tpu.utils.torch_import import (
    convert_torch_state_dict,
    load_reference_checkpoint,
)

REFERENCE = Path("/root/reference")
needs_reference = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference repo not available"
)

B, H, W, C = 2, 16, 16, 3


def _torch_and_inputs():
    import torch

    torch.manual_seed(0)
    x = np.random.default_rng(0).standard_normal((B, C, H, W)).astype(np.float32)
    t = np.array([3, 7], np.int64)
    y = np.array([1, 4], np.int64)
    return torch, x, t, y


def _run_ref(tm, x, t, y):
    import torch

    tm.eval()
    with torch.no_grad():
        out = tm(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(y))
    return out.numpy()


def _run_ours(model, params, x, t, y):
    out = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x.transpose(0, 2, 3, 1)),  # NCHW -> NHWC
        jnp.asarray(t, jnp.int32),
        jnp.asarray(y, jnp.int32),
        train=False,
    )
    return np.asarray(out).transpose(0, 3, 1, 2)  # back to NCHW


def _assert_close(ref, ours, tol=2e-4):
    denom = np.abs(ref).max() + 1e-8
    rel = np.abs(ref - ours).max() / denom
    assert rel < tol, f"max rel deviation {rel}"


@needs_reference
def test_unet_torch_import_parity():
    sys.path.insert(0, str(REFERENCE))
    from models.unet import UNet as RefUNet

    torch, x, t, y = _torch_and_inputs()
    kw = dict(image_size=(H, W), in_channels=C, model_channels=16,
              out_channels=C, num_res_blocks=1, attention_resolutions=(8,),
              channel_mult=(1, 2), num_classes=10)
    tm = RefUNet(**kw)
    params = convert_torch_state_dict(tm.state_dict(), "unet")
    ours = UNet(**kw)
    _assert_close(_run_ref(tm, x, t, y), _run_ours(ours, params, x, t, y))


@needs_reference
def test_dit_torch_import_parity():
    sys.path.insert(0, str(REFERENCE))
    from models.dit import DiT as RefDiT

    torch, x, t, y = _torch_and_inputs()
    kw = dict(img_size=(H, W), patch_size=4, in_channels=C, hidden_size=32,
              depth=2, num_heads=4, num_classes=10)
    tm = RefDiT(**kw)
    # zero-init final layers make the output identically 0 — perturb so the
    # comparison is meaningful.
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(0.02 * torch.randn_like(p))
    params = convert_torch_state_dict(tm.state_dict(), "dit")
    ours = DiT(**kw, dropout=0.0)
    _assert_close(_run_ref(tm, x, t, y), _run_ours(ours, params, x, t, y))


@needs_reference
def test_dim_attention_fallback_torch_import_parity():
    sys.path.insert(0, str(REFERENCE))
    import models.dim as ref_dim

    assert not ref_dim.MAMBA_AVAILABLE, "env unexpectedly has mamba_ssm"
    torch, x, t, y = _torch_and_inputs()
    kw = dict(img_size=(H, W), patch_size=4, in_channels=C, hidden_size=32,
              depth=1, num_classes=10)
    tm = ref_dim.DiM(**kw)
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(0.02 * torch.randn_like(p))
    params = convert_torch_state_dict(tm.state_dict(), "dim")
    ours = DiM(**kw, dropout=0.0, use_attention_fallback=True)
    _assert_close(_run_ref(tm, x, t, y), _run_ours(ours, params, x, t, y))


def test_dim_mamba_weights_synthetic_roundtrip():
    """mamba_ssm is CUDA-only, so real-Mamba checkpoints can't be produced
    here; verify the mapping structurally instead — a synthetic torch-style
    state dict with mamba_ssm's key names converts into exactly the pytree
    our DiM init produces (same paths, same shapes), with the fused in_proj
    split into the x/z halves and the depthwise conv transposed."""
    kw = dict(img_size=(H, W), patch_size=4, in_channels=C, hidden_size=32,
              depth=1, state_size=4, num_classes=10)
    model = DiM(**kw)
    ref_params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, C)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )["params"]

    d, d_inner, n, dt_rank, k = 32, 64, 4, 2, 4
    rng = np.random.default_rng(1)

    def r(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    sd = {
        "pos_embed": r(1, 16, d),
        "x_embedder.proj.weight": r(d, C, 4, 4),
        "x_embedder.proj.bias": r(d),
        "t_embedder.mlp.0.weight": r(d, 256),
        "t_embedder.mlp.0.bias": r(d),
        "t_embedder.mlp.2.weight": r(d, d),
        "t_embedder.mlp.2.bias": r(d),
        "y_embedder.embedding_table.weight": r(11, d),
        "blocks.0.mamba_block.norm.weight": r(d),
        "blocks.0.mamba_block.norm.bias": r(d),
        "blocks.0.mamba_block.adaLN_modulation.1.weight": r(3 * d, d),
        "blocks.0.mamba_block.adaLN_modulation.1.bias": r(3 * d),
        "blocks.0.mamba_block.mamba.in_proj.weight": r(2 * d_inner, d),
        "blocks.0.mamba_block.mamba.conv1d.weight": r(d_inner, 1, k),
        "blocks.0.mamba_block.mamba.conv1d.bias": r(d_inner),
        "blocks.0.mamba_block.mamba.x_proj.weight": r(dt_rank + 2 * n, d_inner),
        "blocks.0.mamba_block.mamba.dt_proj.weight": r(d_inner, dt_rank),
        "blocks.0.mamba_block.mamba.dt_proj.bias": r(d_inner),
        "blocks.0.mamba_block.mamba.A_log": r(d_inner, n),
        "blocks.0.mamba_block.mamba.D": r(d_inner),
        "blocks.0.mamba_block.mamba.out_proj.weight": r(d, d_inner),
        "blocks.0.ff_block.norm.weight": r(d),
        "blocks.0.ff_block.norm.bias": r(d),
        "blocks.0.ff_block.mlp.0.weight": r(4 * d, d),
        "blocks.0.ff_block.mlp.0.bias": r(4 * d),
        "blocks.0.ff_block.mlp.3.weight": r(d, 4 * d),
        "blocks.0.ff_block.mlp.3.bias": r(d),
        "blocks.0.ff_block.adaLN_modulation.1.weight": r(3 * d, d),
        "blocks.0.ff_block.adaLN_modulation.1.bias": r(3 * d),
        "final_layer.norm_final.weight": r(d),
        "final_layer.norm_final.bias": r(d),
        "final_layer.linear.weight": r(4 * 4 * C, d),
        "final_layer.linear.bias": r(4 * 4 * C),
        "final_layer.adaLN_modulation.1.weight": r(2 * d, d),
        "final_layer.adaLN_modulation.1.bias": r(2 * d),
    }
    params = convert_torch_state_dict(sd, "dim")

    ref_flat = {
        "/".join(str(getattr(q, "key", q)) for q in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(ref_params)[0]
    }
    got_flat = {
        "/".join(str(getattr(q, "key", q)) for q in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    assert set(got_flat) == set(ref_flat)
    for key in ref_flat:
        assert got_flat[key].shape == ref_flat[key].shape, key
    # spot-check the in_proj split + transposes
    np.testing.assert_array_equal(
        got_flat["DiMBlock_0/MambaBlock_0/Mamba_0/in_proj_x/kernel"],
        sd["blocks.0.mamba_block.mamba.in_proj.weight"][:d_inner].T,
    )
    np.testing.assert_array_equal(
        got_flat["DiMBlock_0/MambaBlock_0/Mamba_0/in_proj_z/kernel"],
        sd["blocks.0.mamba_block.mamba.in_proj.weight"][d_inner:].T,
    )
    np.testing.assert_array_equal(
        got_flat["DiMBlock_0/MambaBlock_0/Mamba_0/conv/kernel"],
        sd["blocks.0.mamba_block.mamba.conv1d.weight"].transpose(2, 1, 0),
    )
    # the converted tree must run
    out = DiM(**kw).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.zeros((1, H, W, C)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    assert out.shape == (1, H, W, C)


@needs_reference
def test_reference_checkpoint_end_to_end(tmp_path):
    """A reference-trainer torch.save checkpoint loads through our
    checkpoint loader (.pth routing) and drives inference via the standard
    factory path — the migration UX."""
    sys.path.insert(0, str(REFERENCE))
    import torch
    from models.unet import UNet as RefUNet

    from diffusion_models_collection_tpu.factory import (
        get_diffusion,
        load_model_for_inference,
    )
    from diffusion_models_collection_tpu.utils.checkpoint import load_checkpoint

    kw = dict(image_size=(16, 16), in_channels=3, model_channels=16,
              out_channels=3, num_res_blocks=1, attention_resolutions=(8,),
              channel_mult=(1, 2), num_classes=10)
    tm = RefUNet(**kw)
    config = {
        "model_type": "unet",
        "model_params": {k: v for k, v in kw.items() if k != "num_classes"},
        "image_size": (16, 16),
        "conditional": True,
        "num_classes": 10,
        "num_timesteps": 10,
        "beta_start": 1e-4,
        "beta_end": 0.02,
        "beta_schedule": "linear",
        "num_inference_steps": 5,
        "ddim_eta": 0.0,
    }
    ckpt_path = tmp_path / "best_model.pth"
    torch.save(
        {
            "epoch": 7,
            "model_state_dict": tm.state_dict(),
            "optimizer_state_dict": {},
            "best_loss": 0.123,
            "config": config,
            "ema_model_state_dict": tm.state_dict(),
        },
        ckpt_path,
    )

    payload = load_checkpoint(ckpt_path)
    assert payload["epoch"] == 7
    assert payload["config"]["model_type"] == "unet"
    model, params = load_model_for_inference(payload, payload["config"],
                                             use_ema=True)
    diffusion = get_diffusion(payload["config"], sampling_method="ddim")

    def model_fn(x, t, y):
        return model.apply({"params": params}, x, t, y, train=False)

    samples = diffusion.sample_with_cfg(
        jax.tree_util.Partial(model_fn), (2, 16, 16, 3),
        jnp.array([1, 2], jnp.int32), jax.random.PRNGKey(0), cfg_scale=1.5,
    )
    assert samples.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(samples)).all()


@needs_reference
def test_ddim_trajectory_cross_framework_parity():
    """End-to-end sampler parity: identical weights (via the importer) +
    identical initial noise -> the full DDIM-eta0 trajectory matches the
    torch reference step-for-step (deterministic, no per-step noise). This
    is the SURVEY §7 'fixed-seed parity' goal, achieved with the sampler's
    init_noise injection hook."""
    sys.path.insert(0, str(REFERENCE))
    import torch
    from diffusion.ddim import DDIM as RefDDIM
    from models.unet import UNet as RefUNet

    from diffusion_models_collection_tpu.diffusion import DDIM

    kw = dict(image_size=(H, W), in_channels=C, model_channels=16,
              out_channels=C, num_res_blocks=1, attention_resolutions=(8,),
              channel_mult=(1, 2), num_classes=10)
    tm = RefUNet(**kw)
    tm.eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_torch_state_dict(tm.state_dict(), "unet")
    )
    ours_model = UNet(**kw)

    T, S = 100, 10
    ref_diff = RefDDIM(num_timesteps=T, num_inference_steps=S, eta=0.0,
                       device="cpu")
    our_diff = DDIM(num_timesteps=T, num_inference_steps=S, eta=0.0)

    noise = np.random.default_rng(7).standard_normal((2, C, H, W)).astype(np.float32)
    y = np.array([2, 5], np.int64)

    # reference trajectory (its own sample() loop, fixed initial noise)
    img = torch.from_numpy(noise)
    ty = torch.from_numpy(y)
    steps = ref_diff.inference_timesteps.tolist()
    with torch.no_grad():
        for i, t in enumerate(steps):
            t_b = torch.full((2,), t, dtype=torch.long)
            t_n = torch.full(
                (2,), steps[i + 1] if i < len(steps) - 1 else -1,
                dtype=torch.long,
            )
            img = ref_diff.p_sample(tm, img, t_b, t_n, ty)
    ref_out = img.numpy()

    def model_fn(x, t, yy):
        return ours_model.apply({"params": params}, x, t, yy, train=False)

    our_out = our_diff.sample(
        jax.tree_util.Partial(model_fn), (2, H, W, C), jax.random.PRNGKey(0),
        y=jnp.asarray(y, jnp.int32),
        init_noise=jnp.asarray(noise.transpose(0, 2, 3, 1)),
    )
    our_out = np.asarray(our_out).transpose(0, 3, 1, 2)
    _assert_close(ref_out, our_out, tol=5e-4)


@needs_reference
def test_ddim_cfg_trajectory_cross_framework_parity():
    """Same as above for the CFG path — exercises the fused [cond; uncond]
    batch and jnp.quantile dynamic thresholding against the reference's
    2-forward loop and torch.quantile. The reference draws its initial
    noise internally; with eta=0 that torch.randn call is its ONLY RNG use,
    so seeding torch and replaying torch.randn captures it exactly."""
    sys.path.insert(0, str(REFERENCE))
    import torch
    from diffusion.ddim import DDIM as RefDDIM
    from models.unet import UNet as RefUNet

    from diffusion_models_collection_tpu.diffusion import DDIM

    kw = dict(image_size=(H, W), in_channels=C, model_channels=16,
              out_channels=C, num_res_blocks=1, attention_resolutions=(8,),
              channel_mult=(1, 2), num_classes=10)
    tm = RefUNet(**kw)
    tm.eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_torch_state_dict(tm.state_dict(), "unet")
    )
    ours_model = UNet(**kw)

    T, S = 100, 8
    ref_diff = RefDDIM(num_timesteps=T, num_inference_steps=S, eta=0.0,
                       device="cpu")
    our_diff = DDIM(num_timesteps=T, num_inference_steps=S, eta=0.0)
    y = torch.tensor([2, 5])

    torch.manual_seed(11)
    with torch.no_grad():
        ref_out = ref_diff.sample_with_cfg(tm, (2, C, H, W), y,
                                           cfg_scale=2.0).numpy()
    torch.manual_seed(11)
    noise = torch.randn((2, C, H, W)).numpy()

    def model_fn(x, t, yy):
        return ours_model.apply({"params": params}, x, t, yy, train=False)

    our_out = our_diff.sample_with_cfg(
        jax.tree_util.Partial(model_fn), (2, H, W, C),
        jnp.asarray(y.numpy(), jnp.int32), jax.random.PRNGKey(0),
        cfg_scale=2.0,
        init_noise=jnp.asarray(noise.transpose(0, 2, 3, 1)),
    )
    our_out = np.asarray(our_out).transpose(0, 3, 1, 2)
    _assert_close(ref_out, our_out, tol=5e-4)
