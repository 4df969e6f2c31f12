"""Checkpoint export to the reference PyTorch format (utils/torch_export.py).

Two evidence levels:
- round-trip: export(params) -> import == identity on the flax pytree
  (pure numpy, no reference needed) — proves the two converters are
  exact inverses;
- cross-framework: load the exported state dict into the ACTUAL
  reference torch module with strict=True and compare forwards — proves
  the exported key names/layouts are what the reference's
  `load_state_dict` demands (skipped without /root/reference).
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_collection_tpu.models import DiM, DiT, UNet
from diffusion_models_collection_tpu.utils.torch_export import (
    export_torch_state_dict,
    save_reference_checkpoint,
)
from diffusion_models_collection_tpu.utils.torch_import import (
    convert_torch_state_dict,
)

REFERENCE = Path("/root/reference")
needs_reference = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference repo not available"
)

B, H, W, C = 2, 16, 16, 3


def _init(model, conditional=True):
    x = jnp.zeros((1, H, W, C))
    t = jnp.zeros((1,), jnp.int32)
    y = jnp.zeros((1,), jnp.int32) if conditional else None
    params = model.init(jax.random.PRNGKey(0), x, t, y)["params"]
    # perturb: zero-init layers (adaLN, final) would hide layout bugs
    return jax.tree_util.tree_map(
        lambda p: np.asarray(
            p + 0.02 * jax.random.normal(jax.random.PRNGKey(1), p.shape,
                                         p.dtype)
        ),
        params,
    )


def _assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(la) == len(lb)
    for path, leaf in la:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(lb[path]), atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )


UNET_KW = dict(image_size=(H, W), in_channels=C, model_channels=16,
               out_channels=C, num_res_blocks=1, attention_resolutions=(8,),
               channel_mult=(1, 2))


def _config(model_type, model_params, conditional):
    return {
        "model_type": model_type,
        "model_params": dict(model_params),
        "image_size": (H, W),
        "conditional": conditional,
    }


@pytest.mark.parametrize("conditional", [True, False])
def test_unet_export_import_roundtrip(conditional):
    kw = dict(UNET_KW, num_classes=10 if conditional else None)
    params = _init(UNet(**kw), conditional)
    cfg = _config("unet", kw, conditional)
    sd = export_torch_state_dict(params, "unet", cfg)
    back = convert_torch_state_dict(sd, "unet")
    _assert_trees_equal(params, back)


def test_dit_export_import_roundtrip():
    kw = dict(img_size=(H, W), patch_size=4, in_channels=C, hidden_size=32,
              depth=2, num_heads=4, num_classes=10)
    params = _init(DiT(**kw))
    sd = export_torch_state_dict(params, "dit", _config("dit", kw, True))
    back = convert_torch_state_dict(sd, "dit")
    _assert_trees_equal(params, back)


@pytest.mark.parametrize("fallback", [False, True])
def test_dim_export_import_roundtrip(fallback):
    kw = dict(img_size=(H, W), patch_size=4, in_channels=C, hidden_size=32,
              depth=1, num_classes=10)
    if fallback:
        kw["use_attention_fallback"] = True
    params = _init(DiM(**kw))
    sd = export_torch_state_dict(params, "dim", _config("dim", kw, True))
    back = convert_torch_state_dict(sd, "dim")
    _assert_trees_equal(params, back)


def test_unet_export_rejects_mismatched_config():
    """A config that doesn't describe the params (here: missing attention)
    must fail loudly, not write a silently wrong checkpoint."""
    kw = dict(UNET_KW, num_classes=None)
    params = _init(UNet(**kw), conditional=False)
    bad = dict(kw, attention_resolutions=())
    with pytest.raises((ValueError, KeyError)):
        export_torch_state_dict(params, "unet",
                                _config("unet", bad, False))


# ---------------------------------------------------- cross-framework parity
def _run_ours(model, params, x, t, y):
    out = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t, jnp.int32),
        jnp.asarray(y, jnp.int32) if y is not None else None, train=False,
    )
    return np.asarray(out).transpose(0, 3, 1, 2)


def _run_ref_loaded(tm, sd, x, t, y):
    import torch

    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=True
    )
    assert not missing and not unexpected
    tm.eval()
    with torch.no_grad():
        out = tm(torch.from_numpy(x), torch.from_numpy(t),
                 torch.from_numpy(y) if y is not None else None)
    return out.numpy()


def _inputs():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    t = np.array([3, 7], np.int64)
    y = np.array([1, 4], np.int64)
    return x, t, y


def _assert_close(ref, ours, tol=2e-4):
    rel = np.abs(ref - ours).max() / (np.abs(ref).max() + 1e-8)
    assert rel < tol, f"max rel deviation {rel}"


@needs_reference
def test_unet_export_loads_into_reference():
    sys.path.insert(0, str(REFERENCE))
    from models.unet import UNet as RefUNet

    kw = dict(UNET_KW, num_classes=10)
    params = _init(UNet(**kw))
    sd = export_torch_state_dict(params, "unet", _config("unet", kw, True))
    x, t, y = _inputs()
    _assert_close(_run_ref_loaded(RefUNet(**kw), sd, x, t, y),
                  _run_ours(UNet(**kw), params, x, t, y))


@needs_reference
def test_dit_export_loads_into_reference():
    sys.path.insert(0, str(REFERENCE))
    from models.dit import DiT as RefDiT

    kw = dict(img_size=(H, W), patch_size=4, in_channels=C, hidden_size=32,
              depth=2, num_heads=4, num_classes=10)
    params = _init(DiT(**kw, dropout=0.0))
    sd = export_torch_state_dict(params, "dit", _config("dit", kw, True))
    x, t, y = _inputs()
    _assert_close(_run_ref_loaded(RefDiT(**kw), sd, x, t, y),
                  _run_ours(DiT(**kw, dropout=0.0), params, x, t, y))


@needs_reference
def test_dim_export_loads_into_reference():
    sys.path.insert(0, str(REFERENCE))
    import models.dim as ref_dim

    assert not ref_dim.MAMBA_AVAILABLE
    kw = dict(img_size=(H, W), patch_size=4, in_channels=C, hidden_size=32,
              depth=1, num_classes=10)
    params = _init(DiM(**kw, dropout=0.0, use_attention_fallback=True))
    sd = export_torch_state_dict(params, "dim", _config("dim", kw, True))
    x, t, y = _inputs()
    _assert_close(_run_ref_loaded(ref_dim.DiM(**kw), sd, x, t, y),
                  _run_ours(DiM(**kw, dropout=0.0, use_attention_fallback=True),
                            params, x, t, y))


def test_export_tool_subprocess(tmp_path):
    """tools/export_torch.py end to end: our .ckpt in, reference .pth out,
    reimportable."""
    import subprocess
    import sys as _sys

    from diffusion_models_collection_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    kw = dict(img_size=(H, W), patch_size=4, in_channels=C, hidden_size=32,
              depth=1, num_heads=4, num_classes=10)
    params = _init(DiT(**kw))
    config = _config("dit", kw, True)
    ours = tmp_path / "model.ckpt"
    save_checkpoint(ours, epoch=3, params=params, opt_state={},
                    best_loss=0.5, config=config)
    out = tmp_path / "model.pth"
    repo = Path(__file__).resolve().parents[1]
    res = subprocess.run(
        [_sys.executable, str(repo / "tools" / "export_torch.py"),
         "--checkpoint", str(ours), "--output", str(out)],
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr
    payload = load_checkpoint(out)
    assert payload["epoch"] == 3
    _assert_trees_equal(params, payload["model_state_dict"])


def test_export_cli_full_cycle(tmp_path):
    """ours -> torch .pth -> ours again through the real files: the tool's
    save_reference_checkpoint output reimports via load_checkpoint."""
    from diffusion_models_collection_tpu.utils.checkpoint import (
        load_checkpoint,
    )

    kw = dict(img_size=(H, W), patch_size=4, in_channels=C, hidden_size=32,
              depth=1, num_heads=4, num_classes=10)
    params = _init(DiT(**kw))
    config = dict(_config("dit", kw, True), num_classes=10)
    out = tmp_path / "exported.pth"
    save_reference_checkpoint(out, params=params, config=config,
                              ema_params=params, epoch=7, best_loss=0.25)
    payload = load_checkpoint(out)
    assert payload["epoch"] == 7
    assert abs(payload["best_loss"] - 0.25) < 1e-9
    _assert_trees_equal(params, payload["model_state_dict"])
    _assert_trees_equal(params, payload["ema_model_state_dict"])
