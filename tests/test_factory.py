"""Factory composition semantics (parity: reference train.py:27-128)."""

import pytest

from diffusion_models_collection_tpu.diffusion import DDIM, DDPM
from diffusion_models_collection_tpu.factory import (
    get_dataloader,
    get_dataset,
    get_diffusion,
    get_model,
)
from diffusion_models_collection_tpu.models import DiM, DiT, UNet

BASE = {
    "image_size": (16, 16),
    "conditional": True,
    "num_classes": 7,
    "num_timesteps": 10,
    "beta_start": 1e-4,
    "beta_end": 0.02,
    "beta_schedule": "linear",
    "num_inference_steps": 4,
    "ddim_eta": 0.5,
    "batch_size": 8,
    "dataset": "synthetic",
    "data_root": "./data",
}


def test_get_model_unet_injects_size_and_classes():
    cfg = {**BASE, "model_type": "unet",
           "model_params": {"in_channels": 3, "model_channels": 8,
                            "out_channels": 3, "num_res_blocks": 1,
                            "channel_mult": [1, 2],
                            "attention_resolutions": [8]}}
    model = get_model(cfg)
    assert isinstance(model, UNet)
    assert model.image_size == (16, 16)
    assert model.num_classes == 7
    assert model.channel_mult == (1, 2)  # lists converted to tuples


def test_get_model_dit_dim_img_size():
    for mt, cls in [("dit", DiT), ("dim", DiM)]:
        cfg = {**BASE, "model_type": mt, "conditional": False,
               "model_params": {"in_channels": 3, "hidden_size": 16,
                                "depth": 1, "patch_size": 4,
                                **({"num_heads": 2} if mt == "dit" else {})}}
        model = get_model(cfg)
        assert isinstance(model, cls)
        assert tuple(model.img_size) == (16, 16)
        assert model.num_classes is None


def test_get_model_unknown_type():
    # NOTE: 'vae' used to be the unknown probe here; it became a real
    # model type with latent diffusion, so probe something nonexistent
    with pytest.raises(ValueError):
        get_model({**BASE, "model_type": "resnet", "model_params": {}})


def test_get_diffusion_training_vs_sampling():
    d = get_diffusion(BASE)  # training: always DDPM
    assert isinstance(d, DDPM)
    d2 = get_diffusion(BASE, sampling_method="ddim")
    assert isinstance(d2, DDIM)
    assert d2.num_inference_steps == 4
    assert d2.eta == 0.5


def test_get_dataset_and_loader():
    ds = get_dataset({**BASE, "model_params": {"in_channels": 3}}, train=True)
    assert len(ds) > 0
    loader = get_dataloader({**BASE}, ds, train=True, seed=0)
    imgs, labels = next(iter(loader))
    assert imgs.shape == (8, 16, 16, 3)
    assert labels is not None
    assert labels.max() < 7


def test_get_model_mixed_precision():
    import jax.numpy as jnp

    base = {**BASE, "model_type": "dit",
            "model_params": {"hidden_size": 32, "depth": 1, "num_heads": 2,
                             "patch_size": 4}}
    m = get_model({**base, "mixed_precision": "bf16"})
    assert m.dtype == jnp.bfloat16
    m2 = get_model(base)
    assert m2.dtype is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        get_model({**base, "mixed_precision": "fp8"})
