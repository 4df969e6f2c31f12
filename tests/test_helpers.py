"""Helpers, config IO, tracker, profiler units."""

import json
import math
import os
from pathlib import Path

import numpy as np
import pytest

from diffusion_models_collection_tpu.utils import (
    count_parameters,
    create_gif,
    format_duration,
    load_config,
    make_grid,
    normalize_to_neg_one_to_one,
    resolve_image_size,
    save_config,
    save_image_grid,
    unnormalize_to_zero_to_one,
)
from diffusion_models_collection_tpu.utils.profiler import StepTimer
from diffusion_models_collection_tpu.utils.tracker import JsonlTracker


def test_resolve_image_size():
    assert resolve_image_size(32) == (32, 32)
    assert resolve_image_size((16, 24)) == (16, 24)
    assert resolve_image_size([8, 8]) == (8, 8)
    with pytest.raises(ValueError):
        resolve_image_size((1, 2, 3))
    with pytest.raises(ValueError):
        resolve_image_size((1.5, 2))


def test_normalize_roundtrip():
    x = np.linspace(0, 1, 11)
    np.testing.assert_allclose(
        unnormalize_to_zero_to_one(normalize_to_neg_one_to_one(x)), x
    )


def test_count_parameters():
    tree = {"a": np.zeros((3, 4)), "b": {"c": np.zeros(5)}}
    assert count_parameters(tree) == 17


def test_load_config_py(tmp_path):
    p = tmp_path / "cfg.py"
    p.write_text("config = {'a': 1, 'nested': {'b': [1, 2]}}\n")
    cfg = load_config(p)
    assert cfg == {"a": 1, "nested": {"b": [1, 2]}}


def test_load_config_json_and_save(tmp_path):
    p = tmp_path / "cfg.json"
    save_config({"x": 2, "size": (3, 4)}, p)
    cfg = load_config(p)
    assert cfg["x"] == 2


def test_load_config_yaml(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("model_type: unet\ntraining:\n  lr: 0.0002\n  epochs: 3\n")
    cfg = load_config(p)
    assert cfg["model_type"] == "unet"
    assert cfg["training"]["lr"] == 2e-4
    assert cfg["training"]["epochs"] == 3


def test_make_grid_layout():
    imgs = np.ones((4, 2, 2, 3), dtype=np.float32)
    grid = make_grid(imgs, nrow=2, padding=1)
    # 2 rows x 2 cols of 2x2 with 1px padding: 2*2+3 = 7
    assert grid.shape == (7, 7, 3)


def test_save_image_grid_and_gif(tmp_path):
    imgs = np.random.default_rng(0).random((4, 8, 8, 1)).astype(np.float32)
    out = tmp_path / "grid.png"
    save_image_grid(imgs, out, nrow=2)
    assert out.exists()
    gif = tmp_path / "anim.gif"
    frames = [np.random.default_rng(i).random((8, 8, 3)) for i in range(3)]
    create_gif(frames, gif, fps=5)
    assert gif.exists()


def test_format_duration():
    assert format_duration(3725.5) == "1h 2m 5.5s"


def test_jsonl_tracker(tmp_path):
    tr = JsonlTracker(str(tmp_path), "exp")
    tr.log({"loss": 0.5}, step=1)
    tr.log_image("samples", "/tmp/x.png", step=2)
    lines = (tmp_path / "exp.metrics.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["loss"] == 0.5 and rec["step"] == 1


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        with t.step():
            pass
    s = t.summary()
    assert s["steps"] == 3
    assert s["total_s"] >= 0
    t.reset()
    assert t.summary() == {}


def test_checkpoint_load_rejects_malicious_pickle(tmp_path):
    """Default loads go through a restricted unpickler: a pickle whose
    stream names an arbitrary callable (the torch.load/pickle RCE class —
    reference torch_import risk surface) must raise, not execute."""
    import pickle

    from diffusion_models_collection_tpu.utils.checkpoint import (
        load_checkpoint,
    )

    marker = tmp_path / "pwned"

    class Evil:
        def __reduce__(self):
            return (os.system, (f"echo pwned > {marker}",))

    bad = tmp_path / "bad.ckpt"
    bad.write_bytes(pickle.dumps({"model_state_dict": Evil()}))
    with pytest.raises(pickle.UnpicklingError, match="disallowed global"):
        load_checkpoint(bad)
    assert not marker.exists()  # the payload never executed
    # the explicit opt-out still works for trusted foreign pickles
    assert "model_state_dict" in load_checkpoint(bad, allow_unsafe=True)
    assert marker.exists()  # ...and is a real trust decision


def test_checkpoint_roundtrip_with_optax_state(tmp_path):
    """A real trainer-shaped payload (numpy trees + nested optax namedtuple
    state) round-trips through the RESTRICTED loader — the allowlist covers
    everything our own save path emits."""
    import jax.numpy as jnp
    import optax

    from diffusion_models_collection_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    params = {"dense": {"kernel": jnp.ones((2, 3)), "bias": jnp.zeros(3)}}
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    tx = optax.MultiSteps(tx, every_k_schedule=2)
    opt_state = tx.init(params)
    save_checkpoint(
        tmp_path / "m.ckpt", epoch=1, params=params, opt_state=opt_state,
        best_loss=0.5, config={"model_type": "unet"}, ema_params=params,
    )
    payload = load_checkpoint(tmp_path / "m.ckpt")
    assert payload["epoch"] == 1
    np.testing.assert_allclose(
        payload["model_state_dict"]["dense"]["kernel"], np.ones((2, 3))
    )
    restored = payload["optimizer_state_dict"]
    assert type(restored).__name__ == type(opt_state).__name__


def test_orbax_checkpoint_roundtrip(tmp_path):
    from diffusion_models_collection_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    params = {"dense": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    save_checkpoint(
        tmp_path / "model.ckpt", epoch=3, params=params,
        opt_state={"count": np.int32(5)}, best_loss=0.25, config={"a": 1},
        ema_params=params, format="orbax",
    )
    payload = load_checkpoint(tmp_path / "model")
    assert payload["epoch"] == 3
    assert payload["config"] == {"a": 1}
    np.testing.assert_allclose(
        payload["model_state_dict"]["dense"]["kernel"],
        params["dense"]["kernel"],
    )
    assert "ema_model_state_dict" in payload


def test_checkpoint_load_accepts_frozendict_pickle(tmp_path):
    """flax FrozenDict subclasses Mapping, NOT dict — the restricted
    unpickler must still admit it (regression: round-2 review; legacy
    checkpoints saved params as FrozenDict)."""
    import pickle

    import numpy as np
    from flax.core.frozen_dict import FrozenDict

    from diffusion_models_collection_tpu.utils.checkpoint import (
        load_checkpoint,
    )

    payload = {
        "epoch": 1,
        "model_state_dict": FrozenDict(
            {"Dense_0": {"kernel": np.ones((2, 2), np.float32)}}
        ),
        "best_loss": 0.5,
        "config": {},
    }
    path = tmp_path / "legacy_frozen.ckpt"
    path.write_bytes(pickle.dumps(payload))
    loaded = load_checkpoint(path)  # restricted unpickler, no opt-out
    np.testing.assert_array_equal(
        np.asarray(loaded["model_state_dict"]["Dense_0"]["kernel"]),
        np.ones((2, 2), np.float32),
    )


def test_legacy_mamba_migration_through_frozendict():
    """migrate_legacy_params must recurse through Mapping (flax
    FrozenDict), not only dict — a FrozenDict legacy checkpoint would
    otherwise load but skip the Mamba layout migration silently
    (regression: round-2 review)."""
    import numpy as np
    from flax.core.frozen_dict import FrozenDict

    from diffusion_models_collection_tpu.utils.checkpoint import (
        migrate_legacy_params,
    )

    legacy = FrozenDict({
        "DiMBlock_0": {"MambaBlock_0": {"Mamba_0": {
            "A_log": np.zeros((4, 2), np.float32),
            "D": np.zeros((4,), np.float32),
            "Dense_0": {"kernel": np.arange(16, dtype=np.float32)
                        .reshape(2, 8)},
            "Conv_0": {"kernel": np.zeros((3, 1, 4), np.float32),
                       "bias": np.zeros((4,), np.float32)},
            "Dense_1": {"kernel": np.zeros((4, 6), np.float32)},
            "Dense_2": {"kernel": np.zeros((2, 4), np.float32),
                        "bias": np.zeros((4,), np.float32)},
            "Dense_3": {"kernel": np.zeros((4, 2), np.float32)},
        }}},
    })
    out = migrate_legacy_params(legacy)
    mamba = out["DiMBlock_0"]["MambaBlock_0"]["Mamba_0"]
    assert "in_proj_x" in mamba and "in_proj_z" in mamba
    assert "conv" in mamba and "Dense_0" not in mamba
    np.testing.assert_array_equal(
        mamba["in_proj_x"]["kernel"],
        np.arange(16, dtype=np.float32).reshape(2, 8)[:, :4],
    )
