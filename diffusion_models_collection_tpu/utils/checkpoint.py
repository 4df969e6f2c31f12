"""Checkpoint save/load (parity target: reference utils/trainer.py:120-154,
328-365 and the config-embedded-in-checkpoint contract at sample.py:105).

A checkpoint is one file holding a dict with the reference's logical keys:

    {epoch, model_state_dict, optimizer_state_dict, best_loss, config,
     [ema_model_state_dict]}

Arrays are stored as host numpy inside a pickle (we own both ends of the
format; optax states are importable namedtuples so they round-trip).
Filenames mirror the reference: current_model.ckpt every epoch,
best_model.ckpt on lowest average train loss, model_epoch_{N:04d}.ckpt
every `save_interval` epochs.
"""

from __future__ import annotations

import importlib
import os
import pickle
from pathlib import Path
from typing import Any, Dict, Optional, Union

import jax
import numpy as np

# --- restricted unpickling ---------------------------------------------------
# `pickle.load` executes arbitrary callables named in the stream; serve.py
# and the CLIs load user-supplied checkpoint paths, so the default loader
# only reconstructs an allowlisted vocabulary: containers, numpy arrays,
# and namedtuple/dict-like state classes from optax/flax/jax. Anything
# else (os.system, subprocess, ...) raises UnpicklingError. Foreign
# pickles that genuinely need more can opt out via allow_unsafe=True or
# DMC_TPU_UNSAFE_PICKLE=1 — an explicit trust decision, mirroring the
# reference's torch.load(weights_only=False) risk surface.

_SAFE_BUILTINS = {
    "dict", "list", "tuple", "set", "frozenset", "complex", "slice",
    "bytearray", "range",
}
_SAFE_NUMPY = {"_reconstruct", "ndarray", "dtype", "scalar", "_frombuffer"}
_NUMPY_MODULES = {
    "numpy", "numpy.core.multiarray", "numpy._core.multiarray",
    "numpy.dtypes", "numpy.core.numeric", "numpy._core.numeric",
}
_STATE_ROOTS = ("optax", "flax", "jax", "ml_dtypes")


class _RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module, name):  # noqa: D102
        if module == "builtins" and name in _SAFE_BUILTINS:
            return getattr(__import__("builtins"), name)
        if module == "collections" and name in ("OrderedDict", "defaultdict"):
            import collections

            return getattr(collections, name)
        if module in _NUMPY_MODULES and (
            name in _SAFE_NUMPY or name.endswith("DType")
        ):
            return getattr(importlib.import_module(module), name)
        if module.split(".")[0] in _STATE_ROOTS:
            obj = getattr(importlib.import_module(module), name)
            # classes only, and only value-like ones: namedtuple states
            # (optax), scalar dtypes (ml_dtypes.bfloat16). flax FrozenDict
            # subclasses Mapping, NOT dict — allowed by exact name rather
            # than widening to every Mapping in these namespaces.
            if isinstance(obj, type) and issubclass(
                obj, (tuple, dict, np.generic)
            ):
                return obj
            if (module, name) == ("flax.core.frozen_dict", "FrozenDict"):
                return obj
        raise pickle.UnpicklingError(
            f"checkpoint references disallowed global {module}.{name}; "
            "pass allow_unsafe=True (or DMC_TPU_UNSAFE_PICKLE=1) only for "
            "checkpoints you trust"
        )


def _pickle_load(f, allow_unsafe: bool = False):
    if allow_unsafe or os.environ.get("DMC_TPU_UNSAFE_PICKLE") == "1":
        return pickle.load(f)
    return _RestrictedUnpickler(f).load()


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(
    path: Union[str, Path],
    *,
    epoch: int,
    params,
    opt_state,
    best_loss: float,
    config: dict,
    ema_params=None,
    extra: Optional[Dict[str, Any]] = None,
    format: str = "pickle",
) -> None:
    payload = {
        "epoch": int(epoch),
        "model_state_dict": _to_host(params),
        "optimizer_state_dict": _to_host(opt_state),
        "best_loss": float(best_loss),
        "config": config,
    }
    if ema_params is not None:
        payload["ema_model_state_dict"] = _to_host(ema_params)
    if extra:
        payload.update(extra)
    if format == "orbax":
        _save_orbax(Path(path), payload)
        return
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with tmp.open("wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)  # atomic on POSIX: no torn checkpoints on crash


def load_checkpoint(
    path: Union[str, Path], allow_unsafe: bool = False
) -> Dict[str, Any]:
    """Load any supported format: our pickle file (restricted unpickler by
    default — see above), an orbax directory, or a reference PyTorch
    checkpoint (.pth/.pt — converted on the fly, see utils/torch_import.py).
    Legacy param layouts are migrated in place."""
    path = Path(path)
    if path.is_dir():
        payload = _load_orbax(path, allow_unsafe=allow_unsafe)
    elif path.suffix.lower() in (".pth", ".pt"):
        from .torch_import import load_reference_checkpoint

        payload = load_reference_checkpoint(path)
    else:
        with path.open("rb") as f:
            payload = _pickle_load(f, allow_unsafe)
    for key in ("model_state_dict", "ema_model_state_dict"):
        if payload.get(key) is not None:
            payload[key] = migrate_legacy_params(payload[key])
    return payload


def migrate_legacy_params(params):
    """Upgrade param pytrees saved before the Mamba projections were
    named (auto-numbered Dense_0..Dense_3 / Conv_0 with a FUSED in_proj).

    Old layout inside each `.../Mamba_0`: Dense_0 = fused in_proj kernel
    (d_model, 2*d_inner), Conv_0 = depthwise conv, Dense_1 = x_dbl,
    Dense_2 = dt_proj, Dense_3 = out_proj. New layout splits in_proj into
    `in_proj_x`/`in_proj_z` column halves (TP-friendly; the recurrence is
    unchanged, so migrated checkpoints are numerically identical). Returns
    the input unchanged when no legacy Mamba blocks are present.
    """

    import collections.abc

    def fix(node):
        # Mapping, not dict: legacy checkpoints saved params as flax
        # FrozenDict (a Mapping subclass) — recursing only into dicts
        # would silently skip migration and normalization for them
        if not isinstance(node, collections.abc.Mapping):
            return node
        node = {k: fix(v) for k, v in node.items()}
        if "A_log" in node and "Dense_0" in node and "conv" not in node:
            fused = np.asarray(node.pop("Dense_0")["kernel"])
            d_inner = fused.shape[1] // 2
            node["in_proj_x"] = {"kernel": fused[:, :d_inner]}
            node["in_proj_z"] = {"kernel": fused[:, d_inner:]}
            node["conv"] = node.pop("Conv_0")
            node["x_dbl"] = node.pop("Dense_1")
            node["dt_proj"] = node.pop("Dense_2")
            node["out_proj"] = node.pop("Dense_3")
        return node

    return fix(params)


# --- orbax backend (config 'checkpoint_format': 'orbax') --------------------
# Directory layout: <path>/arrays (orbax PyTree of model/ema params) and
# <path>/meta.pkl (epoch/best_loss/config/optimizer state). Array state
# goes through orbax (the idiomatic sharded-TPU checkpoint path); the
# optimizer pytree keeps pickle because optax states mix namedtuples in
# ways orbax's strict tree restore handles poorly without type metadata.

def _save_orbax(path: Path, payload: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    path = path.with_suffix("")  # directory, drop .ckpt
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {"model_state_dict": payload["model_state_dict"]}
    if "ema_model_state_dict" in payload:
        arrays["ema_model_state_dict"] = payload["ema_model_state_dict"]
    ckptr = ocp.StandardCheckpointer()
    arrays_dir = path / "arrays"
    if arrays_dir.exists():
        import shutil

        shutil.rmtree(arrays_dir)
    ckptr.save(arrays_dir.resolve(), arrays)
    ckptr.wait_until_finished()
    meta = {k: v for k, v in payload.items()
            if k not in ("model_state_dict", "ema_model_state_dict")}
    with (path / "meta.pkl").open("wb") as f:
        pickle.dump(meta, f, protocol=pickle.HIGHEST_PROTOCOL)


def _load_orbax(path: Path, allow_unsafe: bool = False) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    arrays = ckptr.restore((path / "arrays").resolve())
    with (path / "meta.pkl").open("rb") as f:
        payload = _pickle_load(f, allow_unsafe)
    payload.update(arrays)
    return payload
