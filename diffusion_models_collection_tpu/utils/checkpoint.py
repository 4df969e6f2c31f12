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

import pickle
from pathlib import Path
from typing import Any, Dict, Optional, Union

import jax
import numpy as np


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
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with tmp.open("wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)  # atomic on POSIX: no torn checkpoints on crash


def load_checkpoint(path: Union[str, Path]) -> Dict[str, Any]:
    with Path(path).open("rb") as f:
        return pickle.load(f)
