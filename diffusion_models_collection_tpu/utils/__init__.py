"""Runtime utilities (parity: reference utils/__init__.py)."""

from .checkpoint import load_checkpoint, save_checkpoint
from .ema import ema_update
from .helpers import (
    count_parameters,
    create_gif,
    format_duration,
    load_config,
    make_grid,
    normalize_to_neg_one_to_one,
    resolve_image_size,
    save_config,
    save_image,
    save_image_grid,
    set_seed,
    unnormalize_to_zero_to_one,
)
from .lr_schedules import build_lr_schedule
from .tracker import JsonlTracker, MultiTracker, NullTracker, build_tracker
from .trainer import DiffusionTrainer, TrainState, build_optimizer
from .vae_trainer import VAETrainer

__all__ = [
    "DiffusionTrainer",
    "VAETrainer",
    "TrainState",
    "build_optimizer",
    "build_lr_schedule",
    "ema_update",
    "set_seed",
    "resolve_image_size",
    "count_parameters",
    "load_config",
    "save_config",
    "normalize_to_neg_one_to_one",
    "unnormalize_to_zero_to_one",
    "create_gif",
    "make_grid",
    "save_image",
    "save_image_grid",
    "format_duration",
    "save_checkpoint",
    "load_checkpoint",
    "JsonlTracker",
    "MultiTracker",
    "NullTracker",
    "build_tracker",
]
