"""Diffusion processes (parity: reference diffusion/__init__.py:6-9)."""

from .base import (
    apply_x0_constraint,
    cfg_eps,
    diffusion_loss,
    dynamic_threshold,
    p_losses,
    predict_x0_from_eps,
    q_sample,
)
from .consistency import ConsistencyModel
from .ddim import DDIM
from .ddpm import DDPM
from .dpm_solver import DPMSolverPP
from .edm import EDM
from .flow_matching import FlowMatching
from .guidance import classifier_guided_model_fn
from .deepcache import deepcache_sample
from .pag import pag_model_fn
from .schedule import NoiseSchedule, ddim_timesteps, karras_timesteps, make_betas
from .unipc import UniPC

__all__ = [
    "DDPM",
    "DDIM",
    "DPMSolverPP",
    "ConsistencyModel",
    "UniPC",
    "EDM",
    "FlowMatching",
    "NoiseSchedule",
    "make_betas",
    "ddim_timesteps",
    "karras_timesteps",
    "q_sample",
    "p_losses",
    "diffusion_loss",
    "predict_x0_from_eps",
    "dynamic_threshold",
    "apply_x0_constraint",
    "cfg_eps",
    "classifier_guided_model_fn",
    "deepcache_sample",
    "pag_model_fn",
]
