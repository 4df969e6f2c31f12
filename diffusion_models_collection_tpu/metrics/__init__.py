"""Evaluation metrics (parity: reference metrics/__init__.py — which
declares __all__ without importing; we import properly, fixing the
reference's latent bug noted in SURVEY.md §2)."""

from .fid import FIDScore
from .inception import InceptionFeatures, InceptionV3
from .inception_score import InceptionScore
from .kid import KIDScore
from .lpips_score import LPIPSScore, calculate_all_metrics
from .precision_recall import PrecisionRecall
from .swd import SWDScore, compute_swd

__all__ = [
    "FIDScore",
    "InceptionScore",
    "KIDScore",
    "LPIPSScore",
    "PrecisionRecall",
    "SWDScore",
    "compute_swd",
    "calculate_all_metrics",
    "InceptionFeatures",
    "InceptionV3",
]
