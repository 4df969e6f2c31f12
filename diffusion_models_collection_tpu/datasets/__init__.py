"""Datasets (parity: reference datasets/__init__.py:6-9)."""

from .base_dataset import DiffusionDataset
from .custom_dataset import CustomImageDataset
from .loader import DataLoader
from .transforms import ImageTransform, flip_batch

__all__ = [
    "DiffusionDataset",
    "CustomImageDataset",
    "DataLoader",
    "ImageTransform",
    "flip_batch",
]
