"""TPU compute ops: Pallas kernels with XLA reference fallbacks.

Each op has a pure-XLA implementation (always available, used on CPU and as
the numerical reference in tests) and, where profitable, a Pallas TPU kernel
selected at dispatch time. Kernels land behind `use_pallas` flags so every
kernel has a parity test against its fallback (SURVEY.md §7.8).
"""

from .attention import dot_product_attention, multihead_attention
from .fused_norm import group_norm_silu
from .selective_scan import selective_scan
from .dispatch import use_pallas, pallas_enabled

__all__ = [
    "dot_product_attention",
    "multihead_attention",
    "selective_scan",
    "group_norm_silu",
    "use_pallas",
    "pallas_enabled",
]
