"""Weight initializers matching the reference's PyTorch init distributions.

The reference relies on torch defaults for UNet (kaiming-uniform with
a=sqrt(5), i.e. U(±1/sqrt(fan_in)) for both weight and bias) and on explicit
xavier-uniform + zero-init for DiT/DiM (reference models/dit.py:227-247,
dim.py:276-298). Matching the distributions keeps training dynamics
comparable even though RNG streams differ (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.Linear / nn.Conv2d default weight init:
# kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
torch_default_kernel = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)

xavier_uniform = nn.initializers.xavier_uniform()
zeros = nn.initializers.zeros
normal_002 = nn.initializers.normal(stddev=0.02)
# Stacked expert kernels (E, fan_in, fan_out): the leading expert axis is
# a batch axis, so each expert's 2-D slice gets the same xavier bounds a
# standalone Dense kernel would (models/moe.py).
expert_xavier = nn.initializers.xavier_uniform(batch_axis=0)


def torch_default_bias(fan_in: int):
    """torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / jnp.sqrt(float(max(fan_in, 1)))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def embedding_with_null_row(key, shape, dtype=jnp.float32):
    """torch nn.Embedding default N(0,1), with row 0 (the CFG null / padding
    index) zeroed — torch's padding_idx both zero-initializes the row and
    zeroes its gradient, so it stays zero forever; we zero it at init and
    mask the lookup output (models mask `y == 0`)."""
    table = jax.random.normal(key, shape, dtype)
    return table.at[0].set(0.0)
