"""Device-mesh parallelism utilities.

TPU-native replacement for the reference's NCCL/DDP stack
(utils/helpers.py:83-88, utils/trainer.py:58-61,277-281, train.py:296-328):
a `jax.sharding.Mesh` with a 'data' axis, GSPMD-sharded batches and
replicated parameters — XLA inserts the gradient all-reduce over ICI where
DDP hooked NCCL buckets, and the loss mean is computed globally under jit
where the reference issued a separate `dist.all_reduce`.
"""

from .mesh import (
    batch_sharding,
    data_parallel_mesh,
    local_batch_to_global,
    process_count,
    process_index,
    replicated_sharding,
    shard_batch,
)
from .pipeline_parallel import (
    data_stage_mesh,
    data_stage_model_mesh,
    make_pipeline_apply,
    shard_dit_params_pp,
    stack_block_params,
    unstack_block_params,
)
from .dim_sequence_parallel import (
    distributed_selective_scan,
    make_dim_sequence_parallel_apply,
)
from .sequence_parallel import (
    data_seq_mesh,
    make_sequence_parallel_apply,
)
from .fsdp import (
    fsdp_shardings,
    fsdp_spec,
    shard_state_for_fsdp,
    sharded_fraction,
)
from .expert_parallel import (
    data_expert_mesh,
    ep_shardings,
    shard_state_for_ep,
)

__all__ = [
    "data_parallel_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "local_batch_to_global",
    "process_index",
    "process_count",
    "data_stage_mesh",
    "data_stage_model_mesh",
    "make_pipeline_apply",
    "shard_dit_params_pp",
    "stack_block_params",
    "unstack_block_params",
    "data_seq_mesh",
    "make_sequence_parallel_apply",
    "make_dim_sequence_parallel_apply",
    "distributed_selective_scan",
    "fsdp_shardings",
    "fsdp_spec",
    "shard_state_for_fsdp",
    "sharded_fraction",
    "data_expert_mesh",
    "ep_shardings",
    "shard_state_for_ep",
]
