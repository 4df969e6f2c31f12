"""FSDP / ZeRO-style state sharding over the data-parallel mesh axis.

The reference has no analog (SURVEY.md §2.3 lists DDP only — every rank
holds a full model + optimizer copy). This is the TPU-idiomatic version
of ZeRO-3/FSDP: parameters, Adam moments and the EMA tree are *stored*
sharded over the existing 'data' mesh axis, cutting per-device state
memory by the DP degree. There is no wrapper module and no hand-written
communication schedule — each leaf gets a `NamedSharding` that splits
its largest divisible dimension over 'data', and XLA's SPMD partitioner
derives the rest: parameters are all-gathered over ICI right before use
in the forward/backward, gradients are reduce-scattered to the shard
that owns them, and the optimizer update + EMA lerp run on 1/N of every
tensor per device. That is exactly the ZeRO dataflow, produced entirely
by sharding propagation.

The sharding rule is a pure function of the leaf's *shape*, so params,
Adam mu/nu and EMA (all shaped like the param) land on identical
shardings with no tree bookkeeping, and checkpoint loads re-place
deterministically. Leaves smaller than `min_size` elements (norm scales,
biases, embedding tables of tiny models) stay replicated — sharding them
would trade a few KB of HBM for extra collectives.

Checkpoints are unaffected: save gathers to host (np.asarray on a
fully-addressable sharded array), so FSDP and non-FSDP runs interchange
files byte-for-byte.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

# Below this many elements a leaf stays replicated: the all-gather +
# reduce-scatter latency for a tiny tensor exceeds the memory it saves.
DEFAULT_MIN_SIZE = 2 ** 15


def fsdp_spec(shape, n_shards: int, min_size: int = DEFAULT_MIN_SIZE,
              axis_name: str = DATA_AXIS) -> P:
    """PartitionSpec for one leaf: shard the largest dimension divisible
    by `n_shards`; replicate scalars, small leaves and indivisible shapes.

    Ties break toward the LAST dimension (features/lanes — keeps the
    sublane-major dims intact for the TPU tiled layout). This is the
    empty-spec case of `extend_spec_with_data` (one rule, two entry
    points — hybrid FSDP x TP extends a Megatron spec the same way).
    """
    return extend_spec_with_data(shape, P(), n_shards, min_size, axis_name)


def extend_spec_with_data(shape, spec: P, n_shards: int,
                          min_size: int = DEFAULT_MIN_SIZE,
                          axis_name: str = DATA_AXIS) -> P:
    """Hybrid ZeRO x model-parallel: add `axis_name` sharding to the
    largest still-unsharded dimension of an existing PartitionSpec (e.g.
    a Megatron TP spec), so state memory also divides by the DP degree.
    Returns `spec` unchanged when no dimension qualifies."""
    if n_shards <= 1 or not shape or int(np.prod(shape)) < min_size:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best = None
    for dim, extent in enumerate(shape):
        if entries[dim] is None and extent % n_shards == 0 \
                and extent >= n_shards:
            if best is None or extent >= shape[best]:
                best = dim
    if best is None:
        return spec
    entries[best] = axis_name
    return P(*entries)


def fsdp_shardings(mesh: Mesh, tree,
                   min_size: int = DEFAULT_MIN_SIZE):
    """A pytree of NamedShardings mirroring `tree` (shape-based rule)."""
    n = mesh.shape[DATA_AXIS]

    def one(x):
        shape = getattr(x, "shape", ())
        return NamedSharding(mesh, fsdp_spec(shape, n, min_size))

    return jax.tree_util.tree_map(one, tree)


def shard_state_for_fsdp(mesh: Mesh, state,
                         min_size: int = DEFAULT_MIN_SIZE):
    """Place a TrainState (params/opt_state/ema) sharded per `fsdp_spec`."""
    shardings = fsdp_shardings(mesh, state, min_size)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, shardings
    )


def place_opt_state_like_params(opt_state, params, param_shardings,
                                replicated: NamedSharding):
    """Place an optax state tree: subtrees whose structure equals the
    param tree's (Adam mu/nu, weight-decay masks, ...) inherit the param
    shardings leaf-for-leaf; every other leaf (step counts, scalars)
    replicates. This is how moment memory joins the ZeRO sharding without
    any per-optimizer bookkeeping."""
    params_struct = jax.tree_util.tree_structure(params)

    def is_params_like(node):
        try:
            return jax.tree_util.tree_structure(node) == params_struct
        except Exception:
            return False

    def place(node):
        if is_params_like(node):
            return jax.tree_util.tree_map(
                lambda x, s: jax.device_put(x, s), node, param_shardings
            )
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated), node
        )

    return jax.tree_util.tree_map(place, opt_state, is_leaf=is_params_like)


def sharded_fraction(tree, axis: Optional[str] = None) -> float:
    """Fraction of `tree`'s elements living on sharded (non-replicated)
    arrays — diagnostics for tests/logs. With `axis` set, counts only
    leaves sharded over THAT mesh axis (e.g. axis='data' reports true
    ZeRO coverage in a hybrid FSDP x TP run, where 'model'-only leaves
    would otherwise inflate the number)."""
    total = 0
    sharded = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        n = int(np.prod(getattr(leaf, "shape", ()) or (1,)))
        total += n
        sharding = getattr(leaf, "sharding", None)
        if not isinstance(sharding, NamedSharding):
            continue
        names = {
            s for entry in sharding.spec if entry is not None
            for s in (entry if isinstance(entry, tuple) else (entry,))
        }
        if (axis in names) if axis is not None else bool(names):
            sharded += n
    return sharded / total if total else 0.0
