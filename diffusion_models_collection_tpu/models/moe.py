"""Mixture-of-Experts MLP for the DiT backbone (extension; no reference
counterpart — SURVEY.md §2.3 notes the reference has no MoE/expert
dimension, so this goes beyond it, in the DiT-MoE style: the dense MLP in
each transformer block is replaced by a routed bank of expert MLPs).

TPU-first design (GShard/Switch, the canonical TPU MoE formulation):

* Expert weights live STACKED with a leading expert axis — w1 (E, d, h),
  w2 (E, h, d) — so the whole bank is two einsums on the MXU and
  expert parallelism is pure GSPMD metadata: shard the leading axis over
  an 'expert' mesh axis (parallel/expert_parallel.py) and XLA inserts the
  token all-to-alls around the expert computation.
* Top-k routing with per-group capacity: tokens are grouped by batch row
  (group size = sequence length), each expert takes at most
  C = ceil(k * S * capacity_factor / E) tokens per group, overflow tokens
  fall through with a zero MoE contribution (the residual connection in
  DiTBlock carries them). Dispatch/combine are one-hot einsum tensors of
  shape (B, S, E, C) — dense, static-shaped, MXU-friendly; no sorting,
  no dynamic shapes, nothing XLA cannot tile.
* The load-balancing auxiliary loss (Switch eq. 4: E * sum_e f_e * P_e,
  == 1 at perfect balance) is sown into the 'losses' collection; the
  trainer adds `moe_aux_weight *` its mean when the collection is mutable
  and silently drops it otherwise (flax sow semantics), so eval/sampling
  paths need no change.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import initializers as init

Dtype = Any


def moe_capacity(seq_len: int, num_experts: int, top_k: int,
                 capacity_factor: float) -> int:
    """Per-group (per batch row) expert capacity, >= 1."""
    return max(1, math.ceil(top_k * seq_len * capacity_factor / num_experts))


class MoeMlp(nn.Module):
    """Routed expert MLPs replacing `dit.Mlp` (same GELU-exact body).

    Contract matches `Mlp`: (B, S, d) -> (B, S, d); extra behavior is the
    sown scalar `losses/load_balance`.
    """

    hidden_dim: int
    out_dim: int
    num_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25
    dropout: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, S, d = x.shape
        E, k = self.num_experts, self.top_k
        C = moe_capacity(S, E, k, self.capacity_factor)

        # --- router (fp32: routing decisions must not flip under bf16) ---
        router_logits = nn.Dense(
            E, dtype=jnp.float32, name="router",
            kernel_init=init.normal_002, bias_init=init.zeros,
        )(x.astype(jnp.float32))                          # (B, S, E)
        probs = jax.nn.softmax(router_logits, axis=-1)
        gate_vals, expert_idx = jax.lax.top_k(probs, k)   # (B, S, k)

        # --- capacity assignment -----------------------------------------
        # One-hot over experts per routing slot; position-in-expert via a
        # cumulative count down the token axis (slot 0 of every token is
        # placed before slot 1 of any token, matching GShard's priority).
        slot_onehot = jax.nn.one_hot(expert_idx, E, dtype=jnp.float32)
        # (B, k, S, E): scan order is slot-major then token-major
        so = jnp.swapaxes(slot_onehot, 1, 2)
        flat = so.reshape(B, k * S, E)
        position = jnp.cumsum(flat, axis=1) - flat        # tokens ahead of me
        position = position.reshape(B, k, S, E)
        position = jnp.swapaxes(position, 1, 2)           # (B, S, k, E)
        pos_in_expert = jnp.sum(position * slot_onehot, axis=-1)  # (B, S, k)
        keep = (pos_in_expert < C).astype(jnp.float32)

        # --- aux load-balance loss (Switch eq. 4, over ALL routed slots) --
        # f_e: fraction of token-slots whose top-k choice hits expert e
        # (pre-capacity, so the loss sees true router behavior);
        # P_e: mean router probability for e.
        f = jnp.mean(jnp.sum(slot_onehot, axis=2), axis=(0, 1)) / k  # (E,)
        p_mean = jnp.mean(probs, axis=(0, 1))                        # (E,)
        self.sow("losses", "load_balance", E * jnp.sum(f * p_mean))

        # --- dispatch / combine one-hots ----------------------------------
        pos_onehot = jax.nn.one_hot(
            pos_in_expert.astype(jnp.int32), C, dtype=jnp.float32
        )
        # (B, S, k, E, C): 1 where token (b,s) occupies slot c of expert e
        dispatch_k = (
            (slot_onehot * keep[..., None])[..., None]
            * pos_onehot[..., None, :]
        )
        dispatch = jnp.sum(dispatch_k, axis=2)                   # (B, S, E, C)
        combine = jnp.sum(
            dispatch_k * gate_vals[..., None, None], axis=2
        )                                                        # (B, S, E, C)

        # --- expert computation (stacked einsums; EP shards axis 0) -------
        w1 = self.param("w1", init.expert_xavier, (E, d, self.hidden_dim))
        b1 = self.param("b1", init.zeros, (E, self.hidden_dim))
        w2 = self.param("w2", init.expert_xavier, (E, self.hidden_dim, d))
        b2 = self.param("b2", init.zeros, (E, d))

        # Under expert parallelism the trainer traces the step inside
        # `jax.set_mesh(mesh)` (utils/trainer.py), so an ambient mesh with
        # an 'expert' axis means: pin the expert-major tensors to
        # ('expert', 'data') right at the dispatch/combine boundaries.
        # Without the pins GSPMD resolves the layout flip batch-sharded ->
        # expert-sharded by full rematerialization (observed
        # "Involuntary full rematerialization" spmd_partitioner warnings);
        # with them the boundary lowers to the intended token all-to-all.
        am = jax.sharding.get_abstract_mesh()
        ep_spec = None
        if not am.empty and "expert" in am.axis_names:
            from jax.sharding import PartitionSpec as P

            ep_spec = P("expert", "data", None, None)

        def _pin(t):
            if ep_spec is None:
                return t
            return jax.lax.with_sharding_constraint(t, ep_spec)

        cdt = self.dtype or x.dtype
        expert_in = _pin(jnp.einsum(
            "bsec,bsd->ebcd", dispatch.astype(cdt), x.astype(cdt)
        ))                                                       # (E, B, C, d)
        h = jnp.einsum("ebcd,edh->ebch", expert_in, w1.astype(cdt))
        h = h + b1.astype(cdt)[:, None, None, :]
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        out_e = jnp.einsum("ebch,ehd->ebcd", h, w2.astype(cdt))
        out_e = _pin(out_e + b2.astype(cdt)[:, None, None, :])
        out = jnp.einsum(
            "bsec,ebcd->bsd", combine.astype(cdt), out_e
        )                                                        # (B, S, d)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        if self.out_dim != d:
            raise ValueError("MoeMlp requires out_dim == model dim "
                             f"({self.out_dim} != {d})")
        return out
