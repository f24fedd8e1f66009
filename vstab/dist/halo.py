"""Temporal-block halo exchange (SURVEY.md §2.2 "Ring-attention analogue").

Each temporal shard needs its neighbors' boundary frames: flow at block
seams needs the next block's first frame(s); path blending needs both
sides. Implemented as `lax.ppermute` neighbor shifts around the "time"
mesh axis — structurally the ring pass of ring attention, but a single
bounded exchange instead of a full rotation (flow is pair-local;
BASELINE.json:11 "block-border flow constraints").

All functions run INSIDE shard_map over the time axis; `x` is the local
shard with time as axis 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def shift_from_next(x: Array, k: int, axis_name: str) -> Array:
    """Receive the FIRST k time-steps of the next shard (ring neighbor
    i+1 -> i). The last shard receives zeros. Returns [k, ...]."""
    n = jax.lax.axis_size(axis_name)
    head = x[:k]
    return jax.lax.ppermute(
        head, axis_name, perm=[(i, i - 1) for i in range(1, n)]
    )


def shift_from_prev(x: Array, k: int, axis_name: str) -> Array:
    """Receive the LAST k time-steps of the previous shard (i-1 -> i).
    The first shard receives zeros. Returns [k, ...]."""
    n = jax.lax.axis_size(axis_name)
    tail = x[-k:]
    return jax.lax.ppermute(
        tail, axis_name, perm=[(i, i + 1) for i in range(n - 1)]
    )


def extend_right(x: Array, k: int, axis_name: str) -> Array:
    """Append the next shard's first k steps: [T_loc,...] -> [T_loc+k,...].
    On the last shard the appended steps are EDGE-replicated (clip end
    behaves like a freeze frame, matching single-device edge handling)."""
    n = jax.lax.axis_size(axis_name)
    nxt = shift_from_next(x, k, axis_name)
    idx = jax.lax.axis_index(axis_name)
    edge = jnp.broadcast_to(x[-1:], nxt.shape)
    nxt = jnp.where(idx == n - 1, edge, nxt)
    return jnp.concatenate([x, nxt], axis=0)


def exclusive_prefix_sum(total: Array, axis_name: str) -> Array:
    """Sum of `total` over all shards strictly BEFORE this one.

    The cross-shard half of a distributed cumulative sum: each shard
    computes its local cumsum and adds this offset. One all_gather over
    ICI of a [G,...]-small per-shard total (SURVEY.md §5 "long-context").
    """
    n = jax.lax.axis_size(axis_name)
    all_totals = jax.lax.all_gather(total, axis_name, axis=0)  # [n, ...]
    idx = jax.lax.axis_index(axis_name)
    mask = (jnp.arange(n) < idx).astype(total.dtype)
    return jnp.tensordot(mask, all_totals, axes=1)


__all__ = [
    "shift_from_next",
    "shift_from_prev",
    "extend_right",
    "exclusive_prefix_sum",
]
