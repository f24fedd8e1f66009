"""Distributed runtime: mesh layout, halo exchange, distributed Schur solve,
time-parallel pipeline, multi-host bring-up (SURVEY.md §2.2, L5)."""

from vstab.dist.mesh import (
    DATA_AXIS,
    TIME_AXIS,
    batch_sharding,
    clip_sharding,
    make_mesh,
    replicated,
)
from vstab.dist.halo import (
    exclusive_prefix_sum,
    extend_right,
    shift_from_next,
    shift_from_prev,
)
from vstab.dist.schur_dist import schur_solve_shard
from vstab.dist.pipeline_dist import stabilize_sharded
from vstab.dist.init import initialize, shutdown

__all__ = [
    "DATA_AXIS",
    "TIME_AXIS",
    "make_mesh",
    "clip_sharding",
    "batch_sharding",
    "replicated",
    "shift_from_next",
    "shift_from_prev",
    "extend_right",
    "exclusive_prefix_sum",
    "schur_solve_shard",
    "stabilize_sharded",
    "initialize",
    "shutdown",
]
