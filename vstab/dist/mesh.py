"""Device mesh and sharding layout (SURVEY.md §2.2, §5 "Distributed
communication backend").

The framework's two mesh axes:
  "data" — clip-level data parallelism (DeepStab sweep; BASELINE.json:10)
  "time" — temporal-block parallelism, THE core scale-out axis
           (BASELINE.json:5,9,11): a long video's time axis is partitioned
           over chips/hosts; flow, smoothing and warp are block-local, and
           blocks couple only through halo frames (ppermute) and the reduced
           Schur separator system (all_gather) — see vstab.dist.schur_dist.

The reference is single-process single-GPU [EXT, SURVEY.md §2.2]; none of
this exists there. All collectives ride ICI within a slice / DCN across
hosts via XLA — no hand-written NCCL analogue (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vstab.core.config import DistConfig

DATA_AXIS = "data"
TIME_AXIS = "time"


def make_mesh(
    cfg: Optional[DistConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the ("data", "time") mesh.

    Axis sizes come from cfg; an axis size of 0/None means "absorb all
    remaining devices". With the default cfg both axes are 1 -> a 1x1 mesh
    on the first device (single-chip path compiles identically).
    """
    devs = list(devices if devices is not None else jax.devices())
    d = cfg.data_axis if cfg else 1
    t = cfg.time_axis if cfg else 1
    if not d and not t:
        d, t = 1, len(devs)
    elif not d:
        d = len(devs) // t
    elif not t:
        t = len(devs) // d
    n = d * t
    if n > len(devs):
        raise ValueError(
            f"mesh {d}x{t} needs {n} devices, have {len(devs)}"
        )
    grid = np.asarray(devs[:n]).reshape(d, t)
    return Mesh(grid, (DATA_AXIS, TIME_AXIS))


def clip_sharding(mesh: Mesh) -> NamedSharding:
    """[T, H, W, C] frames: time axis sharded over "time"."""
    return NamedSharding(mesh, P(TIME_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[N, ...] batch: leading axis sharded over both mesh axes (pure DP
    for training: every chip gets a slice, params replicated + psum)."""
    return NamedSharding(mesh, P((DATA_AXIS, TIME_AXIS)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def time_size(mesh: Mesh) -> int:
    return mesh.shape[TIME_AXIS]


__all__ = [
    "DATA_AXIS",
    "TIME_AXIS",
    "make_mesh",
    "clip_sharding",
    "batch_sharding",
    "replicated",
    "time_size",
]
