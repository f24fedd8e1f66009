"""Multi-host bring-up (SURVEY.md §2.2 "Multi-host orchestration", §3.5).

One process per host; `jax.distributed.initialize` is the control plane
(BASELINE.json:11). Retries with timeout per SURVEY.md §5 "Failure
detection". After initialization the same mesh/shard_map code runs
unchanged — collectives ride ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

import logging
import time
from typing import Optional

import jax

from vstab.core.config import DistConfig

log = logging.getLogger("vstab.dist")


def initialize(cfg: DistConfig, retries: int = 3, backoff_s: float = 5.0) -> None:
    """Bring up jax.distributed from config; no-op for single-process runs."""
    if cfg.coordinator_address is None or cfg.num_processes <= 1:
        return
    last = None
    for attempt in range(retries):
        try:
            jax.distributed.initialize(
                coordinator_address=cfg.coordinator_address,
                num_processes=cfg.num_processes,
                process_id=cfg.process_id,
            )
            log.info(
                "jax.distributed up: process %d/%d, %d global devices",
                cfg.process_id, cfg.num_processes, jax.device_count(),
            )
            return
        except Exception as e:  # noqa: BLE001 — retry any bring-up failure
            last = e
            log.warning("distributed init attempt %d failed: %s", attempt, e)
            time.sleep(backoff_s * (attempt + 1))
    raise RuntimeError(f"jax.distributed.initialize failed after {retries} tries") from last


def shutdown() -> None:
    try:
        jax.distributed.shutdown()
    except Exception:  # pragma: no cover - best-effort
        pass


__all__ = ["initialize", "shutdown"]
