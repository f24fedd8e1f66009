"""Checkpoint / resume (SURVEY.md §5 "Checkpoint / resume").

Flow-net params via flax serialization (the reference's TF Saver analogue
[RECON]); pipeline-level resume state is handled by the eval harness's JSONL
manifest (vstab.eval.deepstab.run_sweep: skip-on-rerun per clip).
"""

from __future__ import annotations

import os
from typing import Any, Optional

from flax import serialization


def save_params(path: str, params: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template: Optional[Any] = None) -> Any:
    import jax
    import jax.numpy as jnp

    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        return serialization.from_bytes(template, data)
    # Reconstruct without a template: msgpack restores the nested dict form.
    state = serialization.msgpack_restore(data)
    return jax.tree_util.tree_map(jnp.asarray, state)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Newest checkpoint by the step number embedded in `flow_NNNNNN.msgpack`
    (mtime breaks ties / covers free-form names — on a fresh git clone every
    file's mtime is the checkout time, so name order must win)."""
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [
        os.path.join(ckpt_dir, f)
        for f in os.listdir(ckpt_dir)
        if f.endswith(".msgpack")
    ]
    if not cands:
        return None

    def key(p: str):
        import re

        m = re.search(r"(\d+)", os.path.basename(p))
        return (int(m.group(1)) if m else -1, os.path.getmtime(p))

    return max(cands, key=key)


__all__ = ["save_params", "load_params", "latest_checkpoint"]
