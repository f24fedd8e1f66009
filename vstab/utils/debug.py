"""Debug / NaN-and-OOB checking (SURVEY.md §5 "Race detection / sanitizers";
VERDICT.md r1 item 7).

Races are designed out (pure functional JAX); the real hazards are NaN/Inf
from the f32 solver and out-of-bounds indexing in the warp paths. This
module wraps the pipeline in `jax.experimental.checkify` so `--debug` runs
fail loudly at the offending op instead of silently corrupting output.

Checkify instruments the traced XLA ops; Pallas kernel bodies are opaque to
it, but every Pallas kernel here has an XLA fallback (`impl='xla'`) which IS
instrumented — `stabilize_checked` therefore forces the XLA kernel path.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
from jax.experimental import checkify

Array = jax.Array

# float_checks: nan/inf at every float op. index_checks: OOB gathers/scatters.
CHECKS = checkify.float_checks | checkify.index_checks | checkify.user_checks


def _xla_kernels(cfg):
    """Force the XLA kernel path so checkify sees inside the warp/cost ops."""
    return dataclasses.replace(
        cfg,
        flow=dataclasses.replace(cfg.flow, kernel_impl="xla"),
        render=dataclasses.replace(cfg.render, kernel_impl="xla"),
    )


def stabilize_checked(
    frames: Array, params, cfg
) -> Tuple[Array, Dict[str, Array]]:
    """`pipeline.stabilize` under checkify: raises on NaN/Inf/OOB anywhere in
    flow, smoothing, or render. Slower (adds checks to every float op) —
    debug runs only."""
    from vstab.pipeline import _clip_flow, _smooth_and_render

    cfg = _xla_kernels(cfg)

    def run(params, frames):
        flow = _clip_flow(params, frames, cfg)
        return _smooth_and_render(frames, flow, cfg)

    checked = jax.jit(checkify.checkify(run, errors=CHECKS))
    err, out = checked(params, frames)
    checkify.check_error(err)
    return out


__all__ = ["stabilize_checked", "CHECKS"]
