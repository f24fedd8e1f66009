#!/usr/bin/env python
"""End-to-end stabilization throughput benchmark (SURVEY.md §6).

Measures steady-state frames/s of the full pipeline (PWC-Net flow ->
sparse-LS/Schur smoothing -> full-frame render) on a synthetic 720p shaky
clip, on whatever backend JAX selects (TPU under axon; CPU with
JAX_PLATFORMS=cpu).

Prints ONE JSON line:
  {"metric": "stabilize_720p_fps", "value": N, "unit": "frames/s",
   "vs_baseline": N}

vs_baseline is relative to the recorded CPU denominator (BASELINE.md:
"our CPU frames/s becomes the denominator for the 10x target").
Run `python bench.py --record-cpu-baseline` on CPU to refresh it.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

# CPU denominator, measured on this machine (see BASELINE.md §"First-run").
CPU_BASELINE_FPS = None  # loaded from baseline file, fallback below
_BASELINE_FILE = os.path.join(os.path.dirname(__file__), ".bench_cpu_baseline.json")
_CPU_FALLBACK_FPS = 1.0


def _load_cpu_baseline() -> float:
    try:
        with open(_BASELINE_FILE) as f:
            return float(json.load(f)["fps"])
    except Exception:
        return _CPU_FALLBACK_FPS


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--impl", default="auto", choices=["auto", "pallas", "xla"])
    ap.add_argument("--record-cpu-baseline", action="store_true")
    ap.add_argument("--profile", default=None, help="write a jax.profiler trace here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vstab.core.config import Config
    from vstab.eval.synthetic import make_shaky_clip
    from vstab.pipeline import clip_flow, default_params, smooth_and_render

    backend = jax.default_backend()
    impl = args.impl
    if impl == "auto":
        impl = "pallas" if backend == "tpu" else "xla"
    dtype = "bfloat16" if backend == "tpu" else "float32"

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, flow=dataclasses.replace(cfg.flow, kernel_impl=impl, compute_dtype=dtype)
    )
    params = default_params(cfg)

    t, h, w = args.frames, args.height, args.width
    frames, _ = make_shaky_clip(t=t, h=h, w=w, seed=0)
    frames = jax.block_until_ready(jnp.asarray(frames))

    def run(x):
        flow = clip_flow(params, x, cfg)
        out, _ = smooth_and_render(x, flow, cfg)
        return out

    # Warmup / compile.
    out = jax.block_until_ready(run(frames))
    assert np.isfinite(np.asarray(out[0])).all(), "non-finite output"

    if args.profile:
        with jax.profiler.trace(args.profile):
            jax.block_until_ready(run(frames))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run(frames)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = args.iters * t / dt

    if args.record_cpu_baseline:
        with open(_BASELINE_FILE, "w") as f:
            json.dump(
                {"fps": fps, "backend": backend, "shape": [t, h, w]}, f
            )
        print(f"recorded CPU baseline: {fps:.3f} frames/s", file=sys.stderr)

    base = _load_cpu_baseline()
    print(
        json.dumps(
            {
                "metric": f"stabilize_{h}p_fps",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / base, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
