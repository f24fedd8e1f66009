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
Run `python bench.py --record-cpu-baseline` ON CPU to refresh it; the file
is committed so the ratio is always against a real measurement.

Per-stage wall times (flow / smooth / render) are reported on stderr as one
JSON line per stage (SURVEY.md §5 observability).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

_BASELINE_FILE = os.path.join(os.path.dirname(__file__), ".bench_cpu_baseline.json")


def _load_cpu_baseline():
    try:
        with open(_BASELINE_FILE) as f:
            return json.load(f)
    except Exception:
        return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--impl", default="auto", choices=["auto", "pallas", "xla"])
    ap.add_argument("--record-cpu-baseline", action="store_true")
    ap.add_argument(
        "--platform", default="auto", choices=["auto", "cpu", "tpu"],
        help="force the JAX backend. The axon sitecustomize force-registers "
        "the TPU via jax.config, so JAX_PLATFORMS=cpu in the environment is "
        "NOT honored — this flag overrides through jax.config (see "
        "tests/conftest.py). --record-cpu-baseline implies --platform cpu.",
    )
    ap.add_argument("--profile", default=None, help="write a jax.profiler trace here")
    ap.add_argument("--stages", action="store_true", help="also time each stage")
    ap.add_argument(
        "--mode", default="pipeline", choices=["pipeline", "blocked-chip"],
        help="pipeline: whole-clip end-to-end fps (the driver contract). "
        "blocked-chip: device-resident throughput of the temporal-block "
        "stages (motion + render) with data already on the chip — the "
        "number a PCIe-attached host would see; this dev box feeds the TPU "
        "through a ~40MB/s tunnel, so file-to-file 1080p is link-bound "
        "(see BASELINE.md).",
    )
    args = ap.parse_args()

    import jax

    if args.record_cpu_baseline:
        args.platform = "cpu"
    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)
    from vstab.cli import _enable_compile_cache

    _enable_compile_cache()

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

    if args.mode == "blocked-chip":
        return _bench_blocked_chip(args, impl, dtype)

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        flow=dataclasses.replace(cfg.flow, kernel_impl=impl, compute_dtype=dtype),
        render=dataclasses.replace(cfg.render, kernel_impl=impl),
    )
    params = default_params(cfg)

    def note(msg, _t=[time.perf_counter()]):
        now = time.perf_counter()
        print(f"[bench +{now - _t[0]:7.1f}s] {msg}", file=sys.stderr, flush=True)
        _t[0] = now

    note(f"backend={backend} impl={impl} params ready")
    t, h, w = args.frames, args.height, args.width
    frames, _ = make_shaky_clip(t=t, h=h, w=w, seed=0)
    frames = jax.block_until_ready(jnp.asarray(frames))
    note("clip synthesized")

    def run(x):
        flow = clip_flow(params, x, cfg)
        out, _ = smooth_and_render(x, flow, cfg)
        return out

    # Warmup / compile.
    flow = jax.block_until_ready(clip_flow(params, frames, cfg))
    note("flow compiled + run")
    out = jax.block_until_ready(smooth_and_render(frames, flow, cfg)[0])
    note("smooth_and_render compiled + run")
    del flow
    out = jax.block_until_ready(run(frames))
    note("warmup done")
    assert np.isfinite(np.asarray(out[0])).all(), "non-finite output"

    if args.profile:
        with jax.profiler.trace(args.profile):
            jax.block_until_ready(run(frames))

    if args.stages:
        def stage_time(name, fn, iters=3):
            jax.block_until_ready(fn())
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
            print(
                json.dumps(
                    {"stage": name, "ms": round(dt * 1e3, 2),
                     "fps": round(t / dt, 2), "backend": backend}
                ),
                file=sys.stderr,
            )
            return out

        flow = stage_time("flow", lambda: clip_flow(params, frames, cfg))
        note("flow stage timed")
        stage_time("smooth_render", lambda: smooth_and_render(frames, flow, cfg))
        note("smooth_render stage timed")

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run(frames)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = args.iters * t / dt

    if args.record_cpu_baseline:
        assert backend == "cpu", backend
        with open(_BASELINE_FILE, "w") as f:
            json.dump({"fps": fps, "backend": backend, "shape": [t, h, w]}, f)
        print(f"recorded CPU baseline: {fps:.3f} frames/s", file=sys.stderr)

    base = _load_cpu_baseline()
    if base is None:
        print(
            "warning: no committed CPU baseline (.bench_cpu_baseline.json); "
            "vs_baseline is null — run `JAX_PLATFORMS=cpu python bench.py "
            "--record-cpu-baseline` first",
            file=sys.stderr,
        )
        ratio = None
    else:
        if base.get("shape") != [t, h, w]:
            print(
                f"warning: baseline shape {base.get('shape')} != bench shape "
                f"{[t, h, w]}; ratio is cross-config",
                file=sys.stderr,
            )
        ratio = round(fps / float(base["fps"]), 3)
    print(
        json.dumps(
            {
                "metric": f"stabilize_{h}p_fps",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": ratio,
            }
        )
    )
    return 0


def _bench_blocked_chip(args, impl: str, dtype: str) -> int:
    """Device-resident blocked-stage throughput: times _block_motion and
    _block_render on data already in HBM (uint8 in, uint8 out), i.e. the
    chip-side cost per 64-frame block of BASELINE config 3 with the host
    link out of the picture."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vstab.core.config import Config
    from vstab.pipeline import default_params
    from vstab.pipeline_blocked import _block_motion, _block_render

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        flow=dataclasses.replace(cfg.flow, kernel_impl=impl, compute_dtype=dtype),
        render=dataclasses.replace(cfg.render, kernel_impl=impl),
    )
    params = default_params(cfg)
    b = cfg.dist.time_block_len
    t, h, w = b, args.height, args.width
    rng = np.random.default_rng(0)
    # K DISTINCT input blocks evaluated inside ONE jit: a host loop of
    # identical dispatches gets deduplicated by the remote-execution layer
    # (measured 258k "fps"), and distinct operands also defeat XLA CSE.
    k = max(2, min(4, args.iters))
    frames = jax.device_put(
        rng.integers(0, 255, size=(k, b + 1, h, w, 3), dtype=np.uint8)
    )
    gh, gw = cfg.smooth.grid_size
    path = jax.device_put(
        (rng.random((k, b, gh, gw, 2)).astype(np.float32) - 0.5) * 8.0
    )
    jax.block_until_ready((frames, path))

    def timeit(fn):
        # Warm/compile on input 0, then time ONE dispatch per REMAINING
        # distinct input. Each stage is wrapped to return a tiny reduction
        # and completion is forced with a HOST FETCH: on this remote
        # backend block_until_ready returns early (measured 0.7 ms for a
        # 64-frame 1080p flow — impossible), identical dispatches dedup,
        # and unrolling k calls into one jit compiles for >20 min. The
        # fetch of a scalar costs one tunnel round trip (~15 ms), noise
        # against the ~seconds-long stages.
        np.asarray(fn(0))
        t0 = time.perf_counter()
        for i in range(1, k):
            r = np.asarray(fn(i))
            assert np.isfinite(float(r))
        return (time.perf_counter() - t0) / (k - 1)

    @jax.jit
    def motion_probe(x):
        return jnp.sum(
            _block_motion(params, x, cfg).astype(jnp.float32)
        )

    @jax.jit
    def render_probe(x, p):
        out = _block_render(
            x, p, jnp.float32(0.9), cfg,
            max_disp=cfg.render.max_residual_disp, to_uint8=True,
        )
        return jnp.sum(out.astype(jnp.float32))

    t_motion = timeit(lambda i: motion_probe(frames[i]))
    t_render = timeit(lambda i: render_probe(frames[i, :b], path[i]))
    for name, dt in (("motion", t_motion), ("render", t_render)):
        print(
            json.dumps(
                {"stage": name, "ms": round(dt * 1e3, 2),
                 "fps": round(b / dt, 2)}
            ),
            file=sys.stderr,
        )
    fps = b / (t_motion + t_render)
    print(
        json.dumps(
            {
                "metric": f"blocked_{h}p_chip_fps",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
