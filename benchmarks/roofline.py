#!/usr/bin/env python
"""Kernel roofline: achieved vs speed-of-light on the attached TPU
(SURVEY.md §5 tracing/profiling; BASELINE.md "flow and warp kernels at
speed-of-light per chip"; VERDICT r3 missing-4).

Every kernel in this pipeline is BANDWIDTH-bound, not FLOP-bound: the
select-accumulate warps and the windowed correlation do O(span) VPU work
per loaded byte with no MXU contraction, so the roofline that matters is
HBM bytes moved / peak HBM bandwidth. For each kernel at its production
shapes this script measures steady-state time and reports

    sol_ms  = min_bytes / HBM_GBPS          (compulsory traffic only:
              one read of every input + one write of every output, at the
              array dtype — halo refetch, padding and any spills count
              AGAINST the kernel)
    pct_sol = sol_ms / achieved_ms

Run:  python benchmarks/roofline.py [--hbm-gbps 819]
v5e reference peak: ~819 GB/s HBM, 197 bf16 TFLOP/s MXU (public specs).
Results are recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _measure(step, x0, iters=10):
    """Per-iteration time of `step` (shape-preserving) chained UNROLLED
    inside one jit. Chaining is load-bearing twice over: (a) a host loop of
    identical dispatches gets deduplicated by the remote-execution layer
    (first attempt measured 19TB/s "bandwidth"), and (b) one dispatch
    amortizes the tunnel's per-call latency out of the measurement. The
    chain is unrolled, NOT a fori_loop — wrapping a pallas_call in an XLA
    while loop explodes compile time (measured 95s for a 3-iteration loop
    at a small shape)."""
    import functools as ft

    import jax

    iters = min(iters, 6)  # compile cost scales with the unroll
    f = jax.jit(lambda x: ft.reduce(lambda y, _: step(y), range(iters), x))
    jax.block_until_ready(f(x0))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(f(x0))
    return (time.perf_counter() - t0) / iters


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hbm-gbps", type=float, default=819.0)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vstab.cli import _enable_compile_cache

    _enable_compile_cache()

    from vstab.kernels.cost_volume import cost_volume_pallas
    from vstab.kernels.warp import bilinear_warp_pallas
    from vstab.kernels.warp1d import hwarp_pallas, vwarp_pallas

    assert jax.default_backend() == "tpu", "roofline needs the TPU"
    rng = np.random.default_rng(0)
    rows = []

    def record(name, t_s, nbytes, extra=""):
        sol = nbytes / (args.hbm_gbps * 1e9)
        rows.append(
            {
                "kernel": name,
                "ms": round(t_s * 1e3, 3),
                "min_GB": round(nbytes / 1e9, 4),
                "sol_ms": round(sol * 1e3, 3),
                "pct_sol": round(100.0 * sol / t_s, 1),
                "note": extra,
            }
        )

    # --- cost volume + feature warp at the 720p flow's per-level shapes
    # (batch = the pipeline's pair_chunk of 8; bf16 = production dtype).
    # Level l: (H/2^l, W/2^l), channels from FlowConfig.pyramid_channels.
    for lvl, c in ((2, 32), (3, 64), (4, 96), (5, 128), (6, 196)):
        h, w = 720 // 2**lvl, 1280 // 2**lvl
        f1 = jnp.asarray(rng.normal(size=(8, h, w, c)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        f2 = f1 + 0.1
        # chain via a negligible feedback add (counted in nbytes)
        t = _measure(
            lambda y, b=f2: y + 1e-30 * cost_volume_pallas(y, b, radius=4)[
                ..., :1
            ],
            f1, iters=args.iters,
        )
        nbytes = 2 * (2 * 8 * h * w * c) + 2 * (8 * h * w * 81) + (
            2 * 2 * (8 * h * w * c)  # feedback read+write of y
        )
        record(f"cost_volume L{lvl} {h}x{w}x{c}", t, nbytes, "+chain add")

        flow = jnp.asarray((rng.random((8, h, w, 2)) * 10 - 5).astype(np.float32))
        t = _measure(
            lambda y, fl=flow: bilinear_warp_pallas(y, fl, max_disp=8),
            f1, iters=args.iters,
        )
        nbytes = 2 * (8 * h * w * c) * 2 + 4 * (8 * h * w * 2)
        record(f"bilinear_warp L{lvl} {h}x{w}x{c}", t, nbytes)

    # --- render-path 1D warps at 720p/1080p, f32 frames, d in {16, 48}.
    # Fields are SMOOTH (coarse grid upsampled — the production regime:
    # stabilization residuals vary slowly, and the kernels' data-dependent
    # trip bounds exploit that); a per-pixel-random worst case is measured
    # separately below.
    # amplitude 4px ~= a real post-mean-removal stabilization residual
    # (rotation ~0.01 rad + grid wobble); 12px is a stress case. The warps'
    # cost is ~(per-tile field range + 2) VPU passes, so amplitude is the
    # load-bearing parameter, not max_disp.
    for (h, w), n, amp in (
        ((720, 1280), 16, 4.0),
        ((1080, 1920), 16, 4.0),
        ((1080, 1920), 16, 12.0),
    ):
        img = jnp.asarray(rng.random((n, h, w, 3)).astype(np.float32))
        coarse = (rng.random((n, 4, 5)) * 2 * amp - amp).astype(np.float32)
        v = jnp.asarray(
            np.asarray(
                jax.image.resize(jnp.asarray(coarse), (n, h, w), "bilinear")
            )
        )
        for d in (16, 48):
            th = max(32, -(-(d + 1) // 8) * 8)
            nbytes = 4 * (n * h * w * 3) * 2 + 4 * (n * h * w)
            t = _measure(
                lambda y, b=v, dd=d, tt=th: vwarp_pallas(
                    y, b, max_disp=dd, tile_h=tt
                ),
                img, iters=args.iters,
            )
            record(f"vwarp {h}p amp={amp:g} d={d}", t, nbytes)
            t = _measure(
                lambda y, b=v, dd=d, tt=th: hwarp_pallas(
                    y, b, max_disp=dd, tile_h=tt
                ),
                img, iters=args.iters,
            )
            record(f"hwarp {h}p amp={amp:g} d={d}", t, nbytes)

    # worst case: per-pixel random displacement (full tap span every tile)
    img = jnp.asarray(rng.random((16, 1080, 1920, 3)).astype(np.float32))
    vr = jnp.asarray(
        (rng.random((16, 1080, 1920)) * 24 - 12).astype(np.float32)
    )
    t = _measure(
        lambda y: vwarp_pallas(y, vr, max_disp=16), img, iters=args.iters
    )
    record("vwarp 1080p d=16 RANDOM", t, 4 * 16 * 1080 * 1920 * (3 * 2 + 1))

    wk = max(len(r["kernel"]) for r in rows)
    print(
        f"{'kernel':<{wk}}  {'ms':>8}  {'minGB':>7}  {'SoL ms':>7}  {'%SoL':>5}"
    )
    for r in rows:
        print(
            f"{r['kernel']:<{wk}}  {r['ms']:>8.3f}  {r['min_GB']:>7.4f}  "
            f"{r['sol_ms']:>7.3f}  {r['pct_sol']:>5.1f}"
        )
    print(json.dumps(rows))
    return 0


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    sys.exit(main())
