"""MFU accounting for the flow stage (VERDICT r4 item 5 / missing-4).

The bytes-roofline (benchmarks/roofline.py) is the right lens for the
VPU-bound render warps, but the flow network is MXU/FLOP work — this module
computes ANALYTIC FLOPs per stage from the FlowConfig (convs: 2*H*W*K^2*
Cin*Cout; cost volume: 2*(2r+1)^2*H*W*C; warp: ~20 VPU ops per tap-channel)
and divides measured stage times by the v5e peak (197 bf16 TFLOP/s,
measured recipe: distinct inputs per dispatch + small-reduction fetch, see
BASELINE.md "measurement hygiene").

Usage:
    python benchmarks/mfu.py [--hw 720 1280] [--pairs 8] [--no-measure]

Prints a per-stage table: GFLOP, measured ms, achieved TFLOP/s, MFU%.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Dict, List, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_TFLOPS = 197.0
V5E_F32_TFLOPS = 49.0  # bf16 peak / 4 [public v5e spec ratio]


def _conv_flops(h: int, w: int, cin: int, cout: int, k: int = 3) -> float:
    return 2.0 * h * w * k * k * cin * cout


def flow_flops(cfg, h: int, w: int) -> Dict[str, float]:
    """Analytic FLOPs per FRAME PAIR at padded resolution (h, w)."""
    mult = 2 ** len(cfg.pyramid_channels)
    hp, wp = -(-h // mult) * mult, -(-w // mult) * mult
    ch = cfg.pyramid_channels
    ech = cfg.estimator_channels
    r = cfg.search_radius
    nd = (2 * r + 1) ** 2

    stages: Dict[str, float] = {}
    # Encoder: x2 frames (per pair, each frame's pyramid is computed once
    # inside clip_flow's chunking — adjacent pairs share frames, so the
    # per-pair cost is ~1x per frame; we report the 2x bound used by a
    # single isolated pair and note sharing in the caller).
    enc = 0.0
    cin = 3
    for lvl, c in enumerate(ch):
        hl, wl = hp >> (lvl + 1), wp >> (lvl + 1)
        enc += _conv_flops(hl, wl, cin, c) + 2 * _conv_flops(hl, wl, c, c)
        cin = c
    stages["encoder(x2 frames)"] = 2 * enc

    fine_idx = cfg.output_level - 1
    cv = warp = est = up = 0.0
    for idx in range(len(ch) - 1, fine_idx - 1, -1):
        hl, wl = hp >> (idx + 1), wp >> (idx + 1)
        c = ch[idx]
        coarsest = idx == len(ch) - 1
        cv += 2.0 * nd * hl * wl * c
        if not coarsest:
            # bilinear warp: 4 taps x (1 mul + 1 add) x C + ~12 ops of
            # weight/index arithmetic per pixel (VPU, not MXU)
            warp += hl * wl * (8.0 * c + 12)
            # UpBlock transposed 4x4 stride 2: 4 contributing taps/output px
            feat_ch_prev = (
                nd + ch[idx + 1] + (0 if idx + 1 == len(ch) - 1 else 4)
                + sum(ech)
            )
            up += 2.0 * hl * wl * 4 * (2 * 2 + feat_ch_prev * 2)
        cin0 = nd + c + (0 if coarsest else 4)
        cin_i = cin0
        for ec in ech:
            est += _conv_flops(hl, wl, cin_i, ec)
            cin_i += ec
        est += _conv_flops(hl, wl, cin_i, 2)
    stages["cost_volume(all levels)"] = cv
    stages["feature_warp(all levels)"] = warp
    stages["upsample_blocks"] = up
    stages["estimators(all levels)"] = est

    # Context net at the finest estimated level.
    hl, wl = hp >> cfg.output_level, wp >> cfg.output_level
    cctx = (128, 128, 128, 96, 64, 32)
    cin_i = nd + ch[fine_idx] + (0 if fine_idx == len(ch) - 1 else 4) + sum(ech) + 2
    ctx = 0.0
    for cc, _dil in zip(cctx, cfg.context_dilations):
        ctx += _conv_flops(hl, wl, cin_i, cc)
        cin_i = cc
    ctx += _conv_flops(hl, wl, cin_i, 2)
    stages["context_net"] = ctx
    return stages


def _time_fn(fn, stacked_args: tuple, reps: int) -> float:
    """Seconds per rep, measured as ONE dispatch of a lax.map chain over
    `reps` DISTINCT input slices (leading axis), reduced to one scalar.
    Per-call timing through the axon tunnel is floored at ~10-20 ms of
    dispatch+fetch (BASELINE.md measurement hygiene), which swamps any
    sub-50ms component — the in-graph chain amortizes it to one round
    trip; distinct inputs defeat the remote-execution dedup."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(args):
        def body(a):
            out = fn(*a)
            out0 = out[0] if isinstance(out, tuple) else out
            return jnp.sum(out0.astype(jnp.float32))

        return jnp.sum(jax.lax.map(body, args))

    float(chain(stacked_args))  # compile + warm
    t0 = time.perf_counter()
    float(chain(stacked_args))
    return (time.perf_counter() - t0) / reps


def measure(cfg, h: int, w: int, pairs: int, reps: int = 8) -> Dict[str, float]:
    """Floor-subtracted seconds per `pairs`-pair dispatch per component.

    Every row is its own chained dispatch, so each still carries one
    round-trip; the 'floor' row measures that round-trip with a trivial
    op and is subtracted from every other row (round-5 calibration: ~3.7
    ms/rep at reps=8 through the tunnel)."""
    import jax
    import jax.numpy as jnp

    from vstab.flow.context import ContextNet
    from vstab.flow.encoder import FeaturePyramid
    from vstab.flow.estimator import FlowEstimator
    from vstab.flow.pwcnet import PWCNet
    from vstab.kernels import bilinear_warp, cost_volume

    rng = np.random.default_rng(0)

    def mk(shape, d=jnp.float32):
        return jnp.asarray(rng.random((reps,) + shape, np.float32)).astype(d)

    params = default_params_flow(cfg)
    dtype = jnp.dtype(cfg.compute_dtype)
    nd = (2 * cfg.search_radius + 1) ** 2

    floor = _time_fn(lambda x: x + 1.0, (mk((8, 128, 128)),), reps)
    res: Dict[str, float] = {"floor (round-trip)": floor}

    net = PWCNet(cfg)
    res["full_flow"] = _time_fn(
        lambda a, b: net.apply(params, a, b)["flow"],
        (mk((pairs, h, w, 3)), mk((pairs, h, w, 3))),
        reps,
    ) - floor

    pyr = FeaturePyramid(cfg.pyramid_channels, dtype=dtype)
    pyr_params = {"params": params["params"]["pyramid"]}
    res["encoder(x2 frames)"] = 2 * (
        _time_fn(
            lambda a: pyr.apply(pyr_params, a)[-1],
            (mk((pairs, h, w, 3)),), reps,
        )
        - floor
    )

    cv_t = warp_t = 0.0
    fine_idx = cfg.output_level - 1
    for idx in (fine_idx, fine_idx + 1):  # two finest levels ~= all the work
        hl, wl = h >> (idx + 1), w >> (idx + 1)
        c = cfg.pyramid_channels[idx]
        cv_t += max(
            _time_fn(
                lambda a, b: cost_volume(
                    a, b, radius=cfg.search_radius, impl=cfg.kernel_impl
                ),
                (mk((pairs, hl, wl, c), dtype), mk((pairs, hl, wl, c), dtype)),
                reps,
            )
            - floor,
            0.0,
        )
        warp_t += max(
            _time_fn(
                lambda a, fl: bilinear_warp(
                    a, fl, impl=cfg.kernel_impl, max_disp=cfg.warp_max_disp
                ),
                (mk((pairs, hl, wl, c), dtype), mk((pairs, hl, wl, 2), dtype)),
                reps,
            )
            - floor,
            0.0,
        )
    res["cost_volume(2 finest levels)"] = cv_t
    res["feature_warp(2 finest levels)"] = warp_t

    hl, wl = h >> cfg.output_level, w >> cfg.output_level
    cin = nd + cfg.pyramid_channels[fine_idx] + 4
    est = FlowEstimator(cfg.estimator_channels, dtype=dtype)
    ev = est.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, cin), dtype))
    res["estimator (finest level)"] = max(
        _time_fn(
            lambda x: est.apply(ev, x)[0], (mk((pairs, hl, wl, cin), dtype),),
            reps,
        )
        - floor,
        0.0,
    )
    cctx = cin + sum(cfg.estimator_channels)
    ctx = ContextNet(cfg.context_dilations, dtype=dtype)
    cvars = ctx.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, cctx), dtype),
        jnp.zeros((1, 64, 64, 2), jnp.float32),
    )
    res["context (finest level)"] = max(
        _time_fn(
            lambda f, fl: ctx.apply(cvars, f, fl),
            (mk((pairs, hl, wl, cctx), dtype), mk((pairs, hl, wl, 2))),
            reps,
        )
        - floor,
        0.0,
    )
    return res


def default_params_flow(cfg):
    from vstab.core.config import Config
    from vstab.pipeline import default_params

    return default_params(Config(flow=cfg))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=(720, 1280))
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--no-measure", action="store_true")
    args = ap.parse_args()

    from vstab.core.config import FlowConfig

    import jax

    on_tpu = jax.default_backend() == "tpu"
    cfg = FlowConfig() if on_tpu else FlowConfig(
        kernel_impl="xla", compute_dtype="float32"
    )
    h, w = args.hw
    mult = 2 ** len(cfg.pyramid_channels)
    hp, wp = -(-h // mult) * mult, -(-w // mult) * mult
    fl = flow_flops(cfg, h, w)
    total = sum(fl.values())
    peak = V5E_BF16_TFLOPS if cfg.compute_dtype == "bfloat16" else V5E_F32_TFLOPS

    print(f"analytic FLOPs per frame pair at {hp}x{wp} ({cfg.compute_dtype}):")
    for k, v in fl.items():
        print(f"  {k:28s} {v / 1e9:8.2f} GFLOP  ({100 * v / total:4.1f}%)")
    print(f"  {'TOTAL':28s} {total / 1e9:8.2f} GFLOP")
    print(f"  peak-bound time/pair at {peak:.0f} TFLOP/s: "
          f"{1e3 * total / (peak * 1e12):.2f} ms")

    if args.no_measure:
        return 0
    meas = measure(cfg, hp, wp, args.pairs)
    print(f"\nmeasured ({args.pairs} pairs/dispatch, chained reps, "
          f"floor-subtracted, {jax.default_backend()}):")
    # finest-level estimator/context analytic FLOPs for the isolated rows
    hl, wl = hp >> cfg.output_level, wp >> cfg.output_level
    nd = (2 * cfg.search_radius + 1) ** 2
    cin_i = nd + cfg.pyramid_channels[cfg.output_level - 1] + 4
    est_fin = 0.0
    for ec in cfg.estimator_channels:
        est_fin += _conv_flops(hl, wl, cin_i, ec)
        cin_i += ec
    est_fin += _conv_flops(hl, wl, cin_i, 2)
    group_flops = {
        "full_flow": total,
        "encoder(x2 frames)": fl["encoder(x2 frames)"],
        "cost_volume(2 finest levels)": fl["cost_volume(all levels)"],
        "feature_warp(2 finest levels)": fl["feature_warp(all levels)"],
        "estimator (finest level)": est_fin,
        "context (finest level)": fl["context_net"],
    }
    for k, sec in meas.items():
        gf = group_flops.get(k, 0.0) * args.pairs
        tf = gf / sec / 1e12 if sec > 0 else 0.0
        print(
            f"  {k:30s} {1e3 * sec:8.1f} ms  {tf:6.1f} TFLOP/s  "
            f"MFU {100 * tf / peak:5.1f}%"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
