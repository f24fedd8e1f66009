"""Command-line interface (SURVEY.md L8, §2.1 row 18; VERDICT.md r1 item 3).

  python -m vstab stabilize in.mp4 out.mp4 [--config cfg.json] [--crop auto]
  python -m vstab eval --dataset /path/to/deepstab --results results.jsonl
  python -m vstab bench [--frames 48 --height 720 --width 1280]

The reference's analogue is a main.py driver script [RECON, SURVEY.md §1.1];
here the CLI is a thin shell over the library: config JSON round-trips
through core.config.Config, videos go through io/video.py (OpenCV, host
side), and all compute runs under the jitted pipeline.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import sys

log = logging.getLogger("vstab.cli")


def _load_config(args) -> "Config":
    from vstab.core.config import Config, preset

    if getattr(args, "preset", None):
        cfg = preset(args.preset)
    elif getattr(args, "config", None):
        with open(args.config) as f:
            cfg = Config.from_json(f.read())
    else:
        cfg = Config()
    if getattr(args, "crop", None):
        cfg = dataclasses.replace(
            cfg, render=dataclasses.replace(cfg.render, crop_mode=args.crop)
        )
    if getattr(args, "method", None):
        cfg = dataclasses.replace(
            cfg, smooth=dataclasses.replace(cfg.smooth, method=args.method)
        )
    if getattr(args, "impl", None) and args.impl != "auto":
        cfg = dataclasses.replace(
            cfg,
            flow=dataclasses.replace(cfg.flow, kernel_impl=args.impl),
            render=dataclasses.replace(cfg.render, kernel_impl=args.impl),
        )
    return cfg


def cmd_stabilize(args) -> int:
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vstab.io.video import read_video, write_video
    from vstab.pipeline import default_params, stabilize

    cfg = _load_config(args)
    # Probe the input BEFORE the (minutes-long on TPU) param init so a bad
    # path fails immediately.
    n_frames = _probe_frame_count(args.input, args.max_frames)
    params = default_params(cfg, ckpt_dir=args.ckpt_dir)

    if args.blocked or n_frames > (cfg.dist.time_block_len * 4):
        # Long clip: temporal-block streaming (M3) — constant host AND
        # device memory, file to file, never loading the whole clip.
        from vstab.pipeline_blocked import stabilize_video_blocked

        stats = stabilize_video_blocked(
            args.input, args.output, params, cfg,
            block_len=args.block_len, max_frames=args.max_frames,
            resume=not args.no_resume,
        )
        print(json.dumps(stats))
        return 0

    frames, fps = read_video(args.input, max_frames=args.max_frames)
    log.info("read %s: %s frames %sx%s @ %.1f fps", args.input,
             *frames.shape[:3], fps)
    t0 = time.perf_counter()
    if args.debug:
        from vstab.utils.debug import stabilize_checked

        out, _ = stabilize_checked(jnp.asarray(frames), params, cfg)
    else:
        out, _ = stabilize(jnp.asarray(frames), params, cfg)
    out = np.asarray(jax.block_until_ready(out))
    wall = time.perf_counter() - t0
    log.info("stabilized %d frames in %.2fs (%.1f frames/s)",
             frames.shape[0], wall, frames.shape[0] / wall)
    write_video(args.output, out, fps, codec=cfg.io.output_codec)
    print(json.dumps({
        "input": args.input, "output": args.output,
        "frames": int(frames.shape[0]),
        "fps_processed": round(frames.shape[0] / wall, 2),
    }))
    return 0


def _probe_frame_count(path: str, max_frames) -> int:
    """Container-reported frame count (0 if unknown) capped at max_frames."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    if max_frames is not None:
        n = min(n, max_frames) if n > 0 else max_frames
    return n


def cmd_eval(args) -> int:
    from vstab.eval.deepstab import aggregate, report_table, run_sweep

    cfg = _load_config(args)
    results = run_sweep(
        args.dataset,
        args.results,
        cfg=cfg,
        n_synthetic=args.n_synthetic,
        max_frames=args.max_frames,
        synth_shape=tuple(args.synth_shape),
        data_parallel=args.data_parallel,
        save_videos_dir=args.save_videos,
    )
    print(report_table(results))
    print(json.dumps({"aggregate": aggregate(results)}))
    return 0


def cmd_bench(args) -> int:
    import os
    import subprocess

    # bench.py lives at the repo root, one level above the vstab package —
    # resolve absolutely so `vstab bench` works from any CWD (VERDICT r3
    # weak-3: the relative path only worked from the repo root).
    bench = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
    )
    cmd = [sys.executable, bench]
    for k in ("frames", "height", "width", "iters"):
        cmd += [f"--{k}", str(getattr(args, k))]
    if args.impl != "auto":
        cmd += ["--impl", args.impl]
    if args.stages:
        cmd += ["--stages"]
    return subprocess.call(cmd)


def _enable_compile_cache():
    """Persistent XLA compilation cache: repeat CLI invocations skip the
    minutes of TPU compiles (a cold 1000-frame 1080p run spends ~2 min
    compiling the T-length solver alone). Opt out with VSTAB_JAX_CACHE=''.

    Default is per-user (~/.cache/vstab/jax): a shared fixed /tmp path on a
    multi-user box fails on another user's ownership — or shares cache
    contents across users (ADVICE r4, low)."""
    import os

    default = os.path.join(
        os.path.expanduser("~"), ".cache", "vstab", "jax"
    )
    cache = os.environ.get("VSTAB_JAX_CACHE", default)
    if cache:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv=None) -> int:
    import os

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(name)s %(message)s"
    )
    # The axon sitecustomize force-registers the TPU through jax.config, so a
    # plain JAX_PLATFORMS env var is not honored — provide an explicit
    # override (used by CI to pin CLI subprocesses to CPU; see
    # tests/conftest.py for the same dance).
    platform = os.environ.get("VSTAB_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    _enable_compile_cache()
    ap = argparse.ArgumentParser(prog="vstab")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("stabilize", help="stabilize a video file")
    sp.add_argument("input")
    sp.add_argument("output")
    sp.add_argument("--config", help="config JSON (core.config.Config)")
    sp.add_argument("--preset", help="milestone preset name (core.config)")
    sp.add_argument("--crop", choices=["fixed", "auto", "none"])
    sp.add_argument("--method", choices=["affine", "sparse_ls"])
    sp.add_argument("--impl", default="auto", choices=["auto", "pallas", "xla"])
    sp.add_argument("--max-frames", type=int, default=None)
    sp.add_argument("--ckpt-dir", default="ckpts")
    sp.add_argument("--debug", action="store_true",
                    help="run under jax checkify: fail loudly on NaN/Inf/OOB")
    sp.add_argument("--blocked", action="store_true",
                    help="force temporal-block streaming execution")
    sp.add_argument("--block-len", type=int, default=None,
                    help="temporal block length (frames) for the streaming "
                    "path; default cfg.dist.time_block_len")
    sp.add_argument("--no-resume", action="store_true",
                    help="disable the <out>.resume/ block-level checkpoint "
                    "of the streaming path")
    sp.set_defaults(fn=cmd_stabilize)

    ep = sub.add_parser("eval", help="metric sweep over a dataset")
    ep.add_argument("--dataset", default=None,
                    help="DeepStab-layout dir; synthetic fallback if unset")
    ep.add_argument("--results", default="results.jsonl")
    ep.add_argument("--config", help="config JSON")
    ep.add_argument("--preset")
    ep.add_argument("--crop", choices=["fixed", "auto", "none"])
    ep.add_argument("--method", choices=["affine", "sparse_ls"])
    ep.add_argument("--impl", default="auto", choices=["auto", "pallas", "xla"])
    ep.add_argument("--n-synthetic", type=int, default=8)
    ep.add_argument(
        "--synth-shape", type=int, nargs=3, default=(48, 256, 320),
        metavar=("T", "H", "W"),
        help="synthetic-fallback clip shape (contract-scale sweeps: "
        "48 720 1280 / 48 1080 1920)",
    )
    ep.add_argument("--max-frames", type=int, default=None)
    ep.add_argument("--data-parallel", action="store_true",
                    help="shard same-shape clips over the data mesh axis")
    ep.add_argument("--save-videos", default=None)
    ep.set_defaults(fn=cmd_eval)

    bp = sub.add_parser("bench", help="throughput benchmark (bench.py)")
    bp.add_argument("--frames", type=int, default=48)
    bp.add_argument("--height", type=int, default=720)
    bp.add_argument("--width", type=int, default=1280)
    bp.add_argument("--iters", type=int, default=3)
    bp.add_argument("--impl", default="auto", choices=["auto", "pallas", "xla"])
    bp.add_argument("--stages", action="store_true")
    bp.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
