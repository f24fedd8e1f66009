"""DeepStab/NUS evaluation harness (SURVEY.md §2.1 row 16, §3.4;
VERDICT.md r1 missing item 2).

The reference evaluates on the DeepStab benchmark clips [EXT — reference
mount empty, SURVEY.md §0]; this harness:

- enumerates clips from a dataset directory (DeepStab layout `unstable/`,
  or any flat directory of videos), falling back to N synthetic shaky clips
  when no dataset is on disk (none ships in this environment);
- runs the full pipeline per clip and computes the metric triple
  (stability / cropping / distortion, eval/metrics.py);
- appends one JSON line per clip to `results.jsonl` *incrementally* and
  skips already-done clips on rerun (SURVEY.md §5 checkpoint/resume);
- aggregates a BASELINE.md-format report table.

Clip-level data parallelism (BASELINE config 4): `run_sweep(..., data_parallel
=True)` shards same-shape clip batches over the "data" mesh axis with
`NamedSharding` — pure jit DP, no collectives needed beyond what XLA inserts.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

VIDEO_EXTS = (".avi", ".mp4", ".mov", ".mkv", ".m4v")


def enumerate_clips(data_dir: str) -> List[str]:
    """Video files under `data_dir` (prefers an `unstable/` subdir — the
    DeepStab layout — else any videos directly in the directory), sorted."""
    sub = os.path.join(data_dir, "unstable")
    root = sub if os.path.isdir(sub) else data_dir
    if not os.path.isdir(root):
        return []
    vids = [
        os.path.join(root, f)
        for f in sorted(os.listdir(root))
        if f.lower().endswith(VIDEO_EXTS)
    ]
    return vids


def synthetic_clip_set(
    n_clips: int, t: int = 48, h: int = 256, w: int = 320
) -> List[Tuple[str, "np.ndarray"]]:
    """Fallback dataset: named synthetic shaky clips (eval/synthetic.py).

    Every third clip has independently moving textured foreground occluders
    (make_dynamic_clip) — DeepStab's clips are full of pedestrians/cars, so
    a planar-only fallback sweep overstates the metrics (VERDICT r4 item 3)."""
    from vstab.eval.synthetic import make_dynamic_clip, make_shaky_clip

    out = []
    for i in range(n_clips):
        if i % 3 == 2:
            frames, _ = make_dynamic_clip(t=t, h=h, w=w, seed=100 + i)
            name = f"synthetic_dyn_{i:03d}"
        else:
            frames, _ = make_shaky_clip(t=t, h=h, w=w, seed=100 + i)
            name = f"synthetic_{i:03d}"
        out.append((name, np.asarray(frames)))
    return out


def _load_done(results_path: str) -> Dict[str, dict]:
    """Completed-clip records from the manifest. A record counts as done only
    if it parses AND carries the metric payload — torn tail lines from a
    killed run, or half-schema junk, are redone rather than trusted."""
    done = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn tail line from a killed run — redo it
                if isinstance(rec.get("clip"), str) and "stability" in rec:
                    done[rec["clip"]] = rec
    return done


def _append_record(results_path: str, rec: dict) -> None:
    """Append one JSONL record, healing a torn tail first: a run killed
    mid-write leaves a final line with no newline — appending directly onto
    it would swallow THIS record into the garbage line (found by
    tests/eval/test_resume.py fault injection)."""
    need_nl = False
    try:
        with open(results_path, "rb") as f:
            f.seek(-1, os.SEEK_END)
            need_nl = f.read(1) != b"\n"
    except OSError:  # missing file, or empty file (negative seek raises)
        pass
    with open(results_path, "a") as f:
        if need_nl:
            f.write("\n")
        f.write(json.dumps(rec) + "\n")


def _iter_clips(
    data_dir: Optional[str],
    n_synthetic: int,
    max_frames: Optional[int],
    synth_shape: Tuple[int, int, int],
) -> Iterator[Tuple[str, np.ndarray, float]]:
    """Yields (name, frames [T,H,W,3] f32, fps)."""
    paths = enumerate_clips(data_dir) if data_dir else []
    if paths:
        from vstab.io.video import read_video

        for p in paths:
            frames, fps = read_video(p, max_frames=max_frames)
            yield os.path.basename(p), frames, fps
    else:
        t, h, w = synth_shape
        if max_frames is not None:
            t = min(t, max_frames)
        for name, frames in synthetic_clip_set(n_synthetic, t=t, h=h, w=w):
            yield name, frames, 30.0


def evaluate_clip(frames: np.ndarray, params, cfg) -> Tuple[dict, np.ndarray]:
    """Stabilize one clip and compute metrics. Returns (record, out_frames)."""
    import jax

    from vstab.eval.metrics import evaluate_videos
    from vstab.pipeline import stabilize

    t0 = time.perf_counter()
    out, _ = stabilize(jax.numpy.asarray(frames), params, cfg)
    out = np.asarray(jax.block_until_ready(out))
    wall = time.perf_counter() - t0
    rec = evaluate_videos(frames, out)
    rec["frames"] = int(frames.shape[0])
    rec["fps"] = round(frames.shape[0] / wall, 3)
    rec["wall_s"] = round(wall, 3)
    return rec, out


def run_sweep(
    data_dir: Optional[str],
    results_path: str,
    cfg=None,
    params=None,
    n_synthetic: int = 8,
    max_frames: Optional[int] = None,
    synth_shape: Tuple[int, int, int] = (48, 256, 320),
    data_parallel: bool = False,
    save_videos_dir: Optional[str] = None,
) -> List[dict]:
    """Per-clip metric sweep with JSONL incremental resume (SURVEY.md §3.4).

    Already-present clips in `results_path` are skipped; each finished clip
    is appended immediately, so a killed sweep resumes at clip granularity.
    """
    import jax

    from vstab.core.config import Config
    from vstab.pipeline import default_params

    cfg = cfg if cfg is not None else Config()
    params = params if params is not None else default_params(cfg)
    done = _load_done(results_path)
    results = list(done.values())

    clips = list(_iter_clips(data_dir, n_synthetic, max_frames, synth_shape))
    todo = [(n, f, fps) for n, f, fps in clips if n not in done]

    if data_parallel and todo:
        recs = _run_dp_batches(todo, params, cfg, results_path, save_videos_dir)
        results.extend(recs)
        return results

    os.makedirs(os.path.dirname(results_path) or ".", exist_ok=True)
    for name, frames, fps in todo:
        rec, out = evaluate_clip(frames, params, cfg)
        rec = {"clip": name, **rec}
        _append_record(results_path, rec)
        if save_videos_dir:
            from vstab.io.video import write_video

            os.makedirs(save_videos_dir, exist_ok=True)
            write_video(
                os.path.join(save_videos_dir, f"{name}.stab.mp4"), out, fps
            )
        results.append(rec)
    return results


def _run_dp_batches(
    todo, params, cfg, results_path: str, save_videos_dir: Optional[str]
) -> List[dict]:
    """Clip-level DP (BASELINE config 4): group same-shape clips, stack to
    [B,T,H,W,3], shard B over the "data" mesh axis, vmapped stabilize."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vstab.eval.metrics import evaluate_videos
    from vstab.pipeline import stabilize_batch

    n_dev = max(1, len(jax.devices()))
    mesh = Mesh(np.asarray(jax.devices()).reshape(n_dev), ("data",))

    by_shape: Dict[tuple, list] = {}
    for item in todo:
        by_shape.setdefault(item[1].shape, []).append(item)

    # stabilize_batch (not vmap(stabilize)): the adaptive displacement bound
    # is picked host-side per batch, so strong-shake clips render identically
    # to the serial sweep instead of silently falling back to the static
    # d=16 under vmap (VERDICT r4 item 7).
    results = []
    os.makedirs(os.path.dirname(results_path) or ".", exist_ok=True)
    for shape, items in by_shape.items():
        for i in range(0, len(items), n_dev):
            group = items[i : i + n_dev]
            b = len(group)
            batch = np.stack([f for _, f, _ in group])
            if b % n_dev:  # pad the ragged tail batch
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], n_dev - b % n_dev, 0)]
                )
            sharding = NamedSharding(mesh, P("data"))
            t0 = time.perf_counter()
            out = stabilize_batch(
                jax.device_put(jnp.asarray(batch), sharding), params, cfg
            )
            out = np.asarray(jax.block_until_ready(out))[:b]
            wall = time.perf_counter() - t0
            for (name, frames, fps), o in zip(group, out):
                rec = {"clip": name, **evaluate_videos(frames, o)}
                # Amortized per-clip accounting so DP and serial tables are
                # comparable (ADVICE.md r2, low): the clip's share of the
                # batch wall is wall/b, hence fps = frames/(wall/b); the raw
                # batch wall is kept under batch_wall_s.
                rec["frames"] = int(frames.shape[0])
                rec["batch"] = b
                rec["fps"] = round(frames.shape[0] / (wall / b), 3)
                rec["wall_s"] = round(wall / b, 3)
                rec["batch_wall_s"] = round(wall, 3)
                _append_record(results_path, rec)
                if save_videos_dir:
                    from vstab.io.video import write_video

                    os.makedirs(save_videos_dir, exist_ok=True)
                    write_video(
                        os.path.join(save_videos_dir, f"{name}.stab.mp4"),
                        o, fps,
                    )
                results.append(rec)
    return results


def aggregate(results: Sequence[dict]) -> dict:
    """Mean metric triple + throughput over a sweep's records."""
    if not results:
        return {}
    keys = ("stability", "cropping", "distortion", "fps")
    return {
        k: round(float(np.mean([r[k] for r in results if k in r])), 4)
        for k in keys
    }


def report_table(results: Sequence[dict]) -> str:
    """BASELINE.md-format report table."""
    lines = [
        "| Clip | Stability | Cropping | Distortion | frames/s |",
        "|---|---|---|---|---|",
    ]
    for r in sorted(results, key=lambda r: r["clip"]):
        lines.append(
            f"| {r['clip']} | {r['stability']:.3f} | {r['cropping']:.3f} "
            f"| {r['distortion']:.3f} | {r.get('fps', float('nan')):.1f} |"
        )
    agg = aggregate(results)
    if agg:
        lines.append(
            f"| **mean** | **{agg['stability']:.3f}** | **{agg['cropping']:.3f}**"
            f" | **{agg['distortion']:.3f}** | **{agg['fps']:.1f}** |"
        )
    return "\n".join(lines)


__all__ = [
    "enumerate_clips",
    "synthetic_clip_set",
    "evaluate_clip",
    "run_sweep",
    "aggregate",
    "report_table",
]
