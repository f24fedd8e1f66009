"""Clip-level data-parallel sweep (BASELINE config 4; VERDICT r3 missing-5):
`run_sweep(data_parallel=True)` on the 8-virtual-device CPU mesh, with a
ragged tail batch (9 clips over 8 devices), must produce the same metrics as
the serial sweep and resume cleanly."""

import json

import jax
import numpy as np
import pytest

from vstab.core.config import Config, FlowConfig, RenderConfig, SmoothConfig
from vstab.eval.deepstab import _load_done, run_sweep
from vstab.pipeline import default_params

N_CLIPS = 9  # > device count -> exercises the padded ragged tail batch


def _cfg():
    return Config(
        flow=FlowConfig(
            pyramid_channels=(8, 12, 16),
            estimator_channels=(16, 12),
            kernel_impl="xla",
            compute_dtype="float32",
            output_level=1,
        ),
        smooth=SmoothConfig(method="sparse_ls", grid_size=(4, 4)),
        render=RenderConfig(crop_mode="fixed", kernel_impl="xla"),
    )


@pytest.fixture(scope="module")
def sweeps(tmp_path_factory):
    assert jax.device_count() >= 8, "conftest must provide the 8-device mesh"
    cfg = _cfg()
    params = default_params(cfg, seed=0, ckpt_dir="/nonexistent")
    root = tmp_path_factory.mktemp("dp")
    kw = dict(
        cfg=cfg, params=params, n_synthetic=N_CLIPS,
        synth_shape=(9, 48, 64),
    )
    serial = run_sweep(None, str(root / "serial.jsonl"), **kw)
    dp_path = str(root / "dp.jsonl")
    dp = run_sweep(None, dp_path, data_parallel=True, **kw)
    return serial, dp, dp_path, kw


def test_dp_covers_all_clips_once(sweeps):
    _, dp, dp_path, _ = sweeps
    names = [r["clip"] for r in dp]
    want = sorted(
        f"synthetic_dyn_{i:03d}" if i % 3 == 2 else f"synthetic_{i:03d}"
        for i in range(N_CLIPS)
    )
    assert sorted(names) == want
    # manifest holds exactly one parseable record per clip
    with open(dp_path) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    assert len(recs) == N_CLIPS


def test_dp_metrics_match_serial(sweeps):
    serial, dp, _, _ = sweeps
    s = {r["clip"]: r for r in serial}
    d = {r["clip"]: r for r in dp}
    for name in s:
        for k in ("stability", "cropping", "distortion"):
            assert abs(s[name][k] - d[name][k]) < 5e-3, (name, k, s[name][k], d[name][k])


def test_dp_strong_shake_adaptive_bound(tmp_path):
    """VERDICT r4 item 7: a strong-shake clip in a DP batch must render with
    the ADAPTIVE displacement bucket (the round-4 vmap path silently fell
    back to d=16 and border-filled it). stabilize_batch must (a) actually
    pick a bucket > 16 for this clip, and (b) match the serial adaptive
    render bit-for-bit for the bucket-determining clip."""
    import jax.numpy as jnp

    from vstab.eval.synthetic import make_shaky_clip
    from vstab.pipeline import (
        clip_flow,
        path_to_flow,
        smooth_paths,
        stabilize,
        stabilize_batch,
    )
    from vstab.render.render import (
        pick_max_disp,
        render_stabilized,
        residual_disp_bound,
    )

    # The trained checkpoint (committed): a random-init net estimates ~zero
    # flow, so no solved path could ever exceed the 16px floor.
    # f32 compute: under bf16 the vmapped and serial flow programs differ by
    # reassociation noise, which moves the warp by ~0.1px on textured content
    # — irrelevant to the plumbing this test pins.
    cfg = Config(
        flow=FlowConfig(compute_dtype="float32", kernel_impl="xla"),
        render=RenderConfig(kernel_impl="xla"),
    )
    params = default_params(cfg)
    t, h, w = 12, 96, 128
    strong, _ = make_shaky_clip(
        t=t, h=h, w=w, seed=5, shake_px=6.0, shake_angle=0.15
    )
    mild, _ = make_shaky_clip(t=t, h=h, w=w, seed=6, shake_px=1.0,
                              shake_angle=0.002)
    batch = jnp.asarray(np.stack([strong, mild]))

    # Guard: the strong clip's solved path really exceeds the static floor.
    flow = clip_flow(params, batch[0], cfg)
    path, _ = smooth_paths(flow, cfg, (h, w))
    bound = residual_disp_bound(np.asarray(path), h, w, cfg.smooth.method)
    assert bound > 16.0, f"scenario too mild (bound={bound:.1f}px)"
    d = pick_max_disp(bound, cfg.render)

    out = np.asarray(stabilize_batch(batch, params, cfg))
    # The strong clip determines the batch bucket -> DP must equal serial.
    serial_strong, _ = stabilize(batch[0], params, cfg)
    np.testing.assert_allclose(out[0], np.asarray(serial_strong), atol=1e-5)
    # The mild clip renders under the batch bucket (>= its own) — compare
    # against the manual render at that bucket.
    flow_m = clip_flow(params, batch[1], cfg)
    path_m, _ = smooth_paths(flow_m, cfg, (h, w))
    want_m = render_stabilized(
        batch[1], path_to_flow(path_m, cfg, (h, w)), cfg.render, max_disp=d
    )
    np.testing.assert_allclose(out[1], np.asarray(want_m), atol=1e-5)


def test_dp_tail_batch_records_batch_size(sweeps):
    _, dp, _, _ = sweeps
    batches = {r["clip"]: r["batch"] for r in dp}
    sizes = sorted(set(batches.values()))
    assert sizes == [1, 8], sizes  # 8-clip full batch + 1-clip ragged tail


def test_dp_resume_skips_done(sweeps):
    _, dp, dp_path, kw = sweeps
    assert len(_load_done(dp_path)) == N_CLIPS
    again = run_sweep(None, dp_path, data_parallel=True, **kw)
    assert len(again) == N_CLIPS
    with open(dp_path) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    assert len(recs) == N_CLIPS, "resume re-ran finished clips"
