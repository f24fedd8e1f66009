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
    assert sorted(names) == [f"synthetic_{i:03d}" for i in range(N_CLIPS)]
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
            # DP batches render under vmap (static-cfg displacement bound)
            # while the serial path adapts it; on these mild synthetic clips
            # both pick the same bound and metrics agree tightly.
            assert abs(s[name][k] - d[name][k]) < 5e-3, (name, k, s[name][k], d[name][k])


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
