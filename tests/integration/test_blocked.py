"""Temporal-block streaming pipeline (M3) tests.

The blocked pipeline's global path solve makes blocked == whole-clip
*exactly* (same flow per pair, same solve, same crop scale) — strictly
stronger than the survey's C¹ seam-continuity bar (SURVEY.md §7 M3):
if outputs match everywhere, there is no seam at any block boundary.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from vstab.core.config import Config, FlowConfig, RenderConfig, SmoothConfig
from vstab.eval.synthetic import make_shaky_clip
from vstab.pipeline import default_params, stabilize
from vstab.pipeline_blocked import stabilize_blocked, stabilize_video_blocked


def _cfg(method="sparse_ls", crop="auto"):
    return Config(
        flow=FlowConfig(
            pyramid_channels=(8, 12, 16),
            estimator_channels=(16, 12),
            kernel_impl="xla",
            compute_dtype="float32",
            output_level=1,
        ),
        smooth=SmoothConfig(method=method),
        render=RenderConfig(crop_mode=crop, kernel_impl="xla"),
    )


@pytest.fixture(scope="module")
def clip():
    frames, _ = make_shaky_clip(t=21, h=48, w=64, seed=5)
    return np.asarray(frames)


@pytest.mark.parametrize("method", ["affine", "sparse_ls"])
@pytest.mark.parametrize("crop", ["auto", "fixed", "none"])
def test_blocked_matches_unblocked(clip, method, crop):
    cfg = _cfg(method, crop)
    params = default_params(cfg, seed=0, ckpt_dir="/nonexistent")
    ref, _ = stabilize(jnp.asarray(clip), params, cfg)
    out = stabilize_blocked(clip, params, cfg, block_len=8)
    np.testing.assert_allclose(out, np.asarray(ref), atol=2e-3)


def test_blocked_uneven_tail(clip):
    """T not a multiple of block_len; tail block is padded + sliced."""
    cfg = _cfg()
    params = default_params(cfg, seed=0, ckpt_dir="/nonexistent")
    ref, _ = stabilize(jnp.asarray(clip), params, cfg)
    out = stabilize_blocked(clip, params, cfg, block_len=13)
    np.testing.assert_allclose(out, np.asarray(ref), atol=2e-3)


def test_video_file_roundtrip(tmp_path, clip):
    """File-to-file streaming path: covers io/video read/write/chunks too
    (VERDICT.md r1 'What's weak' 5)."""
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from vstab.io.video import read_video, write_video

    src = str(tmp_path / "in.mp4")
    dst = str(tmp_path / "out.mp4")
    write_video(src, clip, fps=24.0)
    back, fps = read_video(src)
    assert back.shape == clip.shape
    assert abs(fps - 24.0) < 0.5
    # codec quantization: uint8 + lossy mp4v, stay loose
    assert np.mean(np.abs(back - clip)) < 0.1

    cfg = _cfg(crop="fixed")
    params = default_params(cfg, seed=0, ckpt_dir="/nonexistent")
    stats = stabilize_video_blocked(src, dst, params, cfg, block_len=8)
    assert stats["frames"] == clip.shape[0]
    out, _ = read_video(dst)
    assert out.shape == clip.shape
    assert np.isfinite(out).all()


def test_blocked_bounded_memory_shapes():
    """The jitted block stages only ever see [block_len(+1)]-shaped inputs —
    peak device memory is O(block), not O(T)."""
    from vstab import pipeline_blocked as pb

    cfg = _cfg(crop="fixed")
    params = default_params(cfg, seed=0, ckpt_dir="/nonexistent")
    frames, _ = make_shaky_clip(t=30, h=32, w=48, seed=2)
    seen = []
    orig = pb._block_motion

    def spy(p, blk, c):
        seen.append(tuple(blk.shape))
        return orig(p, blk, c)

    pb_block_motion = pb._block_motion
    pb._block_motion = spy
    try:
        stabilize_blocked(np.asarray(frames), params, cfg, block_len=8)
    finally:
        pb._block_motion = pb_block_motion
    assert set(seen) == {(9, 32, 48, 3)}, seen


def test_render_rechunk_matches_unblocked(clip, monkeypatch):
    """The resolution-adaptive render re-chunk (4K HBM fit) must not change
    output: force a tiny pixel budget so render dispatches are 3 frames
    while motion blocks stay 8, and compare against the whole-clip path."""
    import vstab.pipeline_blocked as pb

    monkeypatch.setattr(
        pb, "_RENDER_PX_FRAMES_BUDGET", 3 * clip.shape[1] * clip.shape[2]
    )
    cfg = _cfg("sparse_ls", "auto")
    params = default_params(cfg, seed=0, ckpt_dir="/nonexistent")
    ref, _ = stabilize(jnp.asarray(clip), params, cfg)
    out = stabilize_blocked(clip, params, cfg, block_len=8)
    np.testing.assert_allclose(out, np.asarray(ref), atol=2e-3)
