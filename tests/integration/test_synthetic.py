"""Golden integration test: synthetic shaken clip through the full smoothing
and rendering stack with analytic flow (SURVEY.md §4 "Golden / integration").

Uses ground-truth flow derived from the known jitter so it validates the
smoothing + rendering machinery independently of flow-net training.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vstab.core.config import Config, RenderConfig, SmoothConfig
from vstab.core.types import compose_affine, invert_affine
from vstab.eval.metrics import evaluate_videos
from vstab.eval.synthetic import make_shaky_clip
from vstab.pipeline import smooth_and_render
from vstab.render.render import affine_to_flow


@pytest.fixture(scope="module")
def shaky_clip():
    t, h, w = 48, 160, 192
    frames, cams = make_shaky_clip(t=t, h=h, w=w, seed=3)
    pair = compose_affine(invert_affine(cams[1:]), cams[:-1])
    flow = affine_to_flow(pair, h, w)
    return frames, cams, flow


@pytest.mark.parametrize("method", ["affine", "sparse_ls"])
def test_stabilization_quality(shaky_clip, method):
    frames, cams, flow = shaky_clip
    cfg = Config(
        smooth=SmoothConfig(method=method),
        render=RenderConfig(crop_mode="fixed", fixed_crop_ratio=0.8),
    )
    out, _ = smooth_and_render(frames, flow, cfg)
    m = evaluate_videos(np.asarray(frames), np.asarray(out))
    m_in = evaluate_videos(np.asarray(frames), np.asarray(frames))
    assert m["stability"] > 0.85, m
    assert m["stability"] > m_in["stability"] + 0.25
    assert m["cropping"] > 0.75
    assert m["distortion"] > 0.95


def test_still_clip_is_near_identity():
    """Stabilizing an already-still clip must be ≈ identity (SURVEY.md §4)."""
    from vstab.eval.synthetic import checker_scene

    scene = checker_scene(96, 128, seed=1)
    frames = jnp.broadcast_to(scene, (12, 96, 128, 3))
    flow = jnp.zeros((11, 96, 128, 2))
    cfg = Config(
        smooth=SmoothConfig(method="sparse_ls"),
        render=RenderConfig(crop_mode="none"),
    )
    out, _ = smooth_and_render(frames, flow, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(frames), atol=1e-2)


def test_output_shape_and_range(shaky_clip):
    frames, cams, flow = shaky_clip
    cfg = Config(smooth=SmoothConfig(method="sparse_ls"))
    out, diags = smooth_and_render(frames, flow, cfg)
    assert out.shape == frames.shape
    assert float(out.min()) >= -1e-4 and float(out.max()) <= 1.0 + 1e-4
    assert np.isfinite(np.asarray(out)).all()
