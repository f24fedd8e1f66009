"""Metric tests incl. cv2 conformance (SURVEY.md §4 "Metric conformance")."""

import jax.numpy as jnp
import numpy as np

from vstab.core.types import compose_affine, invert_affine
from vstab.eval.metrics import (
    cropping_ratio,
    distortion_score,
    estimate_pair_transforms_cv,
    stability_score,
)
from vstab.eval.synthetic import jitter_trajectory, make_shaky_clip


def _pairs_of(path):
    return compose_affine(invert_affine(path[1:]), path[:-1])


def _translations(tx, ty=None, ang=None):
    t = len(tx)
    out = np.repeat(np.eye(2, 3, dtype=np.float32)[None], t, axis=0)
    out[:, 0, 2] = tx
    if ty is not None:
        out[:, 1, 2] = ty
    if ang is not None:
        out[:, 0, 0] = np.cos(ang)
        out[:, 0, 1] = -np.sin(ang)
        out[:, 1, 0] = np.sin(ang)
        out[:, 1, 1] = np.cos(ang)
    return jnp.asarray(out)


def test_stability_smooth_beats_shaky():
    # stability_score takes PAIR transforms and accumulates them into the
    # camera path; build pairs as diffs of a known path.
    t = np.arange(121)
    rng = np.random.default_rng(0)
    # Low-frequency intended motion in all three components; jitter adds
    # comparable white-noise energy to each.
    px = 30 * np.sin(2 * np.pi * 2 * t / 121)
    py = 20 * np.cos(2 * np.pi * 2 * t / 121)
    pa = 0.05 * np.sin(2 * np.pi * 3 * t / 121)
    s_smooth = float(
        stability_score(_translations(np.diff(px), np.diff(py), np.diff(pa)))
    )
    s_shaky = float(
        stability_score(
            _translations(
                np.diff(px + rng.normal(0, 20, 121)),
                np.diff(py + rng.normal(0, 15, 121)),
                np.diff(pa + rng.normal(0, 0.04, 121)),
            )
        )
    )
    assert s_smooth > 0.9
    assert s_shaky < 0.7
    assert s_smooth > s_shaky + 0.2


def test_cropping_ratio_known_zoom():
    t = 10
    tr = np.repeat((0.8 * np.eye(2, 3)).astype(np.float32)[None], t, axis=0)
    tr[:, :, 2] = 0
    assert abs(float(cropping_ratio(jnp.asarray(tr))) - 0.8) < 1e-4


def test_distortion_known_anisotropy():
    tr = np.repeat(np.eye(2, 3, dtype=np.float32)[None], 5, axis=0)
    tr[2, 0, 0] = 0.5  # squeeze x by half in one frame
    assert abs(float(distortion_score(jnp.asarray(tr))) - 0.5) < 1e-4
    tr2 = np.repeat(np.eye(2, 3, dtype=np.float32)[None], 5, axis=0)
    assert abs(float(distortion_score(jnp.asarray(tr2))) - 1.0) < 1e-5


def test_metric_invariant_to_brightness():
    frames, _ = make_shaky_clip(t=16, h=96, w=128, seed=5)
    bright = jnp.clip(frames * 1.3 + 0.05, 0, 1)
    t1 = estimate_pair_transforms_cv(np.asarray(frames))
    t2 = estimate_pair_transforms_cv(np.asarray(bright))
    s1 = float(stability_score(jnp.asarray(t1)))
    s2 = float(stability_score(jnp.asarray(t2)))
    assert abs(s1 - s2) < 0.1


def test_cv2_conformance_with_analytic_transforms():
    """cv2-tracked pair transforms must match the known synthetic cameras."""
    frames, cams = make_shaky_clip(t=24, h=160, w=192, seed=7)
    tracked = estimate_pair_transforms_cv(np.asarray(frames))
    analytic = np.asarray(_pairs_of(cams))
    # translations agree to sub-pixel on average
    err = np.abs(tracked[:, :, 2] - analytic[:, :, 2])
    assert np.median(err) < 0.5
    s_tracked = float(stability_score(jnp.asarray(tracked)))
    s_analytic = float(stability_score(jnp.asarray(analytic)))
    assert abs(s_tracked - s_analytic) < 0.15


def test_tracker_stability_matches_ground_truth_on_low_texture():
    """Metric conformance against the KNOWN synthetic trajectory (SURVEY.md
    §4): on low-texture perlin content the KLT tracker must reproduce the
    true input stability closely (round-4 calibration: true 0.251 vs
    tracked 0.251 at seed 7 — it is the self-similar checker texture where
    tracker aliasing inflates scores, not perlin that deflates them)."""
    import jax.numpy as jnp
    import numpy as np

    from vstab.eval.metrics import estimate_pair_transforms_cv, stability_score
    from vstab.eval.synthetic import make_shaky_clip

    frames, cams = make_shaky_clip(t=48, h=160, w=192, seed=7, scene_kind="perlin")
    est = estimate_pair_transforms_cv(np.asarray(frames))
    true = []
    for i in range(len(cams) - 1):
        a0 = np.vstack([cams[i], [0, 0, 1]])
        a1 = np.vstack([cams[i + 1], [0, 0, 1]])
        true.append((np.linalg.inv(a0) @ a1)[:2])
    s_est = float(stability_score(jnp.asarray(est)))
    s_true = float(stability_score(jnp.asarray(np.stack(true), jnp.float32)))
    assert abs(s_est - s_true) < 0.08, (s_est, s_true)


def test_video_distortion_detects_anisotropy():
    """VERDICT r4 item 2: the video-based distortion metric must MEASURE
    distortion. Round 4 fitted cross-transforms with estimateAffinePartial2D
    (similarity-only), whose singular values are equal by construction —
    every output scored exactly 1.0. With the full 6-DOF fit, a deliberately
    0.8x-anisotropic output must score ~0.8 and an identity output ~1.0."""
    import cv2
    import numpy as np

    from vstab.eval.metrics import (
        distortion_score,
        estimate_cross_transforms_cv,
    )
    from vstab.eval.synthetic import make_scene

    h, w, t = 160, 192, 4
    frames = np.stack(
        [make_scene("checker", h, w, seed=s) for s in range(t)]
    ).astype(np.float32)
    # anisotropic output: x squeezed to 0.8 about the frame center
    aniso = np.array([[0.8, 0.0, 0.1 * (w - 1) / 2], [0.0, 1.0, 0.0]])
    out_frames = np.stack(
        [
            cv2.warpAffine(f, aniso, (w, h), flags=cv2.INTER_LINEAR)
            for f in frames
        ]
    )
    cross = estimate_cross_transforms_cv(frames, out_frames)
    d = float(distortion_score(np.asarray(cross)))
    assert 0.7 < d < 0.9, f"anisotropic output scored {d:.3f} (blind metric)"

    cross_id = estimate_cross_transforms_cv(frames, frames)
    d_id = float(distortion_score(np.asarray(cross_id)))
    assert d_id > 0.97, f"identity output scored {d_id:.3f}"
