"""Synthetic shaken-clip generator (SURVEY.md §4 "Golden / integration").

Renders a procedurally textured scene through a jittering virtual camera with
a *known* jitter trajectory — ground truth for integration tests and for the
benchmark harness when no DeepStab data is on disk (reference dataset is not
shipped in this environment; SURVEY.md §0).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def checker_scene(h: int, w: int, seed: int = 0) -> np.ndarray:
    """A detailed static scene: multi-scale noise + gradients, [H,W,3].

    Host-side numpy (test/bench data generation never touches the device)."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img[..., 0] = 0.5 + 0.5 * np.sin(xx / 13.0) * np.cos(yy / 17.0)
    img[..., 1] = 0.5 + 0.5 * np.cos(xx / 7.0 + yy / 11.0)
    img[..., 2] = (xx / w + yy / h) / 2.0
    for scale in (4, 16, 64):
        small = rng.random((h // scale + 2, w // scale + 2, 3)).astype(np.float32)
        big = np.kron(small, np.ones((scale, scale, 1), np.float32))[:h, :w]
        img += 0.25 * (big - 0.5)
    return np.clip(img, 0.0, 1.0)


def jitter_trajectory(
    t: int,
    seed: int = 0,
    walk_px: float = 3.0,
    shake_px: float = 6.0,
    shake_angle: float = 0.01,
) -> np.ndarray:
    """Known camera trajectory [T,2,3]: smooth drift + high-frequency shake."""
    rng = np.random.default_rng(seed)
    drift = np.cumsum(rng.normal(0.0, walk_px * 0.2, size=(t, 2)), axis=0)
    # Smooth the drift so it is a legitimate "intended" motion.
    k = np.exp(-0.5 * (np.arange(-15, 16) / 6.0) ** 2)
    k /= k.sum()
    drift = np.stack(
        [np.convolve(np.pad(d, 15, mode="edge"), k, "valid") for d in drift.T],
        axis=1,
    )
    shake = rng.normal(0.0, shake_px, size=(t, 2))
    ang = rng.normal(0.0, shake_angle, size=(t,))
    transforms = np.zeros((t, 2, 3), np.float32)
    ca, sa = np.cos(ang), np.sin(ang)
    transforms[:, 0, 0] = ca
    transforms[:, 0, 1] = -sa
    transforms[:, 1, 0] = sa
    transforms[:, 1, 1] = ca
    transforms[:, :, 2] = drift + shake
    return transforms


def _render_frame(
    scene: np.ndarray, cam: np.ndarray, h: int, w: int
) -> np.ndarray:
    """Render one [h,w,3] frame: pixel p shows scene point cam(p), bilinear.

    Pure numpy on host: the round-2 JAX version ran flattened-gather taps on
    the TPU — minutes of device time just to SYNTHESIZE the bench input
    (gathers are pathological on TPU; the pipeline avoids them for exactly
    this reason, kernels/warp1d.py). Data generation belongs on the host."""
    try:  # OpenCV's C++ resampler is ~50x the numpy path (bench startup)
        import cv2

        return cv2.warpAffine(
            scene,
            cam.astype(np.float64),
            (w, h),
            flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
            borderMode=cv2.BORDER_REPLICATE,
        )
    except ImportError:
        pass
    sh, sw, c = scene.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    sx = cam[0, 0] * xx + cam[0, 1] * yy + cam[0, 2]
    sy = cam[1, 0] * xx + cam[1, 1] * yy + cam[1, 2]
    x0 = np.floor(sx)
    y0 = np.floor(sy)
    fx, fy = sx - x0, sy - y0
    x0 = x0.astype(np.int32)
    y0 = y0.astype(np.int32)

    def tap(yi, xi):
        yi = np.clip(yi, 0, sh - 1)
        xi = np.clip(xi, 0, sw - 1)
        return scene[yi, xi]  # numpy fancy-index gather, [h,w,3]

    return (
        ((1 - fx) * (1 - fy))[..., None] * tap(y0, x0)
        + (fx * (1 - fy))[..., None] * tap(y0, x0 + 1)
        + ((1 - fx) * fy)[..., None] * tap(y0 + 1, x0)
        + (fx * fy)[..., None] * tap(y0 + 1, x0 + 1)
    )


def make_shaky_clip(
    t: int = 30,
    h: int = 256,
    w: int = 320,
    seed: int = 0,
    **jitter_kw,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (frames [T,H,W,3] f32, true camera transforms [T,2,3]), both
    host numpy arrays (callers jnp.asarray what they feed the device).

    Frame t is the scene viewed through camera C_t: frame pixel p shows
    scene point C_t(p). The scene is larger than the frame so borders stay
    valid. Rendered per frame at the OUTPUT resolution (the round-1 version
    materialized T full 2x-margin warped scenes at once and OOM'd)."""
    margin_y, margin_x = h // 2, w // 2
    scene = checker_scene(h + 2 * margin_y, w + 2 * margin_x, seed=seed)
    cams = jitter_trajectory(t, seed=seed, **jitter_kw)
    # Offset camera so frame (0,0) maps into the scene interior.
    cams_scene = cams.copy()
    cams_scene[:, :, 2] += np.asarray([margin_x, margin_y], np.float32)
    frames = np.stack(
        [_render_frame(scene, cam, h, w) for cam in cams_scene], axis=0
    )
    return frames.astype(np.float32), cams


__all__ = ["checker_scene", "jitter_trajectory", "make_shaky_clip"]
