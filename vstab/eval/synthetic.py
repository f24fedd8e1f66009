"""Synthetic shaken-clip generator (SURVEY.md §4 "Golden / integration").

Renders a procedurally textured scene through a jittering virtual camera with
a *known* jitter trajectory — ground truth for integration tests and for the
benchmark harness when no DeepStab data is on disk (reference dataset is not
shipped in this environment; SURVEY.md §0).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def checker_scene(h: int, w: int, seed: int = 0) -> Array:
    """A detailed static scene: multi-scale noise + gradients, [H,W,3]."""
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
    return jnp.asarray(np.clip(img, 0.0, 1.0))


def jitter_trajectory(
    t: int,
    seed: int = 0,
    walk_px: float = 3.0,
    shake_px: float = 6.0,
    shake_angle: float = 0.01,
) -> Array:
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
    return jnp.asarray(transforms)


def _render_frame(scene: Array, cam: Array, h: int, w: int) -> Array:
    """Render one [h,w,3] frame: pixel p shows scene point cam(p), bilinear."""
    sh, sw, c = scene.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = cam[0, 0] * xx + cam[0, 1] * yy + cam[0, 2]
    sy = cam[1, 0] * xx + cam[1, 1] * yy + cam[1, 2]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx, fy = sx - x0, sy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def tap(yi, xi):
        yi = jnp.clip(yi, 0, sh - 1)
        xi = jnp.clip(xi, 0, sw - 1)
        lin = (yi * sw + xi).reshape(-1)
        return jnp.take(scene.reshape(sh * sw, c), lin, axis=0).reshape(h, w, c)

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
) -> Tuple[Array, Array]:
    """Returns (frames [T,H,W,3], true camera transforms [T,2,3]).

    Frame t is the scene viewed through camera C_t: frame pixel p shows
    scene point C_t(p). The scene is larger than the frame so borders stay
    valid. Rendered one frame at a time (lax.map) directly at the OUTPUT
    resolution — the round-1 version warped the full 2x-margin scene for all
    T frames at once and OOM'd the 48x720p bench config (VERDICT.md item 1).
    """
    margin_y, margin_x = h // 2, w // 2
    scene = checker_scene(h + 2 * margin_y, w + 2 * margin_x, seed=seed)
    cams = jitter_trajectory(t, seed=seed, **jitter_kw)
    # Offset camera so frame (0,0) maps into the scene interior.
    offset = jnp.asarray([margin_x, margin_y], jnp.float32)
    cams_scene = cams.at[:, :, 2].add(offset)
    render = jax.jit(
        lambda cs: jax.lax.map(
            lambda cam: _render_frame(scene, cam, h, w), cs
        )
    )
    frames = render(cams_scene)
    return frames, cams


__all__ = ["checker_scene", "jitter_trajectory", "make_shaky_clip"]
