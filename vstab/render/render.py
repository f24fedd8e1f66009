"""Full-frame stabilized renderer (SURVEY.md §2.1 "Full-frame renderer").

Consumes either per-frame affine warps [T,2,3] (affine smoothing path) or
per-frame grid displacement fields [T,GH,GW,2] (sparse-LS path), converts to
dense backward-warp flow, samples through the bilinear-warp kernel, and
applies the crop policy.

Crop policy is implemented as a zoom transform composed into the warp, so
output shapes stay static under jit:
- 'fixed': keep the central `fixed_crop_ratio` of the frame.
- 'auto' : per-clip zoom chosen (as a traced scalar) so every frame's border
           stays inside the valid region.
- 'none' : no zoom; invalid borders filled with `border_value`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vstab.core.config import RenderConfig
from vstab.core.types import apply_affine
from vstab.kernels import bilinear_warp_xla, warp_validity

Array = jax.Array


def _base_grid(h: int, w: int):
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return xx, yy


def affine_to_flow(transforms: Array, h: int, w: int) -> Array:
    """[T,2,3] output->input affines -> backward-warp flow [T,H,W,2]."""
    xx, yy = _base_grid(h, w)
    pts = jnp.stack([xx, yy], axis=-1)  # [H,W,2]
    mapped = jax.vmap(lambda a: apply_affine(a[None, None], pts))(transforms)
    return mapped - pts[None]


def grid_to_flow(disp: Array, h: int, w: int) -> Array:
    """[T,GH,GW,2] vertex displacement grid -> dense flow [T,H,W,2].

    Bilinear upsampling of the control grid; vertices are placed at cell
    centers spanning the full frame (align_corners=True semantics).
    """
    t = disp.shape[0]
    return jax.image.resize(disp, (t, h, w, 2), method="bilinear")


def _zoom_transform(scale: Array, h: int, w: int) -> Array:
    """Affine mapping output coords -> pre-zoom coords, zoom about center."""
    cx = (w - 1) / 2.0
    cy = (h - 1) / 2.0
    s = jnp.asarray(scale, jnp.float32)
    zero = jnp.zeros_like(s)
    row0 = jnp.stack([s, zero, cx * (1.0 - s)])
    row1 = jnp.stack([zero, s, cy * (1.0 - s)])
    return jnp.stack([row0, row1])


def _compose_zoom(flow: Array, scale: Array) -> Array:
    """Compose a centered zoom into a dense backward-warp flow field.

    new_flow(p) = Z(p) + flow_interp(Z(p)) - p; since Z is affine and flow is
    smooth, we approximate flow_interp(Z(p)) by bilinearly warping the flow
    field itself by the zoom (exact for affine flows).
    """
    t, h, w, _ = flow.shape
    xx, yy = _base_grid(h, w)
    pts = jnp.stack([xx, yy], axis=-1)
    z = _zoom_transform(scale, h, w)
    zp = apply_affine(z[None, None], pts)  # Z(p), [H,W,2]
    zoom_disp = (zp - pts)[None].repeat(t, axis=0)
    flow_at_zp = bilinear_warp_xla(flow, zoom_disp)
    return zoom_disp + flow_at_zp


def _auto_scale(flow: Array, margin: float = 0.0) -> Array:
    """Smallest centered zoom s<=1 keeping sampled coords in-bounds for the
    border pixels of every frame (traced scalar; shapes stay static)."""
    t, h, w, _ = flow.shape
    xx, yy = _base_grid(h, w)
    sx = xx[None] + flow[..., 0]
    sy = yy[None] + flow[..., 1]
    cx = (w - 1) / 2.0
    cy = (h - 1) / 2.0
    # For pixel p with offset r from center, sampling stays in bounds under
    # zoom s if the sampled point of the zoomed pixel is inside; conservative
    # per-axis bound: need s*|r| <= |bound along that direction|.
    over_x = jnp.maximum(jnp.maximum(-sx, sx - (w - 1)), 0.0)
    over_y = jnp.maximum(jnp.maximum(-sy, sy - (h - 1)), 0.0)
    rx = jnp.abs(xx - cx) + 1.0
    ry = jnp.abs(yy - cy) + 1.0
    # required shrink per pixel (approximate linear model)
    sreq = jnp.minimum(
        (rx[None] - over_x) / rx[None], (ry[None] - over_y) / ry[None]
    )
    return jnp.clip(jnp.min(sreq) - margin, 0.5, 1.0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_stabilized(frames: Array, flow: Array, cfg: RenderConfig) -> Array:
    """Backward-warp frames [T,H,W,C] by flow [T,H,W,2] with crop policy."""
    t, h, w, c = frames.shape
    if cfg.crop_mode == "fixed":
        flow = _compose_zoom(flow, jnp.float32(cfg.fixed_crop_ratio))
    elif cfg.crop_mode == "auto":
        flow = _compose_zoom(flow, _auto_scale(flow))
    out = bilinear_warp_xla(frames, flow)
    mask = warp_validity((h, w), flow)[..., None]
    return out * mask + cfg.border_value * (1.0 - mask)


def render_affine(frames: Array, transforms: Array, cfg: RenderConfig) -> Array:
    flow = affine_to_flow(transforms, frames.shape[1], frames.shape[2])
    return render_stabilized(frames, flow, cfg)


def render_grid(frames: Array, disp: Array, cfg: RenderConfig) -> Array:
    flow = grid_to_flow(disp, frames.shape[1], frames.shape[2])
    return render_stabilized(frames, flow, cfg)


__all__ = [
    "affine_to_flow",
    "grid_to_flow",
    "render_stabilized",
    "render_affine",
    "render_grid",
]
