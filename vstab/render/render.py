"""Full-frame stabilized renderer (SURVEY.md §2.1 "Full-frame renderer").

Consumes either per-frame affine warps [T,2,3] (affine smoothing path) or
per-frame grid displacement fields [T,GH,GW,2] (sparse-LS path), converts to
dense backward-warp flow, samples frames, and applies the crop policy.

Round-2 TPU-first redesign (VERDICT.md round-1 items 1-2): the round-1
renderer ran TWO full-res gather warps per frame (one to compose the crop
zoom into the flow field, one to sample the frames) — pathological on TPU
(flattened `jnp.take`). Now:

- frames are sampled ONCE via `warp_twopass` (separable 1D Pallas passes,
  O(max_disp) per pixel — kernels/warp1d.py);
- the crop zoom is a *separate separable resample*: out(p) = warped(Z(p))
  with Z a centered scale, which factorizes into two tent-weight matmuls
  (MXU work, no gathers). The zoom scale may be a traced scalar (auto mode),
  so the tent matrices are built in-graph.

Crop policy ('fixed' | 'auto' | 'none') behaves as before; output shapes
stay static under jit. Pixels whose ideal sample left the frame are filled
with `border_value` via the validity mask computed from the *exact* flow, so
the bounded-warp approximations never leak into visible output.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from vstab.core.config import RenderConfig
from vstab.core.types import apply_affine
from vstab.kernels import twopass_validity, warp_twopass

Array = jax.Array
log = logging.getLogger("vstab.render")


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


def _tent_matrix(n: int, scale: Array) -> Array:
    """[n,n] row-stochastic bilinear sampling matrix for the centered scale
    map src(i) = c + scale*(i-c); scale may be a traced scalar in (0,1]."""
    i = jnp.arange(n, dtype=jnp.float32)
    ctr = (n - 1) / 2.0
    src = ctr + jnp.asarray(scale, jnp.float32) * (i - ctr)
    src = jnp.clip(src, 0.0, n - 1.0)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - i[None, :]))


def zoom_resample(img: Array, scale: Array) -> Array:
    """Centered zoom-in resample out(p) = img(c + scale*(p-c)) for
    [T,H,W,C], as two separable tent matmuls (MXU; gather-free)."""
    t, h, w, c = img.shape
    wy = _tent_matrix(h, scale)
    wx = _tent_matrix(w, scale)
    # HIGHEST precision: the TPU default does bf16 matmuls, visibly wrong
    # for 8-bit image content (~0.4% error).
    tmp = jnp.einsum(
        "yr,trwc->tywc", wy, img, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.einsum(
        "xq,tyqc->tyxc", wx, tmp, precision=jax.lax.Precision.HIGHEST
    )


def _auto_scale_per_frame(flow: Array, margin: float = 0.0) -> Array:
    """Per-frame smallest centered zoom s<=1 keeping sampled coords in-bounds
    for every pixel of that frame: [T,H,W,2] -> [T] (traced; static shapes)."""
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
    return jnp.clip(jnp.min(sreq, axis=(1, 2)) - margin, 0.5, 1.0)


def _auto_scale(flow: Array, margin: float = 0.0) -> Array:
    """Clip-global auto-crop zoom: min of the per-frame scales (scalar)."""
    return jnp.min(_auto_scale_per_frame(flow, margin))


# --- Adaptive residual-displacement bound (VERDICT r3 item 7) -------------
#
# The two-pass render warp (kernels/warp1d.py) handles per-frame mean-removed
# residual displacements up to a static `max_disp`, masking anything beyond
# to border_value. A fixed bound of 16px silently punches border-colored
# holes for strong shake (at 1080p a 0.015 rad roll already produces ~16px
# corner residuals), so the renderer derives the bound from the solved path
# before tracing, bucketed to keep recompiles rare.
#
# The 127/255 buckets (VERDICT r4 item 1) cover contract-scale shake — the
# rotation/zoom residual of ordinary 1080p shake reaches ~100px and ~2x that
# at 4K. Round 4's data-dependent trip bounds make the kernel cost scale
# with the field's PER-TILE range rather than max_disp, so a large bucket on
# a smooth residual field costs about what a small one does; only the static
# tile geometry grows (vwarp narrows its lane tiles to hold VMEM constant).
# That is also why the warp applies the FULL residual field in one two-pass
# warp instead of factoring out the global affine first: rotation/shear
# cross-terms cannot ride axis-aligned tent matmuls, so affine removal would
# need these same 1D kernels at the same displacement magnitudes — plus two
# extra passes for the local residual.

_DISP_BUCKETS = (16, 24, 32, 48, 63, 127, 255)  # all: C*(2d+2) rounded to
# 128 divides the 512-px wide-path tile lanes at C in {1,3} (warp1d.py)


@functools.lru_cache(maxsize=None)
def _resize_mean_weights(g: int, n: int) -> tuple:
    """[g] pixel-mean weights of jax.image.resize 'bilinear' from g control
    points to n samples: w[v] = mean_i M[i,v] where M is the n x g resize
    matrix. Computed by resizing the identity (axis 0 is size-preserving,
    hence untouched). ensure_compile_time_eval: the first call may come from
    inside a jit trace (e.g. residual_disp_bound_jnp in the sharded
    pipeline) — the weights are static and must be computed eagerly."""
    with jax.ensure_compile_time_eval():
        eye = jnp.eye(g, dtype=jnp.float32)
        m = jax.image.resize(eye, (g, n), method="bilinear")  # [g, n]
        return tuple(np.asarray(jnp.mean(m, axis=1), dtype=np.float32))


def residual_disp_bound(path: np.ndarray, h: int, w: int, method: str) -> float:
    """Upper bound (px) on max_t,p |flow_t(p) - mean_p flow_t| of the dense
    warp flow induced by `path` — the residual the two-pass warp must cover.

    affine [T,2,3]: the flow is affine in (x,y); its pixel-mean equals its
    value at the grid center and its extrema sit at the corners.
    grid [T,GH,GW,2]: the dense flow is a separable bilinear upsample, so
    extrema sit at vertices and the pixel mean is the exact vertex-weighted
    average with the `_resize_mean_weights` weights. Host-side numpy f32 so
    the whole-clip and blocked pipelines compute identical bounds."""
    path = np.asarray(path, dtype=np.float32)
    if path.size == 0:
        return 0.0
    if method == "affine":
        pts = np.array(
            [[0, 0], [w - 1, 0], [0, h - 1], [w - 1, h - 1],
             [(w - 1) / 2.0, (h - 1) / 2.0]],
            np.float32,
        )  # 4 corners + center
        lin = path[:, :, :2] @ pts.T + path[:, :, 2:3]  # [T,2,5] mapped pts
        fl = lin - pts.T[None]  # flow at the 5 points
        return float(np.abs(fl[:, :, :4] - fl[:, :, 4:5]).max())
    t, gh, gw, _ = path.shape
    wy = np.asarray(_resize_mean_weights(gh, h), np.float32)
    wx = np.asarray(_resize_mean_weights(gw, w), np.float32)
    mean = np.einsum("g,q,tgqc->tc", wy, wx, path)
    return float(np.abs(path - mean[:, None, None, :]).max())


def residual_disp_bound_jnp(path: Array, h: int, w: int, method: str) -> Array:
    """In-graph twin of `residual_disp_bound` (same arithmetic, jnp f32) —
    for the multi-process sharded pipeline, where each shard bounds its
    LOCAL path slice and the global bound is a `pmax` (a host fetch of the
    time-sharded path is not addressable across processes). The bucketing
    in pick_max_disp absorbs any reduction-order jitter vs the host twin."""
    if method == "affine":
        pts = jnp.asarray(
            [[0, 0], [w - 1, 0], [0, h - 1], [w - 1, h - 1],
             [(w - 1) / 2.0, (h - 1) / 2.0]],
            jnp.float32,
        )  # [5,2]: 4 corners + center
        lin = path[:, :, :2] @ pts.T + path[:, :, 2:3]  # [T,2,5]
        fl = lin - pts.T[None]
        return jnp.abs(fl[:, :, :4] - fl[:, :, 4:5]).max()
    t, gh, gw, _ = path.shape
    wy = jnp.asarray(_resize_mean_weights(gh, h), jnp.float32)
    wx = jnp.asarray(_resize_mean_weights(gw, w), jnp.float32)
    mean = jnp.einsum("g,q,tgqc->tc", wy, wx, path)
    return jnp.abs(path - mean[:, None, None, :]).max()


def pick_max_disp(bound: float, cfg: RenderConfig) -> int:
    """Static kernel bound for a measured residual bound: the smallest
    bucket covering `bound` (+0.5px mean-rounding slack), floored at
    cfg.max_residual_disp, capped at cfg.max_disp_limit. Bucketing bounds
    the number of distinct jit specializations at len(_DISP_BUCKETS)."""
    if not cfg.adaptive_max_disp:
        return cfg.max_residual_disp
    need = max(int(np.ceil(bound + 0.5)), cfg.max_residual_disp)
    limit = min(cfg.max_disp_limit, _DISP_BUCKETS[-1])
    for b in _DISP_BUCKETS:
        if b >= need:
            return min(b, limit)
    log.warning(
        "residual displacement bound %.1fpx exceeds max_disp_limit=%d; "
        "out-of-range pixels will be border-filled", bound, limit,
    )
    return limit


@functools.partial(jax.jit, static_argnames=("cfg", "max_disp"))
def render_stabilized(
    frames: Array, flow: Array, cfg: RenderConfig, scale: Array | None = None,
    max_disp: int | None = None,
) -> Array:
    """Backward-warp frames [T,H,W,C] by flow [T,H,W,2] with crop policy.

    `scale` (optional traced scalar) overrides the crop zoom — used by the
    temporal-block pipeline, where 'auto' needs the min over ALL blocks'
    per-frame scales, known only after a first sweep (pipeline_blocked.py).
    `max_disp` (static) overrides cfg.max_residual_disp — callers derive it
    from the solved path via residual_disp_bound/pick_max_disp.
    """
    t, h, w, c = frames.shape
    d = cfg.max_residual_disp if max_disp is None else max_disp
    warped = warp_twopass(frames, flow, max_disp=d, impl=cfg.kernel_impl)
    mask = twopass_validity((h, w), flow, d)[..., None]
    if cfg.crop_mode == "none":
        return warped * mask + cfg.border_value * (1.0 - mask)
    if scale is None:
        if cfg.crop_mode == "fixed":
            scale = jnp.float32(cfg.fixed_crop_ratio)
        elif cfg.crop_mode == "auto":
            scale = _auto_scale(flow)
        else:
            raise ValueError(f"unknown crop_mode: {cfg.crop_mode}")
    out = zoom_resample(warped, scale)
    maskz = zoom_resample(mask, scale)
    valid = (maskz > 0.999).astype(out.dtype)
    return out * valid + cfg.border_value * (1.0 - valid)


def render_affine(frames: Array, transforms: Array, cfg: RenderConfig) -> Array:
    flow = affine_to_flow(transforms, frames.shape[1], frames.shape[2])
    return render_stabilized(frames, flow, cfg)


def render_grid(frames: Array, disp: Array, cfg: RenderConfig) -> Array:
    flow = grid_to_flow(disp, frames.shape[1], frames.shape[2])
    return render_stabilized(frames, flow, cfg)


__all__ = [
    "affine_to_flow",
    "grid_to_flow",
    "zoom_resample",
    "render_stabilized",
    "render_affine",
    "render_grid",
]
