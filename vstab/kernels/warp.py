"""Bilinear warp kernels (SURVEY.md §2.1, §2.3).

Reference equivalent: `tf.contrib.image.dense_image_warp`-style resampler
[EXT — reference mount empty at v0, SURVEY.md §0]. TPU-native design:

- `bilinear_warp_xla` — unbounded backward warp via one flattened gather per
  tap (4 taps). Differentiable w.r.t. both image and flow; default path for
  the full-frame renderer where displacements can be large.
- `bilinear_warp_pallas` — Pallas TPU kernel for the flow network's per-level
  feature warps, where displacement is bounded by the coarse-to-fine design.
  Row-band tiling with a displacement halo; the per-pixel gather is done
  in VMEM on a tile the halo guarantees contains every tap.

Convention: output[n,y,x] samples input at (x + flow[...,0], y + flow[...,1]).
Out-of-bounds taps clamp to the border; a separate `warp_validity` mask
reports which outputs sampled fully in-bounds (used by the renderer's crop
logic and by occlusion masking in training).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


# ---------------------------------------------------------------------------
# XLA reference implementation
# ---------------------------------------------------------------------------


def _warp_single(img: Array, flow: Array) -> Array:
    """[H,W,C], [H,W,2] -> [H,W,C] backward-warped."""
    h, w, c = img.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = xx + flow[..., 0]
    sy = yy + flow[..., 1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def tap(yi, xi):
        yi = jnp.clip(yi, 0, h - 1)
        xi = jnp.clip(xi, 0, w - 1)
        lin = (yi * w + xi).reshape(-1)
        return jnp.take(img.reshape(h * w, c), lin, axis=0).reshape(h, w, c)

    w00 = ((1 - fx) * (1 - fy))[..., None]
    w01 = (fx * (1 - fy))[..., None]
    w10 = ((1 - fx) * fy)[..., None]
    w11 = (fx * fy)[..., None]
    out = (
        w00 * tap(y0, x0)
        + w01 * tap(y0, x0 + 1)
        + w10 * tap(y0 + 1, x0)
        + w11 * tap(y0 + 1, x0 + 1)
    )
    return out.astype(img.dtype)


@jax.jit
def bilinear_warp_xla(img: Array, flow: Array) -> Array:
    """Backward bilinear warp, [N,H,W,C] by flow [N,H,W,2]."""
    return jax.vmap(_warp_single)(img, flow.astype(jnp.float32))


def warp_validity(shape_hw, flow: Array) -> Array:
    """[N,H,W] float mask: 1 where all 4 taps were in-bounds."""
    h, w = shape_hw
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = xx[None] + flow[..., 0]
    sy = yy[None] + flow[..., 1]
    return (
        (sx >= 0.0) & (sx <= w - 1.0) & (sy >= 0.0) & (sy <= h - 1.0)
    ).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Pallas TPU kernel (bounded displacement)
# ---------------------------------------------------------------------------


def _warp_kernel(flow_ref, img_hbm, out_ref, img_vmem, sem, *, max_disp: int, tile_h: int):
    """Grid = (N, H/tile_h). Loads rows [i*th - D, i*th + th + D) of the
    (pre-padded) image; per-pixel 4-tap gather happens within the VMEM band.

    The vertical tap index is resolved by a static loop over the 2D+1
    candidate rows with select-accumulate (VPU); the horizontal tap uses the
    same trick over 2D+1 candidate columns, giving an O((2D+1)*HWC) +
    O((2D+1)*HWC) two-pass separable gather instead of (2D+1)^2.
    Pass 1 (vertical): for each output pixel, interpolate rows -> a [th, W+2D, C]
    band already vertically sampled. Pass 2 (horizontal): interpolate columns.
    Separability holds because bilinear is a tensor product of 1-D kernels.
    """
    d = max_disp
    n = pl.program_id(0)
    i = pl.program_id(1)
    _, th, w, _ = out_ref.shape
    copy = pltpu.make_async_copy(
        img_hbm.at[n, pl.ds(i * tile_h, tile_h + 2 * d + 1)],
        img_vmem,
        sem,
    )
    copy.start()
    flow = flow_ref[0].astype(jnp.float32)  # [th, w, 2]
    u = jnp.clip(flow[..., 0], -d, d)
    v = jnp.clip(flow[..., 1], -d, d)
    y0f = jnp.floor(v)
    fy = v - y0f
    x0f = jnp.floor(u)
    fx = u - x0f
    y0 = y0f.astype(jnp.int32)  # in [-d, d]
    x0 = x0f.astype(jnp.int32)
    copy.wait()

    wp = w + 2 * d + 1  # padded width of the VMEM band
    # Pass 1: vertical interpolation into a [th, wp, C] buffer.
    # img_vmem row (local) r corresponds to source row (i*th + r - d).
    # Output pixel (y, x) needs source rows y + y0 and y + y0 + 1, i.e.
    # local rows y + d + y0 (+1). Static loop over candidate offsets.
    c = img_vmem.shape[-1]
    vert = jnp.zeros((th, wp, c), jnp.float32)
    for dy in range(-d, d + 1):
        # rows y + d + dy for y in [0, th): slice [d+dy : d+dy+th]
        row_a = img_vmem[d + dy : d + dy + th, :, :].astype(jnp.float32)
        row_b = img_vmem[d + dy + 1 : d + dy + 1 + th, :, :].astype(jnp.float32)
        sel = (y0 == dy).astype(jnp.float32)  # [th, w]
        # weight applies per output pixel; broadcast over the padded width by
        # padding the selector/frac to wp (taps beyond w are never selected
        # by pass 2's column window, values don't matter — use edge pad).
        selp = jnp.pad(sel, ((0, 0), (d, d + 1)), mode="edge")[..., None]
        fyp = jnp.pad(fy, ((0, 0), (d, d + 1)), mode="edge")[..., None]
        vert = vert + selp * ((1.0 - fyp) * row_a + fyp * row_b)

    # Pass 2: horizontal interpolation from vert[th, wp, C] -> out [th, w, C].
    out = jnp.zeros((th, w, c), jnp.float32)
    for dx in range(-d, d + 1):
        col_a = vert[:, d + dx : d + dx + w, :]
        col_b = vert[:, d + dx + 1 : d + dx + 1 + w, :]
        sel = (x0 == dx).astype(jnp.float32)[..., None]
        fxe = fx[..., None]
        out = out + sel * ((1.0 - fxe) * col_a + fxe * col_b)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_disp", "tile_h"))
def bilinear_warp_pallas(
    img: Array, flow: Array, max_disp: int = 8, tile_h: int = 32
) -> Array:
    """Bounded-displacement Pallas warp: |flow| is clipped to max_disp.

    Matches `bilinear_warp_xla(img, clip(flow))` with edge-clamped sampling
    implemented via edge padding of the source image.
    """
    n, h, w, c = img.shape
    d = max_disp
    h_pad = (-h) % tile_h
    # Edge-pad: clamped border sampling == sampling the edge-padded image.
    imgp = jnp.pad(
        img, ((0, 0), (d, d + h_pad + 1), (d, d + 1), (0, 0)), mode="edge"
    )
    # After padding, source row y (orig) is at row y + d; each row band DMA
    # reads tile_h + 2d + 1 rows, covered by the +1 trailing pads above.
    flowp = jnp.pad(flow, ((0, 0), (0, h_pad), (0, 0), (0, 0)))
    hp = h + h_pad
    out = pl.pallas_call(
        functools.partial(_warp_kernel, max_disp=d, tile_h=tile_h),
        out_shape=jax.ShapeDtypeStruct((n, hp, w, c), img.dtype),
        grid=(n, hp // tile_h),
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, w, 2),
                lambda ni, hi: (ni, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, c),
            lambda ni, hi: (ni, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * d + 1, w + 2 * d + 1, c), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(flowp, imgp)
    return out[:, :h]


def bilinear_warp(
    img: Array, flow: Array, impl: str = "pallas", max_disp: int = 8
) -> Array:
    """Dispatch: Pallas (bounded) on TPU, XLA otherwise/for large motion."""
    if impl == "pallas" and jax.default_backend() == "tpu":
        return bilinear_warp_pallas(img, flow, max_disp=max_disp)
    return bilinear_warp_xla(img, flow)


__all__ = [
    "bilinear_warp",
    "bilinear_warp_xla",
    "bilinear_warp_pallas",
    "warp_validity",
]
