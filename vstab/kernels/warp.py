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


def _warp_kernel(flow_ref, img_ref, out_ref, *, max_disp: int, tile_h: int):
    """Grid = (N, H/tile_h). Padded image [1, H+2D+1, W+2D+1, C] resident in
    VMEM per sample.

    Mosaic constraints (this JAX version): gather is 2-D-only with
    operand-shaped indices, and reshapes that collapse tiled dims don't
    lower — so per-pixel 4-tap sampling is expressed gather-free as a
    select-accumulate over the (2D+2)^2 integer offsets with separable tent
    weights:

      out = sum_{dy,dx} ly(dy) * lx(dx) * img[y+dy, x+dx]
      ly(dy) = (1-fy)[y0==dy] + fy[y0==dy-1]   (and same for lx)

    The offset loop is a lax.fori_loop (dynamic slice starts) so only one
    accumulator + one band stay live in VMEM. Pure VPU; same structure as
    the cost-volume kernel. A gather-based variant is a future optimization
    once Mosaic supports non-same-shape lane gathers.
    """
    d = max_disp
    i = pl.program_id(1)
    _, th, w, _ = out_ref.shape
    c = img_ref.shape[-1]
    flow = flow_ref[0].astype(jnp.float32)  # [th, w, 2]
    u = jnp.clip(flow[..., 0], -d, d)
    v = jnp.clip(flow[..., 1], -d, d)
    y0 = jnp.floor(v).astype(jnp.int32)  # in [-d, d]
    fy = v - y0.astype(jnp.float32)
    x0 = jnp.floor(u).astype(jnp.int32)
    fx = u - x0.astype(jnp.float32)

    row0 = i * tile_h  # block's first output row; padded img row = row + d
    span = 2 * d + 2

    def body(k, acc):
        dy = k // span - d
        dx = k % span - d
        ly = (1.0 - fy) * (y0 == dy).astype(jnp.float32) + fy * (
            y0 == dy - 1
        ).astype(jnp.float32)
        lx = (1.0 - fx) * (x0 == dx).astype(jnp.float32) + fx * (
            x0 == dx - 1
        ).astype(jnp.float32)
        band = img_ref[
            0, pl.ds(row0 + d + dy, th), pl.ds(d + dx, w), :
        ].astype(jnp.float32)
        return acc + (ly * lx)[..., None] * band

    acc = jax.lax.fori_loop(
        0, span * span, body, jnp.zeros((th, w, c), jnp.float32)
    )
    out_ref[0] = acc.astype(out_ref.dtype)


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
            pl.BlockSpec(
                (1, hp + 2 * d + 1, w + 2 * d + 1, c),
                lambda ni, hi: (ni, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, c),
            lambda ni, hi: (ni, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
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
