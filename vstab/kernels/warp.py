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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _warp_kernel(flow_ref, img_a, img_b, img_c, out_ref, *, max_disp: int):
    """flow block [1,th,2,Wp]; edge-padded image as THREE consecutive
    row-blocks (hi, hi+1, hi+2) whose concatenation contains the (2d+2)-row
    halo band — overlapping windows from disjoint BlockSpec blocks,
    pipelined by Pallas (no manual DMA). Channels-on-sublanes layout
    [.., C, W]: W rides the lanes (see cost_volume.py for the rationale).

    Mosaic constraints (measured on this toolchain): dynamic gathers only
    lower within a single vreg, and unaligned second-minor (W) slices are
    illegal for packed bf16 — so per-pixel 4-tap sampling is gather-free:
    a select-accumulate over the (2d+2)^2 integer offsets with separable
    tent weights,

      out = sum_{dy,dx} ly(dy) * lx(dx) * img[y+dy, x+dx]
      ly(dy) = (1-fy)[y0==dy] + fy[y0==dy-1]     (same for lx),

    where dx shifts are dynamic lane rolls (one live rolled band per outer
    fori_loop step — unrolling blows the 16MB scoped-VMEM limit) and dy
    offsets are row slices on the untiled H axis. f32 accumulation (VPU).
    """
    d = max_disp
    _, th, c, wp = out_ref.shape
    span = 2 * d + 2

    flow = flow_ref[0].astype(jnp.float32)  # [th, 2, Wp]
    u = jnp.clip(flow[:, 0], -d, d)  # [th, Wp]
    v = jnp.clip(flow[:, 1], -d, d)
    y0 = jnp.floor(v).astype(jnp.int32)  # in [-d, d]
    fy = v - y0.astype(jnp.float32)
    x0 = jnp.floor(u).astype(jnp.int32)
    fx = u - x0.astype(jnp.float32)

    band = jnp.concatenate([img_a[0], img_b[0], img_c[0]], axis=0)
    band = band[: th + span].astype(jnp.float32)  # [th+span, C, Wp]

    # dx OUTER: one dynamic lane roll of the whole halo band per dx (the
    # round-2 kernel rolled a dy-slice in the inner loop — span^2 rolls;
    # rolls are pure data movement and dominated the kernel). dy INNER:
    # static value slices of the rolled band (dynamic_slice on values does
    # not lower in Mosaic, so dy stays a static Python loop). fori_loop
    # keeps ONE rolled band live (unrolling blows the 16MB scoped VMEM).
    ly_all = []
    for k in range(span):
        dy = k - d
        ly_all.append(
            (1.0 - fy) * (y0 == dy).astype(jnp.float32)
            + fy * (y0 == dy - 1).astype(jnp.float32)
        )

    def body_dx(j, acc):
        dx = j - d
        lx = (1.0 - fx) * (x0 == dx).astype(jnp.float32) + fx * (
            x0 == dx - 1
        ).astype(jnp.float32)
        # shifted[..., x] = band[..., x + d + dx] = band[..., x + j];
        # wrap-around lands at x >= W (discarded by the final slice).
        rolled = pltpu.roll(band, shift=(wp - j) % wp, axis=2)
        for k in range(span):
            acc = acc + (ly_all[k] * lx)[:, None, :] * rolled[k : k + th]
        return acc

    acc = jax.lax.fori_loop(
        0, span, body_dx, jnp.zeros((th, c, wp), jnp.float32)
    )
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_disp", "tile_h"))
def bilinear_warp_pallas(
    img: Array, flow: Array, max_disp: int = 8, tile_h: int = 16
) -> Array:
    """Bounded-displacement Pallas warp: |flow| is clipped to max_disp.

    Matches `bilinear_warp_xla(img, clip(flow))` with edge-clamped sampling
    implemented via edge padding of the source image.
    Requires 2*max_disp + 2 <= 2*tile_h (halo covered by two extra blocks).
    """
    n, h, w, c = img.shape
    d = max_disp
    if 2 * d + 2 > 2 * tile_h:
        raise ValueError(f"2*max_disp+2={2*d+2} must be <= 2*tile_h={2*tile_h}")
    wp = _round_up(w + 2 * d + 1, 128)
    h_pad = (-h) % tile_h
    hp = h + h_pad
    # Channels-on-sublanes layout; edge-pad: clamped border sampling ==
    # sampling the edge-padded image. Source row y (orig) is at padded row
    # y + d; rows padded to hp + 2 tiles so the hi+1/hi+2 views exist.
    imgt = jnp.transpose(img, (0, 1, 3, 2))  # [N, H, C, W]
    flowt = jnp.transpose(flow, (0, 1, 3, 2))  # [N, H, 2, W]
    imgp = jnp.pad(
        imgt,
        ((0, 0), (d, hp + 2 * tile_h - h - d), (0, 0), (d, wp - w - d)),
        mode="edge",
    )
    flowp = jnp.pad(flowt, ((0, 0), (0, h_pad), (0, 0), (0, wp - w)))
    out = pl.pallas_call(
        functools.partial(_warp_kernel, max_disp=d),
        out_shape=jax.ShapeDtypeStruct((n, hp, c, wp), img.dtype),
        grid=(n, hp // tile_h),
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, 2, wp),
                lambda ni, hi: (ni, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_h, c, wp),
                lambda ni, hi: (ni, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_h, c, wp),
                lambda ni, hi: (ni, hi + 1, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_h, c, wp),
                lambda ni, hi: (ni, hi + 2, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, c, wp),
            lambda ni, hi: (ni, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )(flowp, imgp, imgp, imgp)
    return jnp.transpose(out, (0, 1, 3, 2))[:, :h, :w]


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
