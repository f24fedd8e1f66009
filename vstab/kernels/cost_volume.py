"""Cost-volume / correlation kernel (SURVEY.md §2.1, §2.3).

The reference's equivalent is the FlowNet2/PWC-Net CUDA `correlation` op
[EXT, SURVEY.md §2.3 — reference mount empty at v0]. Here the TPU-native
design is:

- `cost_volume_xla`   — shift-and-multiply formulation in pure lax ops. XLA
  fuses the (2r+1)^2 static shifts into one loop; this is the reference
  implementation, the CPU test backend, and the autodiff path.
- `cost_volume_pallas`— Pallas TPU kernel. Layout-first design, derived
  from measured Mosaic constraints (unaligned second-minor slices illegal
  for packed bf16; gathers single-vreg only; <128 trailing dims waste
  lanes):
    * operands are transposed to CHANNELS-ON-SUBLANES layout [N, H, C, W]:
      W rides the 128 lanes (full utilization at every pyramid level,
      C=16..196), C rides sublanes where the correlation reduce is cheap;
    * grid over (N, row tiles); the f2 halo band is assembled from TWO
      consecutive row-blocks (hi, hi+1) — overlapping windows built from
      disjoint BlockSpec blocks, so Pallas pipelines them (no manual DMA,
      no tiled-slice alignment constraints);
    * dx displacements are dynamic LANE rolls (`pltpu.roll`, axis=W), one
      per outer fori_loop step — a single rolled band is live at a time
      (keeping all (2r+1) alive blows the 16MB scoped-VMEM limit);
    * dy displacements are free row slices on the untiled H axis;
    * (2r+1)^2 fused multiply + sublane-reduce MACs on the VPU, f32
      accumulation; each output channel k=(dy,dx) is a row of the
      [ND, H, W]-layout output block (untiled ND -> dynamic store legal).

Semantics (PWC-Net convention): for displacement d=(dy,dx) in
[-r, r]^2, out[n, y, x, k(d)] = mean_c f1[n,y,x,c] * f2[n,y+dy,x+dx,c],
with f2 zero-padded outside its bounds, k = (dy+r)*(2r+1)+(dx+r).
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


@functools.partial(jax.jit, static_argnames=("radius",))
def cost_volume_xla(f1: Array, f2: Array, radius: int = 4) -> Array:
    """Windowed correlation, [N,H,W,C] x [N,H,W,C] -> [N,H,W,(2r+1)^2].

    Pure-XLA shift-and-multiply; differentiable; runs anywhere.
    """
    n, h, w, c = f1.shape
    r = radius
    f2p = jnp.pad(f2, ((0, 0), (r, r), (r, r), (0, 0)))
    outs = []
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            shifted = jax.lax.dynamic_slice(f2p, (0, dy, dx, 0), (n, h, w, c))
            outs.append(jnp.mean(f1 * shifted, axis=-1))
    return jnp.stack(outs, axis=-1)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


_VMEM_BUDGET = 10 * 2**20  # target scoped-VMEM bytes (hard limit is 16MB)


def _cv_pick_tiles(wp: int, c: int, nd: int, r: int, itemsize: int):
    """(tile_h, tile_w, narrow): static tile choice fitting _VMEM_BUDGET.

    The estimate mirrors what Mosaic actually allocates (measured via its
    scoped-VMEM OOM reports): double-buffered in/out blocks at the input
    itemsize, plus the f32 band and one rolled copy, plus one f32 product
    temporary. `narrow=True` means one W tile covers the row (the round-3
    2-view scheme — cheaper halo traffic); wide rows tile W with the
    adjacent-lane-block halo (VERDICT r3 items 1/8: any width must compile
    in bounded VMEM)."""
    best = None
    for th in (16, 8):
        if 2 * r > th:
            continue
        # narrow: 3 views over full wp; band over wp lanes.
        est = 2 * itemsize * (3 * th * c * wp + nd * th * wp) + (
            4 * 2 * (2 * th) * c * wp + 4 * th * c * wp
        )
        if est <= _VMEM_BUDGET:
            return th, wp, True
        k = wp // 128
        for m in range(min(k, 4), 0, -1):
            if k % m:
                continue
            tw = m * 128
            if tw == wp:
                continue
            est = 2 * itemsize * (5 * th * c * tw + nd * th * tw) + (
                4 * 2 * (2 * th) * c * 2 * tw + 4 * th * c * tw
            )
            if est <= _VMEM_BUDGET:
                return th, tw, False
            best = (th, tw, False)
    if best is None:
        raise ValueError(
            f"cost_volume_pallas: no (tile_h, tile_w) fits VMEM for "
            f"wp={wp}, c={c}, nd={nd} — width/channel combination too large"
        )
    # Over-budget fallback: warn so an eventual Mosaic scoped-VMEM compile
    # error is traceable to the tiling choice (ADVICE r4, low).
    import logging

    logging.getLogger("vstab.kernels").warning(
        "cost_volume_pallas: smallest tiling (tile_h=%d, tile_w=%d) still "
        "exceeds the %dMB VMEM budget for wp=%d C=%d nd=%d; the Mosaic "
        "compile may fail with a scoped-VMEM error",
        best[0], best[1], _VMEM_BUDGET >> 20, wp, c, nd,
    )
    return best


def _cv_kernel_narrow(f1_ref, f2a_ref, f2b_ref, out_ref, *, radius: int, inv_c: float):
    """One W tile covers the row. f1 block [1,th,C,Wp]; f2 row-blocks
    (hi, hi+1); out [1,ND,th,Wp]."""
    r = radius
    _, th, c, wp = f1_ref.shape
    nd1 = 2 * r + 1
    f1 = f1_ref[0].astype(jnp.float32)  # [th, C, Wp]
    band = jnp.concatenate([f2a_ref[0], f2b_ref[0]], axis=0)
    band = band[: th + 2 * r].astype(jnp.float32)  # [th+2r, C, Wp]

    # dx OUTER: one dynamic lane roll of the whole halo band per dx (the
    # round-2 kernel rolled a dy-slice inside the inner loop — (2r+1)^2
    # rolls; rolls are pure data movement and dominated the kernel). dy
    # INNER: static value slices of the rolled band (free in Mosaic).
    # fori_loop keeps ONE rolled band live (unrolling blows scoped VMEM).
    def body_dx(dx, _):
        # shifted[..., x] = band[..., x + dx]; wrap-around lands at
        # x >= W (discarded by the final slice).
        rolled = pltpu.roll(band, shift=(wp - dx) % wp, axis=2)
        for dy in range(nd1):
            corr = jnp.sum(f1 * rolled[dy : dy + th], axis=1) * inv_c
            out_ref[0, dy * nd1 + dx] = corr.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nd1, body_dx, 0)


def _cv_kernel_wide(
    f1_ref, f2a0, f2a1, f2b0, f2b1, out_ref, *, radius: int, inv_c: float
):
    """W-tiled row. f1 block [1,th,C,tw]; f2 as FOUR block views — row-blocks
    (hi, hi+1) x lane-blocks (wi, wi+1) — giving the 2r-row x 2r-lane halo
    band; out [1,ND,th,tw]."""
    r = radius
    _, th, c, tw = f1_ref.shape
    nd1 = 2 * r + 1
    f1 = f1_ref[0].astype(jnp.float32)  # [th, C, tw]
    band = jnp.concatenate(
        [
            jnp.concatenate([f2a0[0], f2a1[0]], axis=2),
            jnp.concatenate([f2b0[0], f2b1[0]], axis=2),
        ],
        axis=0,
    )
    band = band[: th + 2 * r].astype(jnp.float32)  # [th+2r, C, 2*tw]

    def body_dx(dx, _):
        # shifted[..., x] = band[..., x + dx]; x + dx < 2*tw for kept lanes
        # x < tw since dx <= 2r < tw.
        rolled = pltpu.roll(band, shift=(2 * tw - dx) % (2 * tw), axis=2)
        for dy in range(nd1):
            corr = (
                jnp.sum(f1 * rolled[dy : dy + th, :, :tw], axis=1) * inv_c
            )
            out_ref[0, dy * nd1 + dx] = corr.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nd1, body_dx, 0)


@functools.partial(jax.jit, static_argnames=("radius", "tile_h", "tile_w"))
def cost_volume_pallas(
    f1: Array, f2: Array, radius: int = 4, tile_h: int | None = None,
    tile_w: int | None = None,
) -> Array:
    """Pallas TPU cost volume. Same semantics as `cost_volume_xla`.

    Tile sizes are picked to fit scoped VMEM (see _cv_pick_tiles): narrow
    rows use the 2-view row-halo scheme; wide rows (4K-level feature maps)
    additionally grid over W with an adjacent-lane-block halo, so any width
    compiles in bounded VMEM (VERDICT r3 items 1/8). Requires 2*radius <=
    tile_h and (wide path) 2*radius < tile_w."""
    n, h, w, c = f1.shape
    r = radius
    nd = (2 * r + 1) ** 2
    wp = _round_up(w + 2 * r, 128)
    ath, atw, narrow = _cv_pick_tiles(wp, c, nd, r, f1.dtype.itemsize)
    th = tile_h or ath
    tw = tile_w or atw
    narrow = tw == wp
    if 2 * r > th:
        raise ValueError(f"2*radius={2*r} must be <= tile_h={th}")
    if wp % tw or tw % 128:
        raise ValueError(f"tile_w={tw} must be a multiple-of-128 divisor of {wp}")
    if not narrow and 2 * r >= tw:
        raise ValueError(f"2*radius={2*r} must be < tile_w={tw}")
    h_pad = (-h) % th
    hp = h + h_pad

    # Channels-on-sublanes layout.
    f1t = jnp.transpose(f1, (0, 1, 3, 2))  # [N, H, C, W]
    f2t = jnp.transpose(f2, (0, 1, 3, 2))
    f1p = jnp.pad(f1t, ((0, 0), (0, h_pad), (0, 0), (0, wp - w)))
    # f2: r-row top halo; bottom padded so rows = hp + tile_h exactly (one
    # extra block for the hi+1 view); r-lane left halo; wide path right-pads
    # to wp + one extra lane-tile so the wi+1 view exists.
    extra_w = 0 if narrow else tw
    f2p = jnp.pad(
        f2t,
        ((0, 0), (r, hp + th - h - r), (0, 0), (r, wp + extra_w - w - r)),
    )

    if narrow:
        kernel = functools.partial(_cv_kernel_narrow, radius=r, inv_c=1.0 / c)
        grid = (n, hp // th)
        in_specs = [
            pl.BlockSpec(
                (1, th, c, wp), lambda ni, hi: (ni, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, th, c, wp), lambda ni, hi: (ni, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, th, c, wp), lambda ni, hi: (ni, hi + 1, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_specs = pl.BlockSpec(
            (1, nd, th, wp), lambda ni, hi: (ni, 0, hi, 0),
            memory_space=pltpu.VMEM,
        )
        operands = (f1p, f2p, f2p)
    else:
        kernel = functools.partial(_cv_kernel_wide, radius=r, inv_c=1.0 / c)
        grid = (n, hp // th, wp // tw)
        f2_spec = lambda dh, dw: pl.BlockSpec(
            (1, th, c, tw),
            lambda ni, hi, wi, _dh=dh, _dw=dw: (ni, hi + _dh, 0, wi + _dw),
            memory_space=pltpu.VMEM,
        )
        in_specs = [
            pl.BlockSpec(
                (1, th, c, tw), lambda ni, hi, wi: (ni, hi, 0, wi),
                memory_space=pltpu.VMEM,
            ),
            f2_spec(0, 0), f2_spec(0, 1),
            f2_spec(1, 0), f2_spec(1, 1),
        ]
        out_specs = pl.BlockSpec(
            (1, nd, th, tw), lambda ni, hi, wi: (ni, 0, hi, wi),
            memory_space=pltpu.VMEM,
        )
        operands = (f1p, f2p, f2p, f2p, f2p)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, nd, hp, wp), f1.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
    )(*operands)
    return jnp.transpose(out, (0, 2, 3, 1))[:, :h, :w]


def cost_volume(f1: Array, f2: Array, radius: int = 4, impl: str = "pallas") -> Array:
    """Dispatch: impl in {'pallas', 'xla'}; Pallas requires a TPU backend."""
    if impl == "pallas" and jax.default_backend() == "tpu":
        return cost_volume_pallas(f1, f2, radius)
    return cost_volume_xla(f1, f2, radius)


__all__ = ["cost_volume", "cost_volume_xla", "cost_volume_pallas"]
