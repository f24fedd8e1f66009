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


def _cv_kernel(f1_ref, f2a_ref, f2b_ref, out_ref, *, radius: int):
    """f1 block [1,th,C,Wp]; f2 row-blocks (hi, hi+1); out [1,ND,th,Wp]."""
    r = radius
    _, th, c, wp = f1_ref.shape
    nd1 = 2 * r + 1
    f1 = f1_ref[0].astype(jnp.float32)  # [th, C, Wp]
    band = jnp.concatenate([f2a_ref[0], f2b_ref[0]], axis=0)
    band = band[: th + 2 * r].astype(jnp.float32)  # [th+2r, C, Wp]
    inv_c = 1.0 / c

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


@functools.partial(jax.jit, static_argnames=("radius", "tile_h"))
def cost_volume_pallas(
    f1: Array, f2: Array, radius: int = 4, tile_h: int = 16
) -> Array:
    """Pallas TPU cost volume. Same semantics as `cost_volume_xla`.

    Requires 2*radius <= tile_h (halo covered by one extra row-block)."""
    n, h, w, c = f1.shape
    r = radius
    if 2 * r > tile_h:
        raise ValueError(f"2*radius={2*r} must be <= tile_h={tile_h}")
    nd = (2 * r + 1) ** 2
    wp = _round_up(w + 2 * r, 128)
    h_pad = (-h) % tile_h
    hp = h + h_pad

    # Channels-on-sublanes layout.
    f1t = jnp.transpose(f1, (0, 1, 3, 2))  # [N, H, C, W]
    f2t = jnp.transpose(f2, (0, 1, 3, 2))
    f1p = jnp.pad(f1t, ((0, 0), (0, h_pad), (0, 0), (0, wp - w)))
    # f2: r-row top halo; bottom padded so rows = hp + tile_h exactly (one
    # extra block for the hi+1 view); W halo in the lane dim.
    f2p = jnp.pad(
        f2t, ((0, 0), (r, hp + tile_h - h - r), (0, 0), (r, wp - w - r))
    )

    grid = (n, hp // tile_h)
    out = pl.pallas_call(
        functools.partial(_cv_kernel, radius=r),
        out_shape=jax.ShapeDtypeStruct((n, nd, hp, wp), f1.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, c, wp),
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
        ],
        out_specs=pl.BlockSpec(
            (1, nd, tile_h, wp),
            lambda ni, hi: (ni, 0, hi, 0),
            memory_space=pltpu.VMEM,
        ),
    )(f1p, f2p, f2p)
    return jnp.transpose(out, (0, 2, 3, 1))[:, :h, :w]


def cost_volume(f1: Array, f2: Array, radius: int = 4, impl: str = "pallas") -> Array:
    """Dispatch: impl in {'pallas', 'xla'}; Pallas requires a TPU backend."""
    if impl == "pallas" and jax.default_backend() == "tpu":
        return cost_volume_pallas(f1, f2, radius)
    return cost_volume_xla(f1, f2, radius)


__all__ = ["cost_volume", "cost_volume_xla", "cost_volume_pallas"]
