"""Cost-volume / correlation kernel (SURVEY.md §2.1, §2.3).

The reference's equivalent is the FlowNet2/PWC-Net CUDA `correlation` op
[EXT, SURVEY.md §2.3 — reference mount empty at v0]. Here the TPU-native
design is:

- `cost_volume_xla`   — shift-and-multiply formulation in pure lax ops. XLA
  fuses the (2r+1)^2 static shifts into one loop; this is the reference
  implementation, the CPU test backend, and the autodiff path.
- `cost_volume_pallas`— Pallas TPU kernel: tiles rows of f1 into VMEM, DMAs
  the matching haloed row-band of (pre-padded) f2 from HBM, and accumulates
  the windowed correlation entirely on-chip — one HBM read of each input
  instead of (2r+1)^2 strided reads.

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


def _cv_kernel(f1_ref, f2_ref, out_ref, *, radius: int, tile_h: int):
    """Grid = (N, H/tile_h). f1 block [1, tile_h, W, C] in VMEM; padded f2
    [1, H+2r, W+2r, C] resident in VMEM for the whole sample (the per-level
    feature maps are small; Pallas re-fetches it only when N changes)."""
    r = radius
    i = pl.program_id(1)
    _, th, w, c = f1_ref.shape
    f1 = f1_ref[0].astype(jnp.float32)
    inv_c = 1.0 / c
    row0 = i * tile_h
    for dy in range(2 * r + 1):
        band = f2_ref[0, pl.ds(row0 + dy, th)]  # [th, W+2r, C]
        for dx in range(2 * r + 1):
            shifted = band[:, dx : dx + w, :].astype(jnp.float32)
            corr = jnp.sum(f1 * shifted, axis=-1) * inv_c
            out_ref[0, :, :, dy * (2 * r + 1) + dx] = corr.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("radius", "tile_h"))
def cost_volume_pallas(
    f1: Array, f2: Array, radius: int = 4, tile_h: int = 16
) -> Array:
    """Pallas TPU cost volume. Same semantics as `cost_volume_xla`."""
    n, h, w, c = f1.shape
    r = radius
    nd = (2 * r + 1) ** 2
    # Pad rows so H divides tile_h, plus the correlation halo; pad W halo.
    h_pad = (-h) % tile_h
    f1p = jnp.pad(f1, ((0, 0), (0, h_pad), (0, 0), (0, 0)))
    f2p = jnp.pad(f2, ((0, 0), (r, r + h_pad), (r, r), (0, 0)))
    hp = h + h_pad

    grid = (n, hp // tile_h)
    out = pl.pallas_call(
        functools.partial(_cv_kernel, radius=r, tile_h=tile_h),
        out_shape=jax.ShapeDtypeStruct((n, hp, w, nd), f1.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, w, c),
                lambda ni, hi: (ni, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hp + 2 * r, w + 2 * r, c),
                lambda ni, hi: (ni, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, nd),
            lambda ni, hi: (ni, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )(f1p, f2p)
    return out[:, :h]


def cost_volume(f1: Array, f2: Array, radius: int = 4, impl: str = "pallas") -> Array:
    """Dispatch: impl in {'pallas', 'xla'}; Pallas requires a TPU backend."""
    if impl == "pallas" and jax.default_backend() == "tpu":
        return cost_volume_pallas(f1, f2, radius)
    return cost_volume_xla(f1, f2, radius)


__all__ = ["cost_volume", "cost_volume_xla", "cost_volume_pallas"]
