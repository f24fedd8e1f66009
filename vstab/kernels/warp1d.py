"""Separable 1D warp kernels and the two-pass full-frame warp.

TPU-native redesign of the render-path resampler (SURVEY.md §3.1 "HOT LOOP 3",
VERDICT.md round-1 item 1: the gather-based full-res warp made TPU ≈ CPU).
Reference equivalent: `tf.contrib.image.dense_image_warp`-style resampler
[EXT — reference mount empty, SURVEY.md §0].

Design: TPU has no fast arbitrary gather, but a *bounded* 1D resample is an
O(span) select-accumulate on the VPU (span = 2·max_disp+2), vs O(span²) for
the 2D select-accumulate kernel in `warp.py`. A general smooth warp
factorizes exactly into
  1. a per-frame integer mean shift (roll — pure data movement),
  2. a vertical 1D pass   A(r,x) = F(r + vv(r,x), x),
  3. a horizontal 1D pass out(y,x) = A(y, x + u(y,x)),
where vv is the vertical field resampled at the *inverse* of the horizontal
map (computed by fixed-point iteration; error O(d·|∂u/∂x|^k) — sub-0.1px for
stabilization warps). Both 1D passes are Pallas kernels with XLA twins that
implement bit-identical math (same clipping) for CPU/testing.

Output contract of `warp_twopass`: equals the ideal backward bilinear warp
wherever `warp_validity(flow) == 1` AND the post-mean-shift residual
displacement is within `max_disp`; border pixels (validity 0) hold
unspecified values and must be masked by the caller (the renderer does).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tile_w(wp: int, max_lanes: int = 1024) -> int:
    """Largest multiple-of-128 divisor of wp (itself a multiple of 128) that
    is <= max_lanes. Tiling W bounds per-block VMEM: the round-3 kernels put
    the whole padded width in one block and blew the 16MB scoped-VMEM limit
    at 1080p (VERDICT r3 missing-1: 17.91MB > 16MB at wp=2048). A divisor
    always exists (m=1 -> 128 lanes), so every width is tileable."""
    k = wp // 128
    m = min(k, max(1, max_lanes // 128))
    while k % m:
        m -= 1
    return m * 128


# ---------------------------------------------------------------------------
# XLA twins (reference semantics; also the CPU path)
# ---------------------------------------------------------------------------


def _take_rows(img: Array, rows: Array) -> Array:
    """img [H,C,W], rows [H,W] int -> out[y,c,x] = img[rows[y,x], c, x]."""
    h, c, w = img.shape
    # one-hot contraction would be [H,H] per column; use take_along_axis:
    idx = jnp.broadcast_to(rows[:, None, :], (h, c, w))
    return jnp.take_along_axis(img, idx, axis=0)


# Frames processed per lax.map chunk in the XLA twins: vectorized enough to
# keep CPU throughput, small enough that the take_along_axis index buffers
# stay O(chunk) — the round-3 vmap-over-everything version materialized
# s32[64,1080,...] gather indices for a whole 64-frame block at once and
# HBM-OOM'd at 1080p (VERDICT r3 missing-1, XLA fallback leg).
_XLA_MAP_CHUNK = 8


def vwarp_xla(
    img: Array, v: Array, max_disp: int = 16, mode: str = "edge"
) -> Array:
    """Vertical 1D warp, [N,H,W,C] by v [N,H,W] (displacement in rows).
    mode: out-of-range taps 'edge'-clamp or 'wrap' (periodic — used by
    warp_twopass, whose mean-shift roll puts edge content there)."""

    def one(im, vf):
        imt = jnp.transpose(im, (0, 2, 1))  # [H,C,W]
        h, c, w = imt.shape
        yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        sy = yy + jnp.clip(vf.astype(jnp.float32), -max_disp, max_disp)
        y0f = jnp.floor(sy)
        fy = (sy - y0f)[:, None, :]
        y0 = y0f.astype(jnp.int32)
        fix = (lambda i: i % h) if mode == "wrap" else (
            lambda i: jnp.clip(i, 0, h - 1)
        )
        a = _take_rows(imt, fix(y0))
        b = _take_rows(imt, fix(y0 + 1))
        out = (1.0 - fy) * a.astype(jnp.float32) + fy * b.astype(jnp.float32)
        return jnp.transpose(out.astype(im.dtype), (0, 2, 1))

    return jax.lax.map(
        lambda args: one(*args), (img, v), batch_size=_XLA_MAP_CHUNK
    )


def hwarp_xla(
    img: Array, u: Array, max_disp: int = 16, mode: str = "edge"
) -> Array:
    """Horizontal 1D warp, [N,H,W,C] by u [N,H,W] (displacement in cols).
    mode: 'edge' clamp or 'wrap' (see vwarp_xla)."""

    def one(im, uf):
        h, w, c = im.shape
        xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        sx = xx + jnp.clip(uf.astype(jnp.float32), -max_disp, max_disp)
        x0f = jnp.floor(sx)
        fx = (sx - x0f)[..., None]
        x0 = x0f.astype(jnp.int32)
        fix = (lambda i: i % w) if mode == "wrap" else (
            lambda i: jnp.clip(i, 0, w - 1)
        )
        idx0 = jnp.broadcast_to(fix(x0)[..., None], (h, w, c))
        idx1 = jnp.broadcast_to(fix(x0 + 1)[..., None], (h, w, c))
        a = jnp.take_along_axis(im, idx0, axis=1).astype(jnp.float32)
        b = jnp.take_along_axis(im, idx1, axis=1).astype(jnp.float32)
        return ((1.0 - fx) * a + fx * b).astype(im.dtype)

    return jax.lax.map(
        lambda args: one(*args), (img, u), batch_size=_XLA_MAP_CHUNK
    )


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _expand_field(f: Array, c: int) -> Array:
    """[N,H,Wp] per-pixel field -> [N,H,Wp*c] interleaved-lane copy
    (f_e[..., l] = f[..., l//c]): the kernels run in the channel-interleaved
    layout, so per-pixel weights must ride the same lanes. One broadcast +
    reshape on the host graph — the price of having NO transposes anywhere
    (the round-4a channels-on-sublanes kernels spent more time in the
    [N,H,W,C]->[N,H,C,W] relayouts around each pallas_call than inside it:
    measured ~5% of HBM speed-of-light end to end)."""
    n, h, wp = f.shape
    if c == 1:
        return f
    return jnp.broadcast_to(f[..., None], (n, h, wp, c)).reshape(n, h, wp * c)


def _vwarp_kernel(v_ref, img_a, img_b, img_c, out_ref, band_ref, *, max_disp: int):
    """Vertical pass, channel-interleaved lanes. Blocks: expanded field and
    image both [1,th,tl] with tl = tile_px*C lanes; image as THREE
    consecutive row-blocks of the top-edge-padded image (halo 2d+2 <=
    2*tile_h). The vertical pass reads only its own lanes, so the lane grid
    axis needs NO halo. Select-accumulate over the integer row offsets with
    tent weights; the 3-block band is staged into a VMEM scratch ref and
    the row window is a pl.ds ref-read on the untiled row axis — no
    gathers, no rolls, no transposes."""
    d = max_disp
    _, th, tl = out_ref.shape
    v = jnp.clip(v_ref[0].astype(jnp.float32), -d, d)  # [th, tl]
    y0 = jnp.floor(v).astype(jnp.int32)
    fy = v - y0.astype(jnp.float32)
    band_ref[0:th] = img_a[0].astype(jnp.float32)
    band_ref[th : 2 * th] = img_b[0].astype(jnp.float32)
    band_ref[2 * th : 3 * th] = img_c[0].astype(jnp.float32)

    # Data-dependent trip bounds (exact): ly(k) is identically zero outside
    # k in [min(y0)+d, max(y0)+d+1], and for the smooth residual fields of
    # stabilization the PER-TILE range of y0 is a few pixels — so this
    # visits ~range/8+1 row GROUPS instead of the full 2d+2 taps (34..128).
    # Groups of 8: Mosaic requires dynamic sublane slice starts provably
    # 8-aligned, so the loop walks 8-aligned windows of th+8 rows (static
    # shape) and the 8 in-group taps are static value slices.
    def group(g, acc):
        base = pl.multiple_of(g * 8, 8)
        win = band_ref[pl.ds(base, th + 8)]  # [th+8, tl]
        for r in range(8):
            dy = g * 8 + r - d
            ly = (1.0 - fy) * (y0 == dy).astype(jnp.float32) + fy * (
                y0 == dy - 1
            ).astype(jnp.float32)
            acc = acc + ly * win[r : r + th]
        return acc

    acc = jax.lax.fori_loop(
        (jnp.min(y0) + d) // 8,
        (jnp.max(y0) + d + 1) // 8 + 1,
        group,
        jnp.zeros((th, tl), jnp.float32),
    )
    out_ref[0] = acc.astype(out_ref.dtype)


def _hwarp_kernel_narrow(u_ref, img_ref, out_ref, *, max_disp: int, c: int):
    """Horizontal pass, one lane tile per row, channel-interleaved lanes.
    No row halo; the x halo lives in the lane padding (image edge-padded by
    d pixels = d*C lanes on the left). fori_loop over the column offsets
    with a dynamic lane roll of C*j — one rolled band live at a time."""
    d = max_disp
    _, th, wl = out_ref.shape
    u = jnp.clip(u_ref[0].astype(jnp.float32), -d, d)  # [th, wl]
    x0 = jnp.floor(u).astype(jnp.int32)
    fx = u - x0.astype(jnp.float32)
    img = img_ref[0].astype(jnp.float32)  # [th, wl]

    def body(j, acc):
        dx = j - d
        lx = (1.0 - fx) * (x0 == dx).astype(jnp.float32) + fx * (
            x0 == dx - 1
        ).astype(jnp.float32)
        # shifted[l] = img[l + c*j] (pixel shift j); wrap lands in padding.
        rolled = pltpu.roll(img, shift=(wl - c * j) % wl, axis=1)
        return acc + lx * rolled

    # Data-dependent trip bounds — see _vwarp_kernel.
    acc = jax.lax.fori_loop(
        jnp.min(x0) + d,
        jnp.max(x0) + d + 2,
        body,
        jnp.zeros((th, wl), jnp.float32),
    )
    out_ref[0] = acc.astype(out_ref.dtype)


def _hwarp_kernel_wide(
    u_ref, img_ref, strip_ref, out_ref, *, max_disp: int, c: int
):
    """Horizontal pass, lane-tiled row, channel-interleaved lanes. The x
    halo comes from a NARROW strip view (round_up(C*(2d+2),128) lanes) at
    the next tile's start — not a full adjacent block (a full 2nd block
    doubles image fetch). Taps for output lane l sit at band lanes
    l..l+C*(2d+1), in-range because C*(2d+2) <= strip lanes. One rolled
    band live per fori_loop step."""
    d = max_disp
    _, th, tl = out_ref.shape
    sl = strip_ref.shape[2]
    u = jnp.clip(u_ref[0].astype(jnp.float32), -d, d)  # [th, tl]
    x0 = jnp.floor(u).astype(jnp.int32)
    fx = u - x0.astype(jnp.float32)
    band = jnp.concatenate(
        [img_ref[0], strip_ref[0]], axis=1
    ).astype(jnp.float32)  # [th, tl + sl]

    def body(j, acc):
        dx = j - d
        lx = (1.0 - fx) * (x0 == dx).astype(jnp.float32) + fx * (
            x0 == dx - 1
        ).astype(jnp.float32)
        wl = tl + sl
        rolled = pltpu.roll(band, shift=(wl - c * j) % wl, axis=1)
        return acc + lx * rolled[:, :tl]

    # Data-dependent trip bounds — see _vwarp_kernel.
    acc = jax.lax.fori_loop(
        jnp.min(x0) + d,
        jnp.max(x0) + d + 2,
        body,
        jnp.zeros((th, tl), jnp.float32),
    )
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("max_disp", "tile_h", "mode", "tile_w")
)
def vwarp_pallas(
    img: Array, v: Array, max_disp: int = 16, tile_h: int = 32,
    mode: str = "edge", tile_w: int | None = None,
) -> Array:
    """Vertical 1D warp on TPU, [N,H,W,C] by v [N,H,W], |v| clipped to
    max_disp. Requires 2*max_disp + 2 <= 2*tile_h. mode: 'edge'|'wrap'
    out-of-range tap handling (implemented as the pad mode).

    Channel-interleaved lane layout: the image is viewed as [N,H,W*C] (a
    free reshape — NO transpose; relayouts around each pallas_call were the
    dominant cost of the channels-on-sublanes version), the field is
    lane-expanded, and the kernel grids over rows (3-block halo) and lanes
    (no halo), so any width compiles in bounded VMEM (VERDICT r3
    missing-1)."""
    n, h, w, c = img.shape
    d = max_disp
    if 2 * d + 2 > 2 * tile_h:
        raise ValueError(f"2*max_disp+2={2*d+2} must be <= 2*tile_h={2*tile_h}")
    if tile_h % 8:
        # The kernel's 8-aligned group windows read band_ref[8g : 8g+th+8];
        # for th % 8 != 0 the last window can run past the 3*th scratch
        # (ADVICE r4): enforce the alignment every internal caller satisfies.
        raise ValueError(f"tile_h={tile_h} must be a multiple of 8")
    wp = _round_up(w, 128)
    # Lane budget 3072 at tile_h<=64: 3840-lane tiles measured 17.2MB scoped
    # VMEM (over the 16MB limit) once XLA pipelines the call inside a larger
    # program. For the large-displacement buckets (tile_h 128/256, VERDICT r4
    # item 1) hold the tile AREA at the chip-verified 64x3072 product — the
    # band scratch and the in/out blocks all scale as tile_h * lanes, so
    # equal area means equal VMEM footprint.
    budget = 3072 if tile_h <= 64 else max(384, 3072 * 64 // tile_h)
    tw = tile_w or _pick_tile_w(wp, max_lanes=max(128, budget // c // 128 * 128))
    if wp % tw or tw % 128:
        raise ValueError(f"tile_w={tw} must be a multiple-of-128 divisor of {wp}")
    tl = tw * c
    hp = _round_up(h, tile_h)
    # Pad W (zeros — vertical taps never cross columns; padded lanes are
    # sliced off), reshape to interleaved lanes, then pad rows: top edge/
    # wrap pad by d (clamped sampling == sampling the padded image), bottom
    # to hp + 2 tiles so the hi+1 / hi+2 block views exist.
    imgl = jnp.pad(img, ((0, 0), (0, 0), (0, wp - w), (0, 0))).reshape(
        n, h, wp * c
    )
    imgp = jnp.pad(
        imgl, ((0, 0), (d, hp + 2 * tile_h - h - d), (0, 0)), mode=mode
    )
    vp = _expand_field(jnp.pad(v, ((0, 0), (0, hp - h), (0, wp - w))), c)
    out = pl.pallas_call(
        functools.partial(_vwarp_kernel, max_disp=d),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp * c), img.dtype),
        grid=(n, hp // tile_h, (wp * c) // tl),
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, tl), lambda ni, hi, wi: (ni, hi, wi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_h, tl), lambda ni, hi, wi: (ni, hi, wi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_h, tl), lambda ni, hi, wi: (ni, hi + 1, wi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_h, tl), lambda ni, hi, wi: (ni, hi + 2, wi),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, tl), lambda ni, hi, wi: (ni, hi, wi),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((3 * tile_h, tl), jnp.float32)],
    )(vp, imgp, imgp, imgp)
    return out.reshape(n, hp, wp, c)[:, :h, :w]


# Single-block rows up to this many lanes. 6144 measured 16.7MB scoped VMEM
# at 1080p/d=48 once XLA pipelines the call inside a larger program; 4096
# keeps slack, and the wide path's strip halo costs only ~8% extra fetch.
# (At 4096, 1080p C=3 rows — 6144 lanes — take the WIDE path and pay that
# ~8%; measured safe, and the slack is worth it. VERDICT r4 weak-4.)
_HWARP_NARROW_MAX_LANES = 4096


@functools.partial(
    jax.jit, static_argnames=("max_disp", "tile_h", "mode", "tile_w")
)
def hwarp_pallas(
    img: Array, u: Array, max_disp: int = 16, tile_h: int = 32,
    mode: str = "edge", tile_w: int | None = None,
) -> Array:
    """Horizontal 1D warp on TPU, [N,H,W,C] by u [N,H,W], |u| clipped to
    max_disp. mode: 'edge'|'wrap' out-of-range tap handling.

    Channel-interleaved lane layout ([N,H,W*C] view, NO transposes; pixel
    tap j is a lane roll of C*j). Narrow rows (padded W*C <= 4096 lanes,
    _HWARP_NARROW_MAX_LANES) keep the whole row in one lane block — zero
    halo overhead. Wider rows grid over W in 512-PIXEL tiles, padding the
    row width up to a 512 multiple (divisor-only tiling degenerates to tiny
    tiles when wp/128 is prime), with a narrow STRIP view of
    round_up(C*(2d+2), 128) lanes as the lane halo, so any width compiles
    in bounded VMEM (VERDICT r3 missing-1). The wide path needs the strip
    to divide the tile: C*(2d+2) <= 512*C holds exactly up to d = 255 (the
    adaptive renderer's cap, core/config.py max_disp_limit), and for C=3
    the rounded strip divides 1536 tile lanes at the bucket values
    d in {16,24,32,48,63,127,255} (render._DISP_BUCKETS)."""
    n, h, w, c = img.shape
    d = max_disp
    if tile_w is not None:
        wp = _round_up(w + 2 * d + 1, tile_w)
        tw = tile_w
    elif _round_up(w + 2 * d + 1, 128) * c <= _HWARP_NARROW_MAX_LANES:
        wp = tw = _round_up(w + 2 * d + 1, 128)
    else:
        wp = _round_up(w + 2 * d + 1, 512)
        tw = 512
    narrow = tw == wp
    if wp % tw or tw % 128:
        raise ValueError(f"tile_w={tw} must be a multiple-of-128 divisor of {wp}")
    tl = tw * c
    sl = _round_up(c * (2 * d + 2), 128)  # strip lanes (wide path halo)
    if not narrow and (sl > tl or tl % sl):
        raise ValueError(
            f"strip-halo lanes {sl} must divide tile lanes {tl} "
            f"(max_disp={d} too large for tile_w={tw} at C={c})"
        )
    hp = _round_up(h, tile_h)
    # Left edge/wrap-pad by d PIXELS in 4D (padding the interleaved lane
    # axis directly would replicate single channel values), then reshape to
    # interleaved lanes. Wide path zero-pads one extra lane-tile so the
    # strip halo view exists (its content is never consumed by kept output
    # columns: taps from column x < w stay below lane (w + 2d)*c < wp*c);
    # tl is a multiple of sl, so both block tilings divide the padded size.
    imgp4 = jnp.pad(
        img, ((0, 0), (0, 0), (d, wp - w - d), (0, 0)), mode=mode
    )
    imgl = imgp4.reshape(n, h, wp * c)
    if not narrow:
        imgl = jnp.pad(imgl, ((0, 0), (0, 0), (0, tl)))
    imgp = jnp.pad(imgl, ((0, 0), (0, hp - h), (0, 0)))
    up = _expand_field(jnp.pad(u, ((0, 0), (0, hp - h), (0, wp - w))), c)
    if narrow:
        kernel = functools.partial(_hwarp_kernel_narrow, max_disp=d, c=c)
        grid = (n, hp // tile_h)
        in_specs = [
            pl.BlockSpec(
                (1, tile_h, wp * c), lambda ni, hi: (ni, hi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_h, wp * c), lambda ni, hi: (ni, hi, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        operands = (up, imgp)
    else:
        kernel = functools.partial(_hwarp_kernel_wide, max_disp=d, c=c)
        grid = (n, hp // tile_h, wp // tw)
        m = tl // sl  # strip index units are sl-lane blocks
        in_specs = [
            pl.BlockSpec(
                (1, tile_h, tl), lambda ni, hi, wi: (ni, hi, wi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_h, tl), lambda ni, hi, wi: (ni, hi, wi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_h, sl),
                lambda ni, hi, wi, _m=m: (ni, hi, (wi + 1) * _m),
                memory_space=pltpu.VMEM,
            ),
        ]
        operands = (up, imgp, imgp)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, hp, wp * c), img.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile_h, (wp * c) if narrow else tl),
            (lambda ni, hi: (ni, hi, 0)) if narrow
            else (lambda ni, hi, wi: (ni, hi, wi)),
            memory_space=pltpu.VMEM,
        ),
    )(*operands)
    return out.reshape(n, hp, wp, c)[:, :h, :w]


def _auto_tile_h(max_disp: int) -> int:
    """Smallest tile_h satisfying the vertical pass's 2-extra-row-block halo
    constraint (tile_h >= max_disp + 1), floored at 32 — lets the adaptive
    renderer raise max_disp up to 255 (VERDICT r3 item 7 / r4 item 1)
    without manual plumbing. vwarp_pallas narrows its lane tiles to keep
    the tile area (and hence VMEM) constant as tile_h grows."""
    return max(32, _round_up(max_disp + 1, 8))


def vwarp(
    img: Array, v: Array, max_disp: int = 16, impl: str = "auto",
    mode: str = "edge",
) -> Array:
    if _use_pallas(impl):
        return vwarp_pallas(
            img, v, max_disp=max_disp, mode=mode,
            tile_h=_auto_tile_h(max_disp),
        )
    return vwarp_xla(img, v, max_disp=max_disp, mode=mode)


def hwarp(
    img: Array, u: Array, max_disp: int = 16, impl: str = "auto",
    mode: str = "edge",
) -> Array:
    if _use_pallas(impl):
        # The horizontal pass has NO row halo — its tile_h is free, so it
        # stays at the chip-verified <=64 even for the 127/255 buckets
        # (only vwarp's band needs tile_h >= d+1).
        return hwarp_pallas(
            img, u, max_disp=max_disp, mode=mode,
            tile_h=_auto_tile_h(min(max_disp, 63)),
        )
    return hwarp_xla(img, u, max_disp=max_disp, mode=mode)


def _use_pallas(impl: str) -> bool:
    if impl == "pallas":
        return True
    if impl == "xla":
        return False
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Two-pass full-frame warp
# ---------------------------------------------------------------------------


def warp_twopass(
    frames: Array,
    flow: Array,
    max_disp: int = 16,
    impl: str = "auto",
    inv_iters: int | None = None,
) -> Array:
    """Backward warp frames [N,H,W,C] by flow [N,H,W,2] via mean-shift +
    vertical pass + horizontal pass (module docstring). Valid wherever
    `warp_validity(flow)=1` and the per-frame mean-removed residual is within
    `max_disp`; callers mask the rest.

    inv_iters (default: 2, or 3 for the large buckets d > 63) controls the
    fixed-point iteration for the inverse horizontal map; its error is
    O(|u| * |du/dx|^k), so the contract-scale rotation/zoom residuals
    (VERDICT r4 item 1: ~100px at 1080p) get one extra refinement."""
    if inv_iters is None:
        inv_iters = 2 if max_disp <= 63 else 3
    n, h, w, c = frames.shape
    u = flow[..., 0].astype(jnp.float32)
    v = flow[..., 1].astype(jnp.float32)
    mu = jnp.round(jnp.mean(u, axis=(1, 2)))
    mv = jnp.round(jnp.mean(v, axis=(1, 2)))
    # F_m(q) = F(q + m): roll by -m. Because roll is modular, wherever the
    # ideal sample q + m + residual is inside the original frame, the content
    # is available in F_m modulo the frame size — so wrap-mode taps in the
    # vertical pass recover it exactly.
    frames_m = jax.vmap(
        lambda f, s: jnp.roll(f, shift=(-s[0], -s[1]), axis=(0, 1))
    )(frames, jnp.stack([mv, mu], axis=-1).astype(jnp.int32))
    ur = u - mu[:, None, None]
    vr = v - mv[:, None, None]

    # Horizontal wrap, however, cannot be handled by wrap-mode taps in the
    # SECOND pass: a wrapped tap at column x' would consume a vertical-pass
    # value computed with the field at x', not at the claimant's virtual
    # column x' ∓ W. Instead, extend the working domain horizontally by
    # dpad = max_disp+1 columns: image wrap-padded (true rolled content),
    # fields edge-extended — then second-pass taps never leave the domain.
    dpad = max_disp + 1
    fpad = lambda f: jnp.pad(f, ((0, 0), (0, 0), (dpad, dpad)), mode="edge")
    ur_e = fpad(ur)
    vr_e = fpad(vr)
    fm_e = jnp.pad(
        frames_m, ((0, 0), (0, 0), (dpad, dpad), (0, 0)), mode="wrap"
    )

    def hw1(field, disp):  # horizontal warp of a single-channel field
        return hwarp(field[..., None], disp, max_disp=max_disp, impl=impl)[..., 0]

    # Fixed point for the inverse horizontal map: delta = -ur(x + delta).
    delta = -ur_e
    for _ in range(max(0, inv_iters - 1)):
        delta = -hw1(ur_e, delta)
    vv = hw1(vr_e, delta)  # vertical field in post-horizontal coordinates
    a = vwarp(fm_e, vv, max_disp=max_disp, impl=impl, mode="wrap")
    out_e = hwarp(a, ur_e, max_disp=max_disp, impl=impl)
    return out_e[:, :, dpad : dpad + w]


def twopass_validity(shape_hw, flow: Array, max_disp: int = 16) -> Array:
    """[N,H,W] float mask: 1 where `warp_twopass` equals the ideal backward
    bilinear warp — all four taps in-bounds (kernels.warp.warp_validity) AND
    the per-frame mean-removed residual displacement within `max_disp`.

    The 1D kernels silently clip residuals beyond max_disp, so renderers
    must mask with THIS, not plain warp_validity, or clipped pixels present
    as valid output (ADVICE.md r2, medium)."""
    from vstab.kernels.warp import warp_validity

    u = flow[..., 0].astype(jnp.float32)
    v = flow[..., 1].astype(jnp.float32)
    mu = jnp.round(jnp.mean(u, axis=(1, 2)))
    mv = jnp.round(jnp.mean(v, axis=(1, 2)))
    ok = (jnp.abs(u - mu[:, None, None]) <= max_disp) & (
        jnp.abs(v - mv[:, None, None]) <= max_disp
    )
    return warp_validity(shape_hw, flow) * ok.astype(jnp.float32)


__all__ = [
    "vwarp",
    "hwarp",
    "vwarp_xla",
    "hwarp_xla",
    "vwarp_pallas",
    "hwarp_pallas",
    "warp_twopass",
    "twopass_validity",
]
