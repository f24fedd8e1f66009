"""Wide-width (1080p/4K-class) kernel coverage — VERDICT r3 items 1/8.

Round 3's kernels put the whole padded width in one lane block and OOM'd
scoped VMEM at 1080p on the chip; these tests pin the W-tiled redesign at
the widths the BASELINE configs actually use: 1280 (720p), 1920 (1080p),
3840 (4K) for the render-path 1D warps, and the 4K pyramid-level widths for
the feature warp / cost volume. CPU-runnable parts check the tile pickers
and the loud errors for untileable requests.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vstab.kernels.cost_volume import (
    _cv_pick_tiles,
    cost_volume_pallas,
    cost_volume_xla,
)
from vstab.kernels.warp import (
    _bw_pick_tiles,
    bilinear_warp_pallas,
    bilinear_warp_xla,
)
from vstab.kernels.warp1d import (
    _pick_tile_w,
    hwarp_pallas,
    hwarp_xla,
    vwarp_pallas,
    vwarp_xla,
)


def _rand(shape, seed=0, lo=-1.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.random(shape) * (hi - lo) + lo).astype(np.float32))


# ---------------------------------------------------------------------------
# CPU: tile pickers and validation errors
# ---------------------------------------------------------------------------


def test_pick_tile_w_divides_and_bounds():
    for w in (128, 384, 1280, 1408, 2048, 3840, 128 * 17):
        tw = _pick_tile_w(w)
        assert w % tw == 0 and tw % 128 == 0 and tw <= max(1024, 128)


def test_bad_tile_w_raises():
    img = _rand((1, 16, 200, 3), 0, 0, 1)
    v = _rand((1, 16, 200), 1, -4, 4)
    with pytest.raises(ValueError, match="tile_w"):
        vwarp_pallas(img, v, max_disp=4, tile_w=192)  # not /128
    with pytest.raises(ValueError, match="tile_w"):
        hwarp_pallas(img, v, max_disp=4, tile_w=192)  # not /128
    with pytest.raises(ValueError, match="strip"):
        # W-tiled rows need the strip-halo lanes to divide the tile lanes;
        # at C=3 that breaks around d=110 (far beyond the adaptive
        # renderer's cap of 63)
        hwarp_pallas(
            _rand((1, 16, 4000, 3), 0, 0, 1),
            _rand((1, 16, 4000), 1, -4, 4),
            max_disp=100, tile_h=104,
        )


def test_vwarp_halo_constraint_raises():
    img = _rand((1, 16, 128, 3), 0, 0, 1)
    v = _rand((1, 16, 128), 1, -4, 4)
    with pytest.raises(ValueError, match="max_disp"):
        vwarp_pallas(img, v, max_disp=40, tile_h=16)


def test_feature_tile_pickers_cover_pyramid_levels():
    # Every (width, channels) the PWC-Net pyramid produces at 720p/1080p/4K
    # must yield a legal static tiling (no exception) for f32 and bf16.
    for full_w, base in ((1280, 720), (1920, 1080), (3840, 2160)):
        for lvl, c in zip(range(1, 7), (16, 32, 64, 96, 128, 196)):
            w = max(1, full_w >> lvl)
            wp = -(-(w + 2 * 8 + 1) // 128) * 128
            tw, tc, _ = _bw_pick_tiles(wp, c, 16, 4)
            assert wp % tw == 0 and c % tc == 0
            wp_cv = -(-(w + 2 * 4) // 128) * 128
            th, tw, _ = _cv_pick_tiles(wp_cv, c, 81, 4, 4)
            assert wp_cv % tw == 0 and 2 * 4 <= th


# ---------------------------------------------------------------------------
# TPU: XLA-vs-Pallas at contract widths
# ---------------------------------------------------------------------------


@pytest.mark.tpu
@pytest.mark.parametrize("w", [1280, 1920, 3840])
def test_1d_warps_wide(w):
    img = _rand((1, 64, w, 3), 10, 0, 1)
    f = _rand((1, 64, w), 11, -11.5, 11.5)
    out = vwarp_pallas(img, f, max_disp=16)
    ref = vwarp_xla(img, f, max_disp=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)
    out = hwarp_pallas(img, f, max_disp=16)
    ref = hwarp_xla(img, f, max_disp=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)


@pytest.mark.tpu
def test_1d_warps_large_disp_bucket():
    """The adaptive renderer's d=63 bucket must compile and match."""
    img = _rand((1, 48, 640, 3), 12, 0, 1)
    f = _rand((1, 48, 640), 13, -50.0, 50.0)
    out = vwarp_pallas(img, f, max_disp=63, tile_h=64)
    ref = vwarp_xla(img, f, max_disp=63)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)
    out = hwarp_pallas(img, f, max_disp=63, tile_h=64)
    ref = hwarp_xla(img, f, max_disp=63)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)


@pytest.mark.tpu
@pytest.mark.parametrize("d,w", [(127, 1920), (255, 1920), (255, 3840)])
def test_1d_warps_contract_disp_buckets(d, w):
    """VERDICT r4 item 1: the 127/255 buckets at 1080p/4K widths — smooth
    rotation-scale fields (the real contract workload), checked against the
    XLA twins through the public auto-tiled wrappers."""
    from vstab.kernels.warp1d import hwarp, vwarp

    n, h = 1, 96
    img = _rand((n, h, w, 3), 30, 0, 1)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # rotation+zoom-like smooth field spanning most of [-d, d]
    f = 0.9 * d * (2.0 * xx / w - 1.0) + 0.05 * d * np.sin(yy / 17.0)
    f = jnp.asarray(np.broadcast_to(f[None], (n, h, w)).copy())
    out = vwarp(img, f, max_disp=d, impl="pallas")
    ref = vwarp_xla(img, f, max_disp=d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)
    out = hwarp(img, f, max_disp=d, impl="pallas")
    ref = hwarp_xla(img, f, max_disp=d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)


@pytest.mark.tpu
def test_bilinear_warp_wide_feature_level():
    """4K level-1/2 feature-warp shapes (wide, low-C -> W-tiled path)."""
    img = _rand((1, 128, 1920, 16), 14, 0, 1)
    fl = _rand((1, 128, 1920, 2), 15, -7.5, 7.5)
    out = bilinear_warp_pallas(img, fl, max_disp=8)
    ref = bilinear_warp_xla(img, jnp.clip(fl, -8, 8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)


@pytest.mark.tpu
def test_cost_volume_wide_feature_level():
    """4K level-2 cost-volume shape (the judge-style audit of VERDICT r3)."""
    f1 = _rand((1, 128, 960, 32), 16)
    f2 = _rand((1, 128, 960, 32), 17)
    out = cost_volume_pallas(f1, f2, radius=4)
    ref = cost_volume_xla(f1, f2, radius=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


@pytest.mark.tpu
def test_forced_wide_paths_match_narrow():
    """Explicit tile_w exercises the wide kernels even at narrow widths."""
    img = _rand((2, 40, 300, 16), 18, 0, 1)
    fl = _rand((2, 40, 300, 2), 19, -7.5, 7.5)
    ref = bilinear_warp_xla(img, jnp.clip(fl, -8, 8))
    out = bilinear_warp_pallas(img, fl, max_disp=8, tile_w=128, tile_c=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)
    f1 = _rand((2, 40, 300, 16), 20)
    f2 = _rand((2, 40, 300, 16), 21)
    ref = cost_volume_xla(f1, f2, radius=4)
    out = cost_volume_pallas(f1, f2, radius=4, tile_w=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
