"""1D warp kernels + two-pass full-frame warp (kernels/warp1d.py).

Oracles: the XLA twins implement identical math (same clipping) so the
Pallas kernels must match them to float tolerance; `warp_twopass` must match
the single-pass gather warp exactly on translation-only flows and closely on
smooth (affine) flows wherever the validity mask is 1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vstab.kernels import (
    bilinear_warp_xla,
    hwarp_pallas,
    hwarp_xla,
    vwarp_pallas,
    vwarp_xla,
    warp_twopass,
    warp_validity,
)


def _rand(shape, seed=0, lo=-1.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.random(shape) * (hi - lo) + lo).astype(np.float32))


def test_vwarp_xla_matches_gather_oracle():
    img = _rand((2, 20, 24, 3), 1, 0, 1)
    v = _rand((2, 20, 24), 2, -5, 5)
    flow = jnp.stack([jnp.zeros_like(v), v], axis=-1)
    out = vwarp_xla(img, v, max_disp=8)
    ref = bilinear_warp_xla(img, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_hwarp_xla_matches_gather_oracle():
    img = _rand((2, 20, 24, 3), 3, 0, 1)
    u = _rand((2, 20, 24), 4, -5, 5)
    flow = jnp.stack([u, jnp.zeros_like(u)], axis=-1)
    out = hwarp_xla(img, u, max_disp=8)
    ref = bilinear_warp_xla(img, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_1d_warps_clip_to_max_disp():
    img = _rand((1, 12, 16, 2), 5, 0, 1)
    v = jnp.full((1, 12, 16), 100.0)
    out = vwarp_xla(img, v, max_disp=3)
    ref = vwarp_xla(img, jnp.full_like(v, 3.0), max_disp=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.tpu
def test_vwarp_pallas_matches_xla():
    img = _rand((2, 40, 200, 5), 6, 0, 1)
    v = _rand((2, 40, 200), 7, -7.5, 7.5)
    out = vwarp_pallas(img, v, max_disp=8, tile_h=16)
    ref = vwarp_xla(img, v, max_disp=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.tpu
def test_hwarp_pallas_matches_xla():
    img = _rand((2, 40, 200, 5), 8, 0, 1)
    u = _rand((2, 40, 200), 9, -7.5, 7.5)
    out = hwarp_pallas(img, u, max_disp=8, tile_h=16)
    ref = hwarp_xla(img, u, max_disp=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.tpu
def test_warp_twopass_pallas_matches_xla_impl():
    img = _rand((2, 48, 160, 3), 10, 0, 1)
    # Smooth flow (the two-pass operating regime): coarse grid upsampled.
    coarse = _rand((2, 4, 6, 2), 11, -6, 6)
    flow = jax.image.resize(coarse, (2, 48, 160, 2), method="bilinear")
    out_p = warp_twopass(img, flow, max_disp=8, impl="pallas")
    out_x = warp_twopass(img, flow, max_disp=8, impl="xla")
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), atol=3e-4
    )


def test_twopass_exact_on_translation():
    """Pure (fractional) translation: two-pass == single-pass bilinear on
    interior pixels."""
    img = _rand((3, 30, 40, 3), 12, 0, 1)
    flow = jnp.broadcast_to(
        jnp.asarray([11.3, -7.6], jnp.float32), (3, 30, 40, 2)
    )
    out = warp_twopass(img, flow, max_disp=4, impl="xla")
    ref = bilinear_warp_xla(img, flow)
    mask = np.asarray(warp_validity((30, 40), flow))[..., None]
    np.testing.assert_allclose(
        np.asarray(out) * mask, np.asarray(ref) * mask, atol=1e-5
    )


def test_twopass_zero_flow_is_identity():
    img = _rand((2, 17, 23, 3), 13, 0, 1)
    out = warp_twopass(img, jnp.zeros((2, 17, 23, 2)), max_disp=4, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_twopass_close_to_single_pass_on_smooth_flow():
    """Small rotation + translation: two-pass matches single-pass to
    interpolation-difference tolerance on valid pixels."""
    from vstab.render.render import affine_to_flow

    h, w = 64, 80
    # Smooth image so double vs single interpolation differ little.
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [np.sin(xx / 9.0) * np.cos(yy / 7.0), (xx + yy) / (h + w), xx / w],
        axis=-1,
    )
    img = jnp.asarray(img)[None]
    th = 0.02
    a = jnp.asarray(
        [[[np.cos(th), -np.sin(th), 6.2], [np.sin(th), np.cos(th), -3.7]]],
        jnp.float32,
    )
    flow = affine_to_flow(a, h, w)
    out = warp_twopass(img, flow, max_disp=8, impl="xla")
    ref = bilinear_warp_xla(img, flow)
    mask = np.asarray(warp_validity((h, w), flow))[..., None]
    err = np.abs(np.asarray(out) - np.asarray(ref)) * mask
    assert err.max() < 5e-3, err.max()


def test_zoom_resample_identity_and_center():
    from vstab.render.render import zoom_resample

    img = _rand((2, 21, 33, 3), 14, 0, 1)
    out = zoom_resample(img, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    out5 = zoom_resample(img, jnp.float32(0.5))
    np.testing.assert_allclose(  # center pixel preserved
        np.asarray(out5[:, 10, 16]), np.asarray(img[:, 10, 16]), atol=1e-5
    )


def test_zoom_resample_matches_gather_warp():
    from vstab.render.render import zoom_resample

    img = _rand((1, 32, 48, 2), 15, 0, 1)
    s = 0.73
    xx, yy = np.meshgrid(np.arange(48), np.arange(32))
    cx, cy = (48 - 1) / 2.0, (32 - 1) / 2.0
    flow = np.stack(
        [(cx + s * (xx - cx)) - xx, (cy + s * (yy - cy)) - yy], axis=-1
    ).astype(np.float32)[None]
    ref = bilinear_warp_xla(img, jnp.asarray(flow))
    out = zoom_resample(img, jnp.float32(s))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
