"""Bilinear-warp kernel tests (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.ndimage import map_coordinates

from vstab.kernels import bilinear_warp_pallas, bilinear_warp_xla, warp_validity


def test_zero_flow_identity():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 17, 23, 3)).astype(np.float32))
    flow = jnp.zeros((2, 17, 23, 2))
    out = bilinear_warp_xla(img, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_integer_shift():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((1, 16, 16, 2)).astype(np.float32))
    flow = jnp.full((1, 16, 16, 2), 0.0).at[..., 0].set(3.0)  # sample x+3
    out = np.asarray(bilinear_warp_xla(img, flow))
    want = np.asarray(img)[:, :, 3:]
    np.testing.assert_allclose(out[:, :, :-3], want, atol=1e-6)


def test_vs_map_coordinates():
    rng = np.random.default_rng(2)
    img = rng.random((1, 20, 24, 1)).astype(np.float32)
    flow = (rng.random((1, 20, 24, 2)).astype(np.float32) - 0.5) * 6
    out = np.asarray(bilinear_warp_xla(jnp.asarray(img), jnp.asarray(flow)))
    yy, xx = np.mgrid[0:20, 0:24].astype(np.float32)
    coords = jnp.stack(
        [jnp.asarray(yy + flow[0, ..., 1]), jnp.asarray(xx + flow[0, ..., 0])]
    )
    want = np.asarray(
        map_coordinates(jnp.asarray(img[0, ..., 0]), list(coords), order=1, mode="nearest")
    )
    np.testing.assert_allclose(out[0, ..., 0], want, atol=1e-5)


def test_validity_mask():
    flow = jnp.zeros((1, 8, 8, 2)).at[0, 0, 0, 0].set(-1.0)  # samples x=-1
    mask = warp_validity((8, 8), flow)
    assert float(mask[0, 0, 0]) == 0.0
    assert float(mask[0, 4, 4]) == 1.0


def test_differentiable():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((1, 12, 12, 1)).astype(np.float32))
    flow = jnp.asarray((rng.random((1, 12, 12, 2)).astype(np.float32) - 0.5))

    def loss(fl):
        return jnp.sum(bilinear_warp_xla(img, fl) ** 2)

    g = jax.grad(loss)(flow)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.tpu
@pytest.mark.parametrize("shape,d", [((1, 32, 40, 8), 4), ((2, 33, 47, 3), 6)])
def test_pallas_vs_xla_bounded(shape, d):
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random(shape).astype(np.float32))
    n, h, w, c = shape
    flow = jnp.asarray(
        ((rng.random((n, h, w, 2)) - 0.5) * 2 * (d - 0.5)).astype(np.float32)
    )
    got = np.asarray(bilinear_warp_pallas(img, flow, max_disp=d, tile_h=16))
    want = np.asarray(bilinear_warp_xla(img, flow))
    # Interior must match exactly; borders differ (edge-pad vs clamp are the
    # same policy, so they should match too).
    np.testing.assert_allclose(got, want, atol=1e-4)
