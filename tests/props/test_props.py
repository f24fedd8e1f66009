"""Property tests (SURVEY.md §4 "Property")."""

import jax.numpy as jnp
import numpy as np

from vstab.core.config import RenderConfig
from vstab.kernels import bilinear_warp_xla, cost_volume_xla
from vstab.render.render import affine_to_flow, grid_to_flow, render_stabilized


def test_warp_preserves_constant_image():
    img = jnp.full((1, 24, 24, 3), 0.7)
    rng = np.random.default_rng(0)
    flow = jnp.asarray((rng.random((1, 24, 24, 2)) * 8 - 4).astype(np.float32))
    out = bilinear_warp_xla(img, flow)
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-5)


def test_cost_volume_scaling():
    """corr is bilinear: scaling either input scales the volume."""
    rng = np.random.default_rng(1)
    f1 = jnp.asarray(rng.normal(size=(1, 10, 12, 6)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(1, 10, 12, 6)).astype(np.float32))
    cv = cost_volume_xla(f1, f2, 2)
    cv2x = cost_volume_xla(2.0 * f1, f2, 2)
    np.testing.assert_allclose(np.asarray(cv2x), 2 * np.asarray(cv), atol=1e-4)


def test_affine_flow_roundtrip():
    """affine_to_flow of identity is zero flow."""
    eye = jnp.broadcast_to(jnp.eye(2, 3), (4, 2, 3))
    flow = affine_to_flow(eye, 16, 20)
    np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-5)


def test_grid_to_flow_constant():
    disp = jnp.ones((2, 4, 4, 2)) * jnp.asarray([3.0, -1.0])
    flow = grid_to_flow(disp, 32, 32)
    np.testing.assert_allclose(
        np.asarray(flow), np.broadcast_to([3.0, -1.0], (2, 32, 32, 2)), atol=1e-4
    )


def test_render_identity_with_zero_flow():
    rng = np.random.default_rng(2)
    frames = jnp.asarray(rng.random((3, 20, 24, 3)).astype(np.float32))
    flow = jnp.zeros((3, 20, 24, 2))
    out = render_stabilized(frames, flow, RenderConfig(crop_mode="none"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(frames), atol=1e-5)


def test_render_fixed_crop_zooms():
    """With fixed crop, the center pixel is preserved and corners move inward."""
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.random((1, 33, 41, 1)).astype(np.float32))
    flow = jnp.zeros((1, 33, 41, 2))
    out = render_stabilized(
        frames, flow, RenderConfig(crop_mode="fixed", fixed_crop_ratio=0.5)
    )
    # center preserved
    np.testing.assert_allclose(
        float(out[0, 16, 20, 0]), float(frames[0, 16, 20, 0]), atol=1e-4
    )
