"""Affine smoothing path tests (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from vstab.core.types import apply_affine, compose_affine, invert_affine
from vstab.render.render import affine_to_flow
from vstab.smooth.affine import (
    chain_path,
    fit_affine_from_flow,
    smooth_path,
    stabilizing_transforms,
)


def test_fit_affine_recovers_known_transform():
    a = jnp.asarray([[[1.01, 0.02, 3.0], [-0.02, 0.99, -2.0]]], jnp.float32)
    flow = affine_to_flow(a, 64, 80)
    fit = fit_affine_from_flow(flow)
    np.testing.assert_allclose(np.asarray(fit), np.asarray(a), atol=1e-3)


def test_fit_affine_robust_to_outliers():
    """A moving foreground block shouldn't drag the global fit."""
    a = jnp.asarray([[[1.0, 0.0, 5.0], [0.0, 1.0, 0.0]]], jnp.float32)
    flow = affine_to_flow(a, 64, 80)
    flow = flow.at[:, 20:36, 30:50, :].add(25.0)  # outlier foreground
    fit = fit_affine_from_flow(flow)
    np.testing.assert_allclose(np.asarray(fit), np.asarray(a), atol=0.5)


def test_chain_path_composition():
    rng = np.random.default_rng(0)
    pair = np.repeat(np.eye(2, 3, dtype=np.float32)[None], 5, axis=0)
    pair[:, :, 2] = rng.normal(size=(5, 2))
    path = chain_path(jnp.asarray(pair)).transforms
    # translation-only: C_t = sum of pair translations
    want = np.concatenate(
        [np.zeros((1, 2)), np.cumsum(pair[:, :, 2], axis=0)], axis=0
    )
    np.testing.assert_allclose(np.asarray(path[:, :, 2]), want, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(path[:, :, :2]),
        np.broadcast_to(np.eye(2), (6, 2, 2)),
        atol=1e-6,
    )


def test_smooth_path_reduces_variance():
    rng = np.random.default_rng(1)
    t = 60
    transforms = np.repeat(np.eye(2, 3, dtype=np.float32)[None], t, axis=0)
    transforms[:, :, 2] = rng.normal(0, 5, size=(t, 2))
    from vstab.core.types import CameraPath

    sm = smooth_path(CameraPath(jnp.asarray(transforms)), sigma=6.0)
    assert np.var(np.asarray(sm.transforms[:, 0, 2])) < 0.2 * np.var(
        transforms[:, 0, 2]
    )


def test_stabilizing_transform_identity_when_smooth_equals_path():
    from vstab.core.types import CameraPath

    rng = np.random.default_rng(2)
    tr = np.repeat(np.eye(2, 3, dtype=np.float32)[None], 10, axis=0)
    tr[:, :, 2] = rng.normal(size=(10, 2))
    p = CameraPath(jnp.asarray(tr))
    w = stabilizing_transforms(p, p)
    np.testing.assert_allclose(
        np.asarray(w),
        np.broadcast_to(np.eye(2, 3, dtype=np.float32), (10, 2, 3)),
        atol=1e-5,
    )


def test_affine_inverse_and_compose():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(4, 2, 3)).astype(np.float32))
    a = a.at[:, :, :2].add(2 * jnp.eye(2))  # well-conditioned
    ident = compose_affine(a, invert_affine(a))
    np.testing.assert_allclose(
        np.asarray(ident),
        np.broadcast_to(np.eye(2, 3, dtype=np.float32), (4, 2, 3)),
        atol=1e-4,
    )
    pts = jnp.asarray(rng.normal(size=(4, 2)).astype(np.float32))
    lhs = apply_affine(compose_affine(a, a), pts)
    rhs = apply_affine(a, apply_affine(a, pts))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)
