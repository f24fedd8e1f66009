"""Sparse-LS smoothing vs dense Kronecker reference (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from vstab.core.config import SmoothConfig
from vstab.smooth.sparse_ls import (
    smooth_profiles,
    spatial_modes,
    temporal_diagonals,
    vertex_motion,
    vertex_profiles,
)


def dense_reference(c, cfg):
    t, gh, gw, _ = c.shape
    g = gh * gw
    v, mu = spatial_modes(gh, gw)
    ls = (v * mu) @ v.T
    ident = np.eye(g)
    td0, td1, td2 = temporal_diagonals(t, cfg.lambda_smooth, cfg.lambda_accel)
    lt = sp.diags([td2, td1, td0, td1, td2], [-2, -1, 0, 1, 2]).toarray()
    data_op = cfg.lambda_data * ident + cfg.lambda_rigid * ls
    a = np.kron(np.eye(t), data_op) + np.kron(lt, ident)
    out = np.zeros((t, g, 2))
    for comp in range(2):
        cv = c.reshape(t, g, 2)[:, :, comp].reshape(t * g).astype(np.float64)
        rhs = np.kron(np.eye(t), data_op) @ cv
        out[:, :, comp] = np.linalg.solve(a, rhs).reshape(t, g)
    return out.reshape(t, gh, gw, 2)


@pytest.mark.parametrize("t", [10, 40])
def test_smooth_profiles_vs_dense(t):
    cfg = SmoothConfig(
        grid_size=(3, 4),
        lambda_data=1.0,
        lambda_smooth=10.0,
        lambda_rigid=3.0,
        lambda_accel=50.0,
        block_len=8,
        damping=0.0,
    )
    rng = np.random.default_rng(t)
    c = rng.normal(size=(t, 3, 4, 2)).astype(np.float32).cumsum(axis=0)
    got = np.asarray(smooth_profiles(jnp.asarray(c), cfg))
    want = dense_reference(c, cfg)
    scale = np.max(np.abs(want)) + 1e-6
    assert np.max(np.abs(got - want)) / scale < 1e-3


def test_constant_path_is_fixed_point():
    """A static camera (C constant) must smooth to itself."""
    cfg = SmoothConfig(grid_size=(4, 4))
    c = jnp.broadcast_to(
        jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 4, 2))),
        (30, 4, 4, 2),
    ).astype(jnp.float32)
    p = smooth_profiles(c, cfg)
    np.testing.assert_allclose(np.asarray(p), np.asarray(c), atol=1e-3)


def test_vertex_motion_constant_flow():
    flow = jnp.ones((3, 32, 40, 2)) * jnp.asarray([2.0, -1.0])
    vm = vertex_motion(flow, (4, 5))
    np.testing.assert_allclose(
        np.asarray(vm), np.broadcast_to([2.0, -1.0], (3, 4, 5, 2)), atol=1e-5
    )


def test_vertex_profiles_cumsum():
    flow = jnp.ones((4, 16, 16, 2))
    prof = vertex_profiles(flow, (2, 2))
    assert prof.shape == (5, 2, 2, 2)
    np.testing.assert_allclose(np.asarray(prof[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(prof[4]), 4.0, atol=1e-5)
