"""Time-sharded pipeline vs single-device pipeline (SURVEY.md §4, M3/M5:
block-boundary continuity — no seams across shard boundaries)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vstab.core.config import Config, FlowConfig, SmoothConfig
from vstab.dist.pipeline_dist import stabilize_sharded
from vstab.eval.synthetic import make_shaky_clip
from vstab.pipeline import default_params, stabilize


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(jax.devices()[:8]).reshape(1, 8), ("data", "time"))


@pytest.fixture(scope="module")
def cfg():
    return Config(
        flow=FlowConfig(
            pyramid_channels=(8, 16, 24),
            estimator_channels=(16, 16),
            context_dilations=(1, 2, 1),
            search_radius=2,
            kernel_impl="xla",
            compute_dtype="float32",
            output_level=2,
        ),
        smooth=SmoothConfig(method="sparse_ls", grid_size=(4, 4), block_len=8),
    )


def test_sharded_matches_single_device(mesh, cfg):
    t, h, w = 64, 48, 64
    clip, _ = make_shaky_clip(t=t, h=h, w=w, seed=0)
    params = default_params(cfg)

    # Single-device reference on the SAME padded length (t already a
    # multiple of 8 shards * block_len 8 = 64).
    ref, _ = stabilize(clip, params, cfg)
    out = stabilize_sharded(clip, params, cfg, mesh=mesh)

    assert out.shape == (t, h, w, 3)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=5e-3, atol=5e-3
    )


def test_sharded_pads_odd_length(mesh, cfg):
    t, h, w = 50, 48, 64  # not a multiple of 8*8
    clip, _ = make_shaky_clip(t=t, h=h, w=w, seed=1)
    params = default_params(cfg)
    out = stabilize_sharded(clip, params, cfg, mesh=mesh)
    assert out.shape == (t, h, w, 3)
    assert np.isfinite(np.asarray(out)).all()
