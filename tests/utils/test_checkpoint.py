"""Checkpoint load/save + architecture-compatibility gating
(SURVEY.md §5 "Checkpoint / resume").

The committed trained checkpoint (full-size net) must never be silently
applied under a different FlowConfig — flax raises ScopeParamShapeError at
apply time deep inside jit. `default_params` shape-checks abstractly
(jax.eval_shape; no device compute) and falls back to fresh init.
"""

import jax
import pytest

from vstab.core.config import Config, FlowConfig
from vstab.flow.pwcnet import init_params
from vstab.pipeline import _params_match, default_params
from vstab.utils.checkpoint import latest_checkpoint, load_params, save_params

TINY = FlowConfig(
    pyramid_channels=(8, 16),
    estimator_channels=(16, 12),
    context_dilations=(1, 2, 1),
    search_radius=2,
    kernel_impl="xla",
    compute_dtype="float32",
    output_level=1,
)


def test_save_load_roundtrip(tmp_path):
    params = init_params(jax.random.PRNGKey(0), TINY)
    path = str(tmp_path / "flow_000001.msgpack")
    save_params(path, params)
    assert latest_checkpoint(str(tmp_path)) == path
    loaded = load_params(path)
    assert jax.tree_util.tree_structure(loaded) == jax.tree_util.tree_structure(
        params
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(loaded), jax.tree_util.tree_leaves(params)
    ):
        assert a.shape == b.shape


def test_params_match_accepts_own_arch():
    params = init_params(jax.random.PRNGKey(0), TINY)
    assert _params_match(params, TINY)


def test_params_match_rejects_other_arch():
    params = init_params(jax.random.PRNGKey(0), TINY)
    other = FlowConfig(
        pyramid_channels=(4, 8),
        estimator_channels=(16, 12),
        context_dilations=(1, 2, 1),
        search_radius=2,
        kernel_impl="xla",
        compute_dtype="float32",
        output_level=1,
    )
    assert not _params_match(params, other)


def test_default_params_falls_back_on_mismatch(tmp_path):
    # A checkpoint from TINY must not be returned for a different config.
    params = init_params(jax.random.PRNGKey(0), TINY)
    save_params(str(tmp_path / "flow_000001.msgpack"), params)
    other_cfg = Config(
        flow=FlowConfig(
            pyramid_channels=(4, 8),
            estimator_channels=(16, 12),
            context_dilations=(1, 2, 1),
            search_radius=2,
            kernel_impl="xla",
            compute_dtype="float32",
            output_level=1,
        )
    )
    fresh = default_params(other_cfg, ckpt_dir=str(tmp_path))
    k = jax.tree_util.tree_leaves(fresh)[0]
    # Fresh init under other_cfg, not the saved TINY params.
    assert _params_match(fresh, other_cfg.flow)


def test_default_params_loads_matching(tmp_path):
    params = init_params(jax.random.PRNGKey(0), TINY)
    save_params(str(tmp_path / "flow_000001.msgpack"), params)
    import numpy as np

    got = default_params(Config(flow=TINY), ckpt_dir=str(tmp_path))
    a = jax.tree_util.tree_leaves(got)[0]
    b = jax.tree_util.tree_leaves(params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_checkpoint_empty(tmp_path):
    assert latest_checkpoint(str(tmp_path)) is None
    assert latest_checkpoint(str(tmp_path / "nope")) is None
