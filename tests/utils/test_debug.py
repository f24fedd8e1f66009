"""checkify debug mode (SURVEY.md §5 sanitizers; VERDICT.md r1 item 7).

The full-pipeline checkify tests are gated behind VSTAB_SLOW_TESTS=1:
checkify instruments every float op, so even a 4x48x64 clip takes ~15 min
of CPU compile. The fast tests cover the smooth+render half (no PWC net),
which compiles in seconds and still exercises nan/oob propagation through
the solver and warp kernels.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

from vstab.core.config import Config, preset
from vstab.eval.synthetic import make_shaky_clip
from vstab.pipeline import _smooth_and_render, default_params
from vstab.utils.debug import CHECKS, stabilize_checked

slow = pytest.mark.skipif(
    not os.environ.get("VSTAB_SLOW_TESTS"),
    reason="slow checkify compile; set VSTAB_SLOW_TESTS=1",
)


@pytest.fixture(scope="module")
def clip():
    cfg = preset("affine_480p")
    frames, _ = make_shaky_clip(t=6, h=48, w=64, seed=3)
    # consecutive-pair flow: [T-1, H, W, 2]
    flow = 0.5 * jnp.ones((frames.shape[0] - 1,) + frames.shape[1:3] + (2,))
    return frames, flow, cfg


def _checked_smooth_render(frames, flow, cfg):
    fn = jax.jit(
        checkify.checkify(
            lambda fr, fl: _smooth_and_render(fr, fl, cfg)[0], errors=CHECKS
        )
    )
    err, out = fn(frames, flow)
    checkify.check_error(err)
    return out


def test_smooth_render_clean(clip):
    frames, flow, cfg = clip
    out = _checked_smooth_render(frames, flow, cfg)
    assert np.isfinite(np.asarray(out)).all()


def test_smooth_render_nan_flow_raises(clip):
    frames, flow, cfg = clip
    bad = flow.at[2].set(jnp.nan)  # poison a whole pair's flow field
    with pytest.raises(Exception) as ei:
        _checked_smooth_render(frames, bad, cfg)
    assert "nan" in str(ei.value).lower() or "division" in str(ei.value).lower()


@slow
def test_full_pipeline_clean(clip):
    frames, _, cfg = clip
    params = default_params(cfg, ckpt_dir="/nonexistent")
    out, _ = stabilize_checked(frames[:4], params, cfg)
    assert np.isfinite(np.asarray(out)).all()


@slow
def test_full_pipeline_nan_input_raises(clip):
    frames, _, cfg = clip
    params = default_params(cfg, ckpt_dir="/nonexistent")
    bad = frames[:4].at[2, 10, 10, 0].set(jnp.nan)
    with pytest.raises(Exception) as ei:
        stabilize_checked(bad, params, cfg)
    assert "nan" in str(ei.value).lower() or "division" in str(ei.value).lower()
