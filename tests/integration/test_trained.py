"""End-to-end through the REAL trained flow net (VERDICT.md r1 items 6/weak-6;
SURVEY.md §7 M6): no analytic flow anywhere — the committed checkpoint's
PWC-Net estimates the motion the smoother consumes.

The checkpoint (ckpts/flow_010000.msgpack) was trained by
`python -m vstab.flow.train` on synthetic labeled pairs (global similarity ∘
low-frequency field over procedural scenes); held-out EPE 0.307 px at
192x256 (target < 1 px). TPU quality at the test config (trained net,
seed 3): stability 0.846 (affine) / 0.881 (sparse_ls) vs 0.638 input.
"""

import numpy as np
import pytest

from vstab.core.config import Config, RenderConfig, SmoothConfig
from vstab.eval.metrics import evaluate_videos
from vstab.eval.synthetic import make_shaky_clip
from vstab.pipeline import default_params, stabilize
from vstab.utils.checkpoint import latest_checkpoint

pytestmark = pytest.mark.skipif(
    latest_checkpoint("ckpts") is None,
    reason="no committed flow checkpoint in ckpts/",
)


@pytest.fixture(scope="module")
def shaky_clip():
    return make_shaky_clip(t=48, h=160, w=192, seed=3)


@pytest.mark.parametrize("method", ["affine", "sparse_ls"])
def test_trained_net_stabilizes(shaky_clip, method):
    frames, _ = shaky_clip
    cfg = Config(
        smooth=SmoothConfig(method=method),
        render=RenderConfig(crop_mode="fixed", fixed_crop_ratio=0.8),
    )
    params = default_params(cfg)  # loads the committed checkpoint
    out, _ = stabilize(frames, params, cfg)
    inp = np.asarray(frames)
    m = evaluate_videos(inp, np.asarray(out))
    m_in = evaluate_videos(inp, inp)
    assert m["stability"] > 0.8, m
    assert m["stability"] > m_in["stability"] + 0.15, (m, m_in)
    assert m["distortion"] > 0.9, m


def test_flow_epe_gate():
    """Held-out synthetic EPE of the committed checkpoint < 1 px (M6)."""
    from vstab.core.config import FlowConfig
    from vstab.flow.train import eval_epe
    from vstab.utils.checkpoint import load_params

    params = load_params(latest_checkpoint("ckpts"))
    cfg = FlowConfig(kernel_impl="xla", compute_dtype="float32")
    epe = eval_epe(params, cfg, hw=(192, 256), n=8)
    assert epe < 1.0, epe
