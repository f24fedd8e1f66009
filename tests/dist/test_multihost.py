"""Multi-host smoke test (SURVEY.md §4 row 7; VERDICT.md r1 item 5).

2 localhost processes x 4 fake CPU devices each, joined by
jax.distributed.initialize into one 8-device global mesh; the sharded
pipeline runs across the process boundary and must match the single-process
result. This is the CI-able stand-in for a 2-host TPU pod slice — the same
vstab.dist.init bring-up path runs on real hosts.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_pipeline_matches_single(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    multi = np.load(tmp_path / "multihost_out.npy")

    # Single-process reference on this process's own 8-device CPU mesh.
    import jax
    from jax.sharding import Mesh

    from vstab.core.config import Config, DistConfig, FlowConfig, RenderConfig
    from vstab.dist.mesh import DATA_AXIS, TIME_AXIS
    from vstab.dist.pipeline_dist import stabilize_sharded
    from vstab.eval.synthetic import make_shaky_clip
    from vstab.flow.pwcnet import init_params

    cfg = Config(
        flow=FlowConfig(
            pyramid_channels=(8, 12, 16),
            estimator_channels=(16, 12),
            kernel_impl="xla",
            compute_dtype="float32",
            output_level=1,
        ),
        render=RenderConfig(crop_mode="fixed", kernel_impl="xla"),
    )
    frames, _ = make_shaky_clip(t=16, h=32, w=48, seed=7)
    params = init_params(jax.random.PRNGKey(0), cfg.flow)
    mesh = Mesh(
        np.asarray(jax.devices()[:8]).reshape(1, 8), (DATA_AXIS, TIME_AXIS)
    )
    ref = np.asarray(stabilize_sharded(frames, params, cfg, mesh=mesh))

    assert multi.shape == ref.shape
    np.testing.assert_allclose(multi, ref, atol=5e-3)
