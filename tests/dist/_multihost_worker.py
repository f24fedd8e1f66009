"""Worker process for the multi-host smoke test (SURVEY.md §4 row 7).

Run as: python _multihost_worker.py <process_id> <num_processes> <port> <outdir>

Each process fakes one "host" with 4 CPU devices; jax.distributed spans
them into one 8-device global mesh on the flat ("time",) axis — the same
bring-up path a real 2-host TPU pod slice uses (vstab/dist/init.py).
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


def main() -> int:
    pid, nproc, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )

    from vstab.core.config import Config, DistConfig, FlowConfig, RenderConfig
    from vstab.dist.init import initialize, shutdown
    from vstab.dist.mesh import DATA_AXIS, TIME_AXIS
    from vstab.dist.pipeline_dist import stabilize_sharded
    from vstab.eval.synthetic import make_shaky_clip
    from vstab.flow.pwcnet import init_params

    dist_cfg = DistConfig(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    initialize(dist_cfg, retries=3, backoff_s=1.0)
    assert jax.process_count() == nproc, jax.process_count()
    devs = jax.devices()
    assert len(devs) == 4 * nproc, devs

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
    # Deterministic on every process: same seed -> same clip & params.
    frames, _ = make_shaky_clip(t=16, h=32, w=48, seed=7)
    params = init_params(jax.random.PRNGKey(0), cfg.flow)

    mesh = Mesh(
        np.asarray(devs).reshape(1, len(devs)), (DATA_AXIS, TIME_AXIS)
    )
    out = stabilize_sharded(frames, params, cfg, mesh=mesh)

    from jax.experimental import multihost_utils

    full = np.asarray(multihost_utils.process_allgather(out, tiled=True))
    if pid == 0:
        np.save(os.path.join(outdir, "multihost_out.npy"), full)
    shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
