"""Subprocess worker for the blocked-pipeline fault-injection test: runs
`stabilize_video_blocked` (resume on) over a prepared input video and prints
the stats JSON on the last stdout line. Killed mid-run by the parent test;
re-run to completion to exercise block-level resume."""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

from vstab.core.config import Config, FlowConfig, RenderConfig, SmoothConfig  # noqa: E402
from vstab.pipeline import default_params  # noqa: E402
from vstab.pipeline_blocked import stabilize_video_blocked  # noqa: E402


def main():
    in_path, out_path = sys.argv[1], sys.argv[2]
    block_len = int(sys.argv[3])
    cfg = Config(
        flow=FlowConfig(
            pyramid_channels=(8, 12, 16),
            estimator_channels=(16, 12),
            kernel_impl="xla",
            compute_dtype="float32",
            output_level=1,
        ),
        smooth=SmoothConfig(method="sparse_ls", grid_size=(4, 4)),
        render=RenderConfig(crop_mode="fixed", kernel_impl="xla"),
    )
    params = default_params(cfg, seed=0, ckpt_dir="/nonexistent")
    stats = stabilize_video_blocked(
        in_path, out_path, params, cfg, block_len=block_len, resume=True
    )
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
