"""Subprocess worker for the fault-injection test (tests/eval/test_resume.py).

Runs a synthetic eval sweep on CPU, writing one JSONL record per clip to the
manifest; the parent kills this process mid-sweep and asserts clean resume.
"""

import sys


def main() -> int:
    results_path, n_clips = sys.argv[1], int(sys.argv[2])

    import jax

    jax.config.update("jax_platforms", "cpu")

    from vstab.core.config import Config, FlowConfig, SmoothConfig
    from vstab.eval.deepstab import run_sweep

    cfg = Config(
        flow=FlowConfig(
            pyramid_channels=(8, 16),
            estimator_channels=(16, 12),
            context_dilations=(1, 2, 1),
            search_radius=2,
            kernel_impl="xla",
            compute_dtype="float32",
            output_level=1,
        ),
        smooth=SmoothConfig(method="affine"),
    )
    # default_params falls back to fresh init: the committed trained
    # checkpoint does not match this tiny FlowConfig (vstab.pipeline).
    run_sweep(
        None,
        results_path,
        cfg=cfg,
        n_synthetic=n_clips,
        synth_shape=(8, 32, 48),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
