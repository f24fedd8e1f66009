"""Test configuration (SURVEY.md §4).

Default platform is CPU with 8 virtual devices so the distributed tests
(mesh sharding, halo exchange, distributed Schur) run without a TPU pod.
The axon sitecustomize force-registers the TPU backend via
jax.config.update("jax_platforms", "axon,cpu"), so we must override through
jax.config, not the environment.

Set VSTAB_TEST_PLATFORM=tpu to run the TPU-only tests (Pallas kernels) on
real hardware instead; CPU-forced tests are then skipped in reverse.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

_PLATFORM = os.environ.get("VSTAB_TEST_PLATFORM", "cpu")
if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: TPU test rounds are compile-dominated.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires a real TPU backend")


def pytest_collection_modifyitems(config, items):
    on_tpu = jax.default_backend() == "tpu"
    skip_tpu = pytest.mark.skip(reason="requires TPU backend (VSTAB_TEST_PLATFORM=tpu)")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)
