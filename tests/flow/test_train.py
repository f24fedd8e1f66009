"""Training-loop tests (SURVEY.md §4 "Unit: flow net" — tiny overfit)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vstab.core.config import FlowConfig
from vstab.flow.pwcnet import init_params
from vstab.flow.train import (
    make_optimizer,
    make_train_step,
    multiscale_epe,
    photometric_loss,
    synthetic_batch,
)

TINY = FlowConfig(
    pyramid_channels=(8, 16, 24),
    estimator_channels=(16, 16),
    context_dilations=(1, 2, 1),
    search_radius=2,
    kernel_impl="xla",
    compute_dtype="float32",
    output_level=2,
)


def test_synthetic_batch_shapes():
    b = synthetic_batch(jax.random.PRNGKey(0), 2, 64, 64)
    assert b["im1"].shape == (2, 64, 64, 3)
    assert b["im2"].shape == (2, 64, 64, 3)
    assert b["flow"].shape == (2, 64, 64, 2)
    assert np.isfinite(np.asarray(b["flow"])).all()


def test_multiscale_epe_zero_for_perfect():
    gt = jnp.zeros((1, 32, 32, 2))
    pyr = (jnp.zeros((1, 4, 4, 2)), jnp.zeros((1, 8, 8, 2)))
    loss, aux = multiscale_epe(pyr, gt)
    assert float(loss) < 1e-3
    assert float(aux["epe_finest"]) < 1e-3


def test_supervised_overfit_reduces_loss():
    """10 steps on one fixed batch must reduce the loss (SURVEY.md §4)."""
    params = init_params(jax.random.PRNGKey(0), TINY)
    tx = make_optimizer(lr=3e-4)
    opt_state = tx.init(params)
    step = make_train_step(TINY, tx, mode="supervised")
    batch = synthetic_batch(jax.random.PRNGKey(1), 2, 64, 64, max_disp=3.0)
    first = None
    for i in range(10):
        params, opt_state, m = step(params, opt_state, batch)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first
    assert np.isfinite(float(m["grad_norm"]))


def test_photometric_mode_runs_and_descends():
    params = init_params(jax.random.PRNGKey(0), TINY)
    tx = make_optimizer(lr=3e-4)
    opt_state = tx.init(params)
    step = make_train_step(TINY, tx, mode="photometric")
    b = synthetic_batch(jax.random.PRNGKey(2), 2, 64, 64, max_disp=2.0)
    batch = {"im1": b["im1"], "im2": b["im2"]}
    first = None
    for _ in range(6):
        params, opt_state, m = step(params, opt_state, batch)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) <= first * 1.05  # descending or near-flat
