"""Flow-network tests (SURVEY.md §4 "Unit: flow net")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vstab.core.config import FlowConfig
from vstab.flow.pwcnet import PWCNet, estimate_flow, init_params

TINY = FlowConfig(
    pyramid_channels=(8, 12, 16),
    search_radius=2,
    estimator_channels=(16, 12),
    context_dilations=(1, 2, 1),
    output_level=1,
    kernel_impl="xla",
    compute_dtype="float32",
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_params(jax.random.PRNGKey(0), TINY, 32, 32)


def test_output_shapes(tiny_params):
    im = jnp.zeros((2, 40, 48, 3))
    flow = estimate_flow(tiny_params, im, im, TINY)
    assert flow.shape == (2, 40, 48, 2)
    assert flow.dtype == jnp.float32


def test_finite_and_small_for_identical_frames(tiny_params):
    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    flow = estimate_flow(tiny_params, im, im, TINY)
    assert np.isfinite(np.asarray(flow)).all()


def test_gradients_flow(tiny_params):
    rng = np.random.default_rng(1)
    im1 = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))

    def loss(p):
        return jnp.mean(estimate_flow(p, im1, im2, TINY) ** 2)

    g = jax.grad(loss)(tiny_params)
    norms = [float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert max(norms) > 0


def test_tiny_overfit_reduces_epe(tiny_params):
    """10 gradient steps on one known-shift pair must reduce EPE
    (SURVEY.md §4: 'tiny-image overfit')."""
    import optax

    rng = np.random.default_rng(2)
    base = rng.random((40, 40)).astype(np.float32)
    im1 = jnp.asarray(base[4:36, 4:36])[None, :, :, None].repeat(3, -1)
    im2 = jnp.asarray(base[4:36, 2:34])[None, :, :, None].repeat(3, -1)
    # im1 pixel x shows base[x+4]; im2 shows base[x+2] -> matches at x+2:
    # true flow = (+2, 0).
    target = jnp.full((1, 32, 32, 2), 0.0).at[..., 0].set(2.0)

    opt = optax.adam(1e-3)
    params = tiny_params
    state = opt.init(params)

    def epe(p):
        f = estimate_flow(p, im1, im2, TINY)
        return jnp.mean(jnp.linalg.norm(f - target, axis=-1))

    e0 = float(epe(params))
    step = jax.jit(
        lambda p, s: (lambda g: opt.update(g, s, p))(jax.grad(epe)(p))
    )
    for _ in range(10):
        updates, state = step(params, state)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
    e1 = float(epe(params))
    assert e1 < e0
