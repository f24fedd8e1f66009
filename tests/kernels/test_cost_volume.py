"""Cost-volume kernel tests (SURVEY.md §4 "Unit: kernels")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vstab.kernels import cost_volume_pallas, cost_volume_xla


def numpy_cost_volume(f1, f2, radius):
    """Independent numpy oracle."""
    n, h, w, c = f1.shape
    r = radius
    out = np.zeros((n, h, w, (2 * r + 1) ** 2), np.float32)
    f2p = np.pad(f2, ((0, 0), (r, r), (r, r), (0, 0)))
    k = 0
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = f2p[:, r + dy : r + dy + h, r + dx : r + dx + w]
            out[..., k] = (f1 * shifted).mean(axis=-1)
            k += 1
    return out


@pytest.mark.parametrize("shape,r", [((2, 16, 20, 8), 2), ((1, 9, 13, 5), 3)])
def test_xla_vs_numpy(shape, r):
    rng = np.random.default_rng(0)
    f1 = rng.normal(size=shape).astype(np.float32)
    f2 = rng.normal(size=shape).astype(np.float32)
    got = np.asarray(cost_volume_xla(jnp.asarray(f1), jnp.asarray(f2), r))
    want = numpy_cost_volume(f1, f2, r)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_identity_correlation_peak():
    """corr(f, f) must peak at zero displacement for smooth features."""
    rng = np.random.default_rng(1)
    base = rng.normal(size=(1, 12, 12, 16)).astype(np.float32)
    # smooth the features so neighboring correlation is lower than self
    cv = np.asarray(cost_volume_xla(jnp.asarray(base), jnp.asarray(base), 2))
    center = (2 * 2 + 1) ** 2 // 2
    interior = cv[:, 3:-3, 3:-3]
    assert (interior.argmax(axis=-1) == center).mean() > 0.95


@pytest.mark.tpu
@pytest.mark.parametrize("shape,r", [((2, 32, 48, 16), 4), ((1, 30, 40, 24), 3)])
def test_pallas_vs_xla(shape, r):
    rng = np.random.default_rng(2)
    f1 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    got = np.asarray(cost_volume_pallas(f1, f2, r))
    want = np.asarray(cost_volume_xla(f1, f2, r))
    np.testing.assert_allclose(got, want, atol=1e-4)
