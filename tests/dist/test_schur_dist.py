"""Distributed Schur solve == single-device solve (SURVEY.md §4:
"the distributed Schur solve is bitwise-comparable to the single-device
solve on the same input")."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from vstab.dist.mesh import TIME_AXIS
from vstab.dist.schur_dist import schur_solve_shard
from vstab.smooth.banded import banded_solve_scan
from vstab.smooth.schur import schur_solve


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(jax.devices()[:8]).reshape(1, 8), ("data", "time"))


def _random_spd_penta(t, m, seed=0):
    """Random SPD pentadiagonal bands in the length-T convention."""
    rng = np.random.default_rng(seed)
    d1 = rng.normal(size=(t, m)).astype(np.float32)
    d2 = rng.normal(size=(t, m)).astype(np.float32)
    d1[-1] = 0.0
    d2[-2:] = 0.0
    # diagonal dominance => SPD
    d0 = (
        4.0
        + np.abs(d1)
        + np.abs(np.roll(d1, 1, 0))
        + np.abs(d2)
        + np.abs(np.roll(d2, 2, 0))
    ).astype(np.float32)
    b = rng.normal(size=(t, m)).astype(np.float32)
    return d0, d1, d2, b


@pytest.mark.parametrize("t,m,bl", [(128, 6, 8), (256, 4, 16), (64, 2, 8)])
def test_dist_matches_single_device(mesh, t, m, bl):
    d0, d1, d2, b = _random_spd_penta(t, m)
    ref = schur_solve(
        jnp.asarray(d0), jnp.asarray(d1[:-1]), jnp.asarray(d2[:-2]),
        jnp.asarray(b), block_len=bl,
    )

    fn = jax.shard_map(
        functools.partial(
            schur_solve_shard, block_len=bl, axis_name=TIME_AXIS
        ),
        mesh=mesh,
        in_specs=(P(TIME_AXIS),) * 4,
        out_specs=P(TIME_AXIS),
        check_vma=False,
    )
    out = jax.jit(fn)(
        jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(b)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_dist_matches_banded_oracle(mesh):
    t, m, bl = 128, 4, 8
    d0, d1, d2, b = _random_spd_penta(t, m, seed=3)
    oracle = banded_solve_scan(
        jnp.asarray(d0), jnp.asarray(d1[:-1]), jnp.asarray(d2[:-2]), jnp.asarray(b)
    )
    fn = jax.shard_map(
        functools.partial(schur_solve_shard, block_len=bl, axis_name=TIME_AXIS),
        mesh=mesh,
        in_specs=(P(TIME_AXIS),) * 4,
        out_specs=P(TIME_AXIS),
        check_vma=False,
    )
    out = jax.jit(fn)(*(jnp.asarray(x) for x in (d0, d1, d2, b)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle), rtol=1e-4, atol=1e-4)
