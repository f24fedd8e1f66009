"""Halo exchange + distributed prefix sum on the 8-device CPU mesh
(SURVEY.md §4 "Distributed w/o cluster")."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vstab.dist.halo import (
    exclusive_prefix_sum,
    extend_right,
    shift_from_next,
    shift_from_prev,
)
from vstab.dist.mesh import TIME_AXIS
from jax.sharding import Mesh, PartitionSpec as P


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(jax.devices()[:8]).reshape(1, 8), ("data", "time"))


def _smap(mesh, fn, x):
    f = jax.shard_map(
        fn, mesh=mesh, in_specs=P(TIME_AXIS), out_specs=P(TIME_AXIS),
        check_vma=False,
    )
    return jax.jit(f)(x)


def test_shift_from_next(mesh):
    x = jnp.arange(32.0).reshape(32, 1)  # 4 per shard
    out = _smap(mesh, lambda s: shift_from_next(s, 2, TIME_AXIS), x)
    out = np.asarray(out).ravel()
    # shard i (rows 4i..4i+3) receives next shard's first 2 rows
    for i in range(7):
        assert out[2 * i] == 4 * (i + 1)
        assert out[2 * i + 1] == 4 * (i + 1) + 1
    assert out[14] == 0 and out[15] == 0  # last shard: zeros


def test_shift_from_prev(mesh):
    x = jnp.arange(32.0).reshape(32, 1)
    out = _smap(mesh, lambda s: shift_from_prev(s, 1, TIME_AXIS), x)
    out = np.asarray(out).ravel()
    assert out[0] == 0  # first shard: zeros
    for i in range(1, 8):
        assert out[i] == 4 * i - 1


def test_extend_right_edge_replicates(mesh):
    x = jnp.arange(32.0).reshape(32, 1)
    out = _smap(mesh, lambda s: extend_right(s, 1, TIME_AXIS), x)
    out = np.asarray(out).reshape(8, 5)
    for i in range(7):
        assert out[i, 4] == 4 * (i + 1)  # next shard's first element
    assert out[7, 4] == 31  # last shard: edge-replicated


def test_exclusive_prefix_sum_matches_cumsum(mesh):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))

    def body(s):
        local = jnp.cumsum(s, axis=0)
        off = exclusive_prefix_sum(local[-1], TIME_AXIS)
        return local + off[None]

    out = _smap(mesh, body, x)
    np.testing.assert_allclose(
        np.asarray(out), np.cumsum(np.asarray(x), axis=0), rtol=1e-5, atol=1e-5
    )
