"""Solver tests: banded scan & Schur vs scipy (SURVEY.md §4 "Unit: solver")."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spl

from vstab.smooth.banded import banded_matvec, banded_solve_scan
from vstab.smooth.schur import schur_solve


def random_spd_banded(t, m, seed):
    rng = np.random.default_rng(seed)
    d1 = (rng.normal(size=(t - 1, m)) * 0.4).astype(np.float32)
    d2 = (rng.normal(size=(t - 2, m)) * 0.3).astype(np.float32)
    d0 = (3.0 + rng.random((t, m))).astype(np.float32)
    b = rng.normal(size=(t, m)).astype(np.float32)
    return d0, d1, d2, b


def scipy_solve(d0, d1, d2, b):
    t, m = d0.shape
    xs = np.zeros_like(b)
    for j in range(m):
        a = sp.diags(
            [d2[:, j], d1[:, j], d0[:, j], d1[:, j], d2[:, j]],
            [-2, -1, 0, 1, 2],
            format="csc",
        )
        xs[:, j] = spl.spsolve(a, b[:, j])
    return xs


@pytest.mark.parametrize("t", [5, 16, 63, 200])
def test_scan_vs_scipy(t):
    d0, d1, d2, b = random_spd_banded(t, 4, seed=t)
    got = np.asarray(banded_solve_scan(*map(jnp.asarray, (d0, d1, d2, b))))
    want = scipy_solve(d0, d1, d2, b)
    np.testing.assert_allclose(got, want, atol=2e-3)


@pytest.mark.parametrize("t,bl", [(40, 8), (97, 16), (256, 32), (1000, 32)])
def test_schur_vs_scan(t, bl):
    d0, d1, d2, b = random_spd_banded(t, 6, seed=bl)
    args = tuple(map(jnp.asarray, (d0, d1, d2, b)))
    want = np.asarray(banded_solve_scan(*args))
    got = np.asarray(schur_solve(*args, block_len=bl))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_schur_residual():
    d0, d1, d2, b = random_spd_banded(500, 8, seed=9)
    args = tuple(map(jnp.asarray, (d0, d1, d2, b)))
    x = schur_solve(*args, block_len=25)
    r = np.asarray(banded_matvec(*args[:3], x) - args[3])
    assert np.max(np.abs(r)) < 2e-3
