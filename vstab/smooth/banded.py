"""Batched symmetric pentadiagonal solvers — the building block of the
sparse-LS smoothing solve (SURVEY.md §2.1, §3.3).

Systems are SPD, size T (time), half-bandwidth 2, batched over M independent
coefficient sets (spatial eigenmodes x components; see
vstab.smooth.sparse_ls). Batch is the LAST axis so every scan step is an
M-wide VPU vector op.

`banded_solve_scan` is the sequential banded-LDL reference implementation
and correctness oracle; `vstab.smooth.schur` is the parallel / distributable
Schur-complement block solver mandated by BASELINE.json:5.

Band layout for A (per batch column):
  d0[i] = A[i, i]      (i in [0, T))
  d1[i] = A[i+1, i]    (i in [0, T-1))
  d2[i] = A[i+2, i]    (i in [0, T-2))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.jit
def banded_matvec(d0: Array, d1: Array, d2: Array, x: Array) -> Array:
    """y = A x for symmetric pentadiagonal A; all [T(-k), M]."""
    y = d0 * x
    y = y.at[1:].add(d1 * x[:-1])
    y = y.at[:-1].add(d1 * x[1:])
    y = y.at[2:].add(d2 * x[:-2])
    y = y.at[:-2].add(d2 * x[2:])
    return y


@jax.jit
def banded_solve_scan(d0: Array, d1: Array, d2: Array, b: Array) -> Array:
    """Solve A x = b, A SPD pentadiagonal. Sequential LDL via lax.scan.

    Forward elimination recurrences (row i, with alpha = factored diagonal,
    u1 = factored superdiag entry U[i, i+1]):
      l2_i = c_{i-2} / alpha_{i-2}
      l1_i = (b_{i-1} - l2_i * u1_{i-2}) / alpha_{i-1}
      alpha_i = a_i - l2_i * c_{i-2} - l1_i * u1_{i-1}
      u1_i = b_i - l1_i * c_{i-1}
      y_i  = rhs_i - l2_i * y_{i-2} - l1_i * y_{i-1}
    Back substitution: x_i = (y_i - u1_i x_{i+1} - c_i x_{i+2}) / alpha_i.
    """
    t, m = d0.shape
    zero = jnp.zeros((1, m), d0.dtype)
    one = jnp.ones((1, m), d0.dtype)
    # Per-step inputs, aligned at row i:
    b_prev = jnp.concatenate([zero, d1], axis=0)  # b_{i-1}
    c_prev2 = jnp.concatenate([zero, zero, d2], axis=0)  # c_{i-2}
    c_prev1 = jnp.concatenate([zero, d2, zero], axis=0)  # c_{i-1}
    b_cur = jnp.concatenate([d1, zero], axis=0)  # b_i (unused at i=T-1)

    def fwd(carry, inp):
        a1, a2, u1p1, u1p2, y1, y2 = carry  # values at rows i-1, i-2
        a_i, bp, cp2, cp1, bc, rhs = inp
        l2 = cp2 / a2
        l1 = (bp - l2 * u1p2) / a1
        alpha = a_i - l2 * cp2 - l1 * u1p1
        u1 = bc - l1 * cp1
        y = rhs - l2 * y2 - l1 * y1
        new_carry = (alpha, a1, u1, u1p1, y, y1)
        return new_carry, (alpha, u1, y)

    init = (one[0], one[0], zero[0], zero[0], zero[0], zero[0])
    _, (alpha, u1, y) = jax.lax.scan(
        fwd, init, (d0, b_prev, c_prev2, c_prev1, b_cur, b)
    )

    # Backward: x_i = (y_i - u1_i x_{i+1} - c_i x_{i+2}) / alpha_i
    c_full = jnp.concatenate([d2, zero, zero], axis=0)  # c_i (0 beyond T-2)

    def bwd(carry, inp):
        x1, x2 = carry  # x_{i+1}, x_{i+2}
        alpha_i, u1_i, c_i, y_i = inp
        x = (y_i - u1_i * x1 - c_i * x2) / alpha_i
        return (x, x1), x

    _, xs = jax.lax.scan(
        bwd, (zero[0], zero[0]), (alpha, u1, c_full, y), reverse=True
    )
    return xs


__all__ = ["banded_matvec", "banded_solve_scan"]
