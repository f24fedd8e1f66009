"""Distributed Schur-complement solve over the "time" mesh axis
(SURVEY.md §2.2 "Distributed solver", §3.3; BASELINE.json:5,11).

The smoothing normal equations are SPD pentadiagonal in time (bandwidth
Q=2). Domain decomposition (vstab.smooth.schur) makes the cross-shard
structure explicit:

  - per-block interior elimination is shard-LOCAL (batched Cholesky, MXU);
  - blocks couple only through Q-row separators; the couplings that cross
    a shard boundary are exactly 3 band entries -> one ppermute forward;
  - each shard's first block contributes Schur terms to the PREVIOUS
    shard's last separator -> one ppermute backward;
  - the reduced separator system (K_total blocks of QxQ — tiny) is
    all_gather'ed over ICI, solved replicated by the batched block-Thomas
    scan, and back-substituted shard-locally.

Bitwise comparability with the single-device schur_solve on the same
inputs is the correctness contract (SURVEY.md §4 "Distributed w/o
cluster") — the distributed path performs the SAME local eliminations in
the SAME order; only the separator solve sees gathered data, and gathering
is ordering-preserving (no psum reduction races).

Runs INSIDE shard_map. Band layout: all four operands are length-T_loc
slices of GLOBAL length-T arrays, with the superdiagonals stored aligned
to their row (d1[t] = A[t+1, t], d2[t] = A[t+2, t]; last 1/2 entries of
the global arrays are zero).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vstab.smooth.schur import (
    Q,
    block_tridiag_solve,
    blockify,
    interior_eliminate,
    reduce_separator_system,
    _einsum,
)

Array = jax.Array


def _ppermute_fwd(x: Array, axis_name: str) -> Array:
    """i -> i+1 ring shift; shard 0 receives zeros."""
    n = jax.lax.axis_size(axis_name)
    return jax.lax.ppermute(x, axis_name, perm=[(i, i + 1) for i in range(n - 1)])


def _ppermute_bwd(x: Array, axis_name: str) -> Array:
    """i -> i-1 ring shift; last shard receives zeros."""
    n = jax.lax.axis_size(axis_name)
    return jax.lax.ppermute(x, axis_name, perm=[(i, i - 1) for i in range(1, n)])


def schur_solve_shard(
    d0: Array,
    d1: Array,
    d2: Array,
    b: Array,
    block_len: int,
    axis_name: str,
) -> Array:
    """Local shard of the distributed SPD pentadiagonal solve.

    All operands [T_loc, M] (length-T band convention above);
    T_loc must be a multiple of block_len. Returns x_local [T_loc, M].
    """
    t_loc, m = d0.shape
    if t_loc % block_len:
        raise ValueError(f"T_loc={t_loc} not a multiple of block_len={block_len}")
    k_loc = t_loc // block_len

    # --- cross-boundary band entries: previous shard's trailing couplings.
    tail = jnp.stack([d1[-1], d2[-2], d2[-1]], axis=0)  # [3, M]
    prev_tail = _ppermute_fwd(tail, axis_name)
    prev_d1_last, prev_d2_last2, prev_d2_last = prev_tail

    # --- local block assembly. blockify takes d1 [T-1], d2 [T-2] and
    # zero-pads the trailing entries — exactly the cross-boundary couplings
    # that must NOT appear in this shard's local blocks (they were shipped
    # to the next shard above).
    a_ii, e_l, e_r, d_sep, b_i, b_s = blockify(
        d0, d1[:-1], d2[:-2], b, block_len
    )
    # First block's left coupling comes from the previous shard (zero on
    # shard 0 — ppermute edge gives zeros, matching the global system).
    e_l = e_l.at[0, :, 0, 1].set(prev_d1_last)
    e_l = e_l.at[0, :, 0, 0].set(prev_d2_last2)
    e_l = e_l.at[0, :, 1, 1].set(prev_d2_last)

    # --- shard-local interior elimination (batched Cholesky -> MXU).
    with jax.default_matmul_precision("highest"):
        chol, w_l, w_r, w_b, contrib = interior_eliminate(a_ii, e_l, e_r, b_i)
    diag, off, g_l, g_r = reduce_separator_system(d_sep, contrib)
    s_ll, _, s_lr, _, _ = contrib

    # --- cross-shard separator contributions: my first block eliminates
    # into the PREVIOUS shard's last separator.
    firsts = jnp.stack(
        [s_ll[0], s_lr[0]], axis=0
    )  # [2, M, Q, Q]
    recv_mats = _ppermute_bwd(firsts, axis_name)
    next_s_ll, next_s_lr = recv_mats
    next_g_l = _ppermute_bwd(g_l[0], axis_name)  # [M, Q]

    diag = diag.at[-1].add(-next_s_ll)
    rhs_s = b_s - g_r
    if k_loc > 1:
        rhs_s = rhs_s.at[: k_loc - 1].add(-g_l[1:])
    rhs_s = rhs_s.at[-1].add(-next_g_l)
    cross_off = -next_s_lr  # S[my last sep, next shard's first sep]
    off_ext = jnp.concatenate([off, cross_off[None]], axis=0)  # [K_loc,...]

    # --- gather the (tiny) reduced system; solve replicated. all_gather is
    # ordering-preserving: identical f32 ops on every shard.
    diag_all = jax.lax.all_gather(diag, axis_name, axis=0).reshape(
        -1, m, Q, Q
    )
    off_all = jax.lax.all_gather(off_ext, axis_name, axis=0).reshape(
        -1, m, Q, Q
    )
    rhs_all = jax.lax.all_gather(rhs_s, axis_name, axis=0).reshape(-1, m, Q)
    k_tot = diag_all.shape[0]
    x_all = block_tridiag_solve(diag_all, off_all[: k_tot - 1], rhs_all)

    # --- local back-substitution.
    idx = jax.lax.axis_index(axis_name)
    x_s = jax.lax.dynamic_slice_in_dim(x_all, idx * k_loc, k_loc, axis=0)
    prev_idx = jnp.maximum(idx * k_loc - 1, 0)
    x_prev_last = jnp.where(
        idx > 0,
        jax.lax.dynamic_slice_in_dim(x_all, prev_idx, 1, axis=0)[0],
        jnp.zeros_like(x_all[0]),
    )
    x_s_prev = jnp.concatenate([x_prev_last[None], x_s[:-1]], axis=0)
    x_i = (
        w_b
        - _einsum("kmip,kmp->kmi", w_l, x_s_prev)
        - _einsum("kmip,kmp->kmi", w_r, x_s)
    )
    xb = jnp.concatenate([x_i, x_s], axis=-1)  # [K_loc, M, B]
    return jnp.moveaxis(xb, 1, 2).reshape(t_loc, m)


__all__ = ["schur_solve_shard"]
