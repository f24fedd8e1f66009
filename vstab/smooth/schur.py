"""Schur-complement block elimination for the smoothing normal equations
(SURVEY.md §2.1 "Schur-complement reduction", §3.3; BASELINE.json:5).

Solves the same batched SPD pentadiagonal systems as
`vstab.smooth.banded.banded_solve_scan`, but by domain decomposition over
temporal blocks — the TPU-native formulation:

- time axis T is partitioned into K blocks of length B;
- each block's last q=2 rows are its *separator* (block border);
- interiors don't couple across separators (bandwidth q), so all K interior
  factorizations and eliminations are batched dense Cholesky solves
  (vmapped over blocks x modes -> MXU);
- the reduced separator system is block-tridiagonal with q x q blocks and
  only K blocks long — tiny; solved by a batched block-Thomas scan;
- back-substitution is again embarrassingly parallel over blocks.

This same structure is what distributes over a `"time"` mesh axis: interiors
stay shard-local, the reduced separator system is the only thing collected
over ICI (vstab.dist.schur_dist).

Band layout matches vstab.smooth.banded: d0 [T,M], d1 [T-1,M], d2 [T-2,M].
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

Q = 2  # half-bandwidth == separator width

def _einsum(subs, *ops):
    """einsum pinned to full-f32 accumulation (TPU default is bf16 inputs,
    which loses ~8 mantissa bits — fatal for the normal-equation solves)."""
    return jnp.einsum(subs, *ops, precision=jax.lax.Precision.HIGHEST)



def _pad_system(d0, d1, d2, b, block_len):
    """Pad T up to a multiple of block_len with identity rows (x=0)."""
    t, m = d0.shape
    tp = -(-t // block_len) * block_len
    pad = tp - t
    d0p = jnp.concatenate([d0, jnp.ones((pad, m), d0.dtype)], axis=0)
    d1p = jnp.concatenate([d1, jnp.zeros((pad, m), d0.dtype)], axis=0)
    d2p = jnp.concatenate([d2, jnp.zeros((pad, m), d0.dtype)], axis=0)
    bp = jnp.concatenate([b, jnp.zeros((pad, m), d0.dtype)], axis=0)
    return d0p, d1p, d2p, bp, tp


def blockify(d0: Array, d1: Array, d2: Array, b: Array, block_len: int):
    """Assemble per-block dense operators from the band diagonals.

    Returns (per block k, batched over modes M):
      a_ii  [K, M, m, m]  interior matrix           (m = block_len - Q)
      e_l   [K, M, m, Q]  coupling to separator k-1 (zero for k=0)
      e_r   [K, M, m, Q]  coupling to separator k
      d_sep [K, M, Q, Q]  separator diagonal block
      b_i   [K, M, m]     interior rhs
      b_s   [K, M, Q]     separator rhs
    """
    bl = block_len
    m = bl - Q
    t, nm = d0.shape
    k = t // bl
    d0r = d0.reshape(k, bl, nm)
    # d1[i] = A[i+1, i]; index by block: d1r[k, j] = A[kB+j+1, kB+j].
    d1r = jnp.concatenate([d1, jnp.zeros((1, nm), d0.dtype)], axis=0).reshape(
        k, bl, nm
    )
    d2r = jnp.concatenate([d2, jnp.zeros((2, nm), d0.dtype)], axis=0).reshape(
        k, bl, nm
    )
    br = b.reshape(k, bl, nm)

    # Interior dense matrices [K, nm, m, m].
    eye_like = jnp.zeros((k, nm, m, m), d0.dtype)
    ii = jnp.arange(m)
    a_ii = eye_like.at[:, :, ii, ii].set(jnp.moveaxis(d0r[:, :m], 1, 2))
    a_ii = a_ii.at[:, :, ii[1:], ii[:-1]].set(
        jnp.moveaxis(d1r[:, : m - 1], 1, 2)
    )
    a_ii = a_ii.at[:, :, ii[:-1], ii[1:]].set(
        jnp.moveaxis(d1r[:, : m - 1], 1, 2)
    )
    a_ii = a_ii.at[:, :, ii[2:], ii[:-2]].set(
        jnp.moveaxis(d2r[:, : m - 2], 1, 2)
    )
    a_ii = a_ii.at[:, :, ii[:-2], ii[2:]].set(
        jnp.moveaxis(d2r[:, : m - 2], 1, 2)
    )

    # Right coupling E_R [K, nm, m, Q]: interior rows m-2, m-1 -> sep rows 0, 1.
    e_r = jnp.zeros((k, nm, m, Q), d0.dtype)
    e_r = e_r.at[:, :, m - 2, 0].set(d2r[:, m - 2])
    e_r = e_r.at[:, :, m - 1, 0].set(d1r[:, m - 1])
    e_r = e_r.at[:, :, m - 1, 1].set(d2r[:, m - 1])

    # Left coupling E_L [K, nm, m, Q]: interior rows 0, 1 -> sep_{k-1} rows 0,1.
    # Entries come from the PREVIOUS block's trailing diagonals.
    e_l = jnp.zeros((k, nm, m, Q), d0.dtype)
    prev_d1_last = jnp.concatenate(
        [jnp.zeros((1, nm), d0.dtype), d1r[:-1, bl - 1]], axis=0
    )  # A[kB, kB-1]
    prev_d2_last2 = jnp.concatenate(
        [jnp.zeros((1, nm), d0.dtype), d2r[:-1, bl - 2]], axis=0
    )  # A[kB, kB-2]
    prev_d2_last = jnp.concatenate(
        [jnp.zeros((1, nm), d0.dtype), d2r[:-1, bl - 1]], axis=0
    )  # A[kB+1, kB-1]
    e_l = e_l.at[:, :, 0, 1].set(prev_d1_last)
    e_l = e_l.at[:, :, 0, 0].set(prev_d2_last2)
    e_l = e_l.at[:, :, 1, 1].set(prev_d2_last)

    # Separator diagonal blocks [K, nm, Q, Q].
    d_sep = jnp.zeros((k, nm, Q, Q), d0.dtype)
    d_sep = d_sep.at[:, :, 0, 0].set(d0r[:, m])
    d_sep = d_sep.at[:, :, 1, 1].set(d0r[:, m + 1])
    d_sep = d_sep.at[:, :, 0, 1].set(d1r[:, m])
    d_sep = d_sep.at[:, :, 1, 0].set(d1r[:, m])

    b_i = jnp.moveaxis(br[:, :m], 1, 2)  # [K, nm, m]
    b_s = jnp.moveaxis(br[:, m:], 1, 2)  # [K, nm, Q]
    return a_ii, e_l, e_r, d_sep, b_i, b_s


def interior_eliminate(a_ii, e_l, e_r, b_i):
    """Factor interiors and form their Schur contributions.

    Returns (chol, w_l, w_r, w_b, contributions) where
      w_l = A_II^{-1} E_L, w_r = A_II^{-1} E_R, w_b = A_II^{-1} b_I
    and the separator contributions:
      s_ll = E_L^T w_l   (adds to S[k-1, k-1])
      s_rr = E_R^T w_r   (adds to S[k, k])
      s_lr = E_L^T w_r   (adds to S[k-1, k])
      g_l  = E_L^T w_b   (adds to rhs_S[k-1])
      g_r  = E_R^T w_b   (adds to rhs_S[k])
    All batched over [K, M].
    """
    chol = jax.vmap(jax.vmap(jnp.linalg.cholesky))(a_ii)

    def chosolve(l, rhs):
        y = jax.scipy.linalg.solve_triangular(l, rhs, lower=True)
        return jax.scipy.linalg.solve_triangular(l.T, y, lower=False)

    vsolve = jax.vmap(jax.vmap(chosolve))
    w_l = vsolve(chol, e_l)
    w_r = vsolve(chol, e_r)
    w_b = vsolve(chol, b_i[..., None])[..., 0]

    tdot = lambda a, b: _einsum("kmip,kmiq->kmpq", a, b)
    s_ll = tdot(e_l, w_l)
    s_rr = tdot(e_r, w_r)
    s_lr = tdot(e_l, w_r)
    g_l = _einsum("kmip,kmi->kmp", e_l, w_b)
    g_r = _einsum("kmip,kmi->kmp", e_r, w_b)
    return chol, w_l, w_r, w_b, (s_ll, s_rr, s_lr, g_l, g_r)


def reduce_separator_system(d_sep, contrib):
    """Assemble the reduced block-tridiagonal separator system.

    Separator k diag: D_k - s_rr[k] - s_ll[k+1]; off-diag (k-1,k): -s_lr[k].
    Returns (diag [K,M,Q,Q], off [K-1,M,Q,Q] as S[k,k+1], rhs adjustment).
    """
    s_ll, s_rr, s_lr, g_l, g_r = contrib
    k = d_sep.shape[0]
    diag = d_sep - s_rr
    diag = diag.at[: k - 1].add(-s_ll[1:])
    off = -s_lr[1:]  # off[k] = S[k, k+1], from block k+1's elimination
    return diag, off, g_l, g_r


def _inv2x2(a: Array) -> Array:
    """Closed-form batched 2x2 inverse (TPU-friendly: no LU expansion)."""
    det = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    inv_det = 1.0 / det
    out = jnp.stack(
        [
            jnp.stack([a[..., 1, 1], -a[..., 0, 1]], axis=-1),
            jnp.stack([-a[..., 1, 0], a[..., 0, 0]], axis=-1),
        ],
        axis=-2,
    )
    return out * inv_det[..., None, None]


def block_tridiag_solve(diag: Array, off: Array, rhs: Array) -> Array:
    """Block-Thomas solve: diag [K,M,Q,Q], off [K-1,M,Q,Q] (= S[k,k+1]),
    rhs [K,M,Q] -> x [K,M,Q]. Batched over M; sequential over the (small) K.

    Q == 2, so all small inverses are closed-form (no LU — TPU-friendly)."""
    k = diag.shape[0]
    offp = jnp.concatenate([jnp.zeros_like(off[:1]), off], axis=0)  # S[k-1,k]

    def fwd(carry, inp):
        dprev, yprev = carry
        d_k, o_km1, r_k = inp  # o_km1 = S[k-1, k]; zero at k=0
        # factor = S[k, k-1] @ inv(Dprev) = o_km1^T @ inv(dprev)
        inv_prev = _inv2x2(dprev)
        factor = _einsum("mqp,mpr->mqr", jnp.swapaxes(o_km1, -1, -2), inv_prev)
        d_new = d_k - _einsum("mqr,mrp->mqp", factor, o_km1)
        y_new = r_k - _einsum("mqr,mr->mq", factor, yprev)
        return (d_new, y_new), (d_new, y_new)

    eye = jnp.broadcast_to(jnp.eye(Q, dtype=diag.dtype), diag.shape[1:])
    init = (eye, jnp.zeros_like(rhs[0]))
    _, (dfac, yfac) = jax.lax.scan(fwd, init, (diag, offp, rhs))

    def bwd(xnext, inp):
        d_k, y_k, o_k = inp  # o_k = S[k, k+1] (zero for last)
        rhs_k = y_k - _einsum("mqr,mr->mq", o_k, xnext)
        x_k = _einsum("mqr,mr->mq", _inv2x2(d_k), rhs_k)
        return x_k, x_k

    offn = jnp.concatenate([off, jnp.zeros_like(off[:1])], axis=0)
    _, xs = jax.lax.scan(
        bwd, jnp.zeros_like(rhs[0]), (dfac, yfac, offn), reverse=True
    )
    return xs


@functools.partial(jax.jit, static_argnames=("block_len",))
def schur_solve(
    d0: Array, d1: Array, d2: Array, b: Array, block_len: int = 32
) -> Array:
    """Solve SPD pentadiagonal A x = b by Schur-complement block elimination.

    Same contract as banded_solve_scan; requires block_len >= 2*Q + 1.
    """
    t, _ = d0.shape
    d0p, d1p, d2p, bp, tp = _pad_system(d0, d1, d2, b, block_len)
    a_ii, e_l, e_r, d_sep, b_i, b_s = blockify(d0p, d1p, d2p, bp, block_len)
    with jax.default_matmul_precision("highest"):
        chol, w_l, w_r, w_b, contrib = interior_eliminate(a_ii, e_l, e_r, b_i)
    diag, off, g_l, g_r = reduce_separator_system(d_sep, contrib)

    # rhs_S[k] = b_S[k] - g_r[k] - g_l[k+1]
    k = d_sep.shape[0]
    rhs_s = b_s - g_r
    rhs_s = rhs_s.at[: k - 1].add(-g_l[1:])

    x_s = block_tridiag_solve(diag, off, rhs_s)  # [K, M, Q]

    # Back-substitute interiors:
    # x_I[k] = w_b[k] - W_L[k] x_S[k-1] - W_R[k] x_S[k]
    x_s_prev = jnp.concatenate([jnp.zeros_like(x_s[:1]), x_s[:-1]], axis=0)
    x_i = (
        w_b
        - _einsum("kmip,kmp->kmi", w_l, x_s_prev)
        - _einsum("kmip,kmp->kmi", w_r, x_s)
    )

    # Reassemble [K, M, B] -> [T, M].
    xb = jnp.concatenate([x_i, x_s], axis=-1)  # [K, M, B]
    x = jnp.moveaxis(xb, 1, 2).reshape(tp, -1)
    return x[:t]


__all__ = ["schur_solve", "block_tridiag_solve", "blockify", "interior_eliminate"]
