"""Sparse-least-squares motion-field smoothing (SURVEY.md §2.1
"Sparse-LS motion smoothing", §3.3; BASELINE.json:5 "camera-trajectory/
motion-field smoothing posed as a sparse least-squares problem").

Model (MeshFlow/bundled-paths analogue [EXT]): a GH x GW grid of vertices;
each vertex g accumulates the local flow into a "vertex profile" C_t(g)
(its camera path). Smoothed profiles P minimize

  E(P) = lam_d  sum_t ||P_t - C_t||^2                      (data)
       + lam_s  sum_t ||P_{t+1} - P_t||^2                  (temporal smooth)
       + lam_a  sum_t ||P_{t+1} - 2 P_t + P_{t-1}||^2      (acceleration)
       + lam_r  sum_t ||D_s (P_t - C_t)||^2                (spatial rigidity)

with D_s the 4-neighbor grid difference operator. The normal equations are

  [ I_T (x) (lam_d I + lam_r L_s)  +  (lam_s L1 + lam_a L2) (x) I_G ] p = rhs

— a Kronecker sum. TPU-native key move: diagonalize the (small, static)
spatial Laplacian L_s = V diag(mu) V^T once per grid shape; in that basis
the system decouples into G independent SPD *pentadiagonal* systems in time
with per-mode diagonal shift alpha_g = lam_d + lam_r * mu_g, batched over
modes x 2 components on the VPU lanes and solved by the Schur-complement
block solver (vstab.smooth.schur). This is the "pose-graph/BA analogue" of
BASELINE.json:5 with the elimination structure chosen for the MXU.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vstab.core.config import SmoothConfig
from vstab.smooth.banded import banded_solve_scan
from vstab.smooth.schur import schur_solve

Array = jax.Array

def _einsum(subs, *ops):
    """einsum pinned to full-f32 accumulation (TPU default is bf16 inputs,
    which loses ~8 mantissa bits — fatal for the normal-equation solves)."""
    return jnp.einsum(subs, *ops, precision=jax.lax.Precision.HIGHEST)



# ---------------------------------------------------------------------------
# Vertex profiles from flow
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _pool_matrices(h: int, w: int, gh: int, gw: int):
    """Row-normalized 0/1 cell-selector matrices (By [GH,H], Bx [GW,W]) for
    averaging over the linspace partition of rows/cols (host-side, static)."""

    def sel(n, g):
        edges = np.linspace(0, n, g + 1).astype(np.int64)
        m = np.zeros((g, n), np.float32)
        for i in range(g):
            m[i, edges[i] : edges[i + 1]] = 1.0 / max(edges[i + 1] - edges[i], 1)
        return m

    return sel(h, gh), sel(w, gw)


def _pool(by: Array, bx: Array, field: Array) -> Array:
    """Separable cell pooling: [N,H,W,C] -> [N,GH,GW,C] (two MXU matmuls)."""
    return _einsum("xw,ngwc->ngxc", bx, _einsum("gh,nhwc->ngwc", by, field))


def vertex_motion(
    flow: Array, grid_size: Tuple[int, int], robust_iters: int = 2
) -> Array:
    """Per-vertex motion from dense flow: [N,H,W,2] -> [N,GH,GW,2].

    Robust local aggregate: IRLS (Geman-McClure) weighted cell pooling —
    a soft median. A plain average lets independently moving foreground
    (pedestrians/cars; VERDICT r4 item 3) drag the vertex profile away
    from the camera motion; each IRLS round down-weights pixels whose
    flow disagrees with the current cell estimate, with the robustness
    scale derived per cell from the mean absolute residual (so the same
    code works at any resolution/shake magnitude). Everything stays two
    selector matmuls per pooling (MXU) plus elementwise work — the round-1
    full-res spatial cumsum formulation dominated the smoothing stage on
    TPU (VERDICT r1 "weak" 1). robust_iters=0 recovers the plain mean.
    """
    n, h, w, _ = flow.shape
    gh, gw = grid_size
    by_np, bx_np = _pool_matrices(h, w, gh, gw)
    by = jnp.asarray(by_np)
    bx = jnp.asarray(bx_np)
    # 0/1 broadcast-back matrices (each pixel belongs to exactly one cell).
    byb = jnp.asarray((by_np > 0).astype(np.float32))
    bxb = jnp.asarray((bx_np > 0).astype(np.float32))
    est = _pool(by, bx, flow)  # plain mean init
    for _ in range(max(0, robust_iters)):
        # broadcast the cell estimate back to its pixels
        est_pix = _einsum(
            "hg,ngwc->nhwc", byb.T, _einsum("wx,ngxc->ngwc", bxb.T, est)
        )
        r2 = jnp.sum((flow - est_pix) ** 2, axis=-1, keepdims=True)
        # per-cell scale: c = 1.5 * mean|r| + eps, broadcast back
        c_cell = 1.5 * _pool(by, bx, jnp.sqrt(r2)) + 0.25
        c_pix = _einsum(
            "hg,ngwc->nhwc", byb.T, _einsum("wx,ngxc->ngwc", bxb.T, c_cell)
        )
        wgt = c_pix**2 / (c_pix**2 + r2)  # Geman-McClure
        est = _pool(by, bx, wgt * flow) / jnp.maximum(
            _pool(by, bx, wgt), 1e-6
        )
    return est


def vertex_profiles(
    flow: Array, grid_size: Tuple[int, int], robust_iters: int = 2
) -> Array:
    """Accumulated vertex paths C: [T-1,H,W,2] flow -> [T,GH,GW,2]."""
    m = vertex_motion(flow, grid_size, robust_iters)
    zero = jnp.zeros_like(m[:1])
    return jnp.concatenate([zero, jnp.cumsum(m, axis=0)], axis=0)


# ---------------------------------------------------------------------------
# Static operators (host-side, cached per shape)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def spatial_modes(gh: int, gw: int) -> Tuple[np.ndarray, np.ndarray]:
    """Eigendecomposition of the 4-neighbor grid Laplacian: (V [G,G], mu [G])."""
    g = gh * gw
    lap = np.zeros((g, g), np.float64)
    idx = lambda i, j: i * gw + j
    for i in range(gh):
        for j in range(gw):
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ni, nj = i + di, j + dj
                if 0 <= ni < gh and 0 <= nj < gw:
                    lap[idx(i, j), idx(i, j)] += 1.0
                    lap[idx(i, j), idx(ni, nj)] -= 1.0
    mu, v = np.linalg.eigh(lap)
    return v.astype(np.float32), np.maximum(mu, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=32)
def temporal_diagonals(t: int, lam_s: float, lam_a: float):
    """Band diagonals of lam_s*D1^T D1 + lam_a*D2^T D2 (numpy, static T)."""
    d0 = np.zeros(t, np.float32)
    d1 = np.zeros(max(t - 1, 0), np.float32)
    d2 = np.zeros(max(t - 2, 0), np.float32)
    if t >= 2:
        # First differences: rows r=0..t-2: x_{r+1} - x_r
        d0[: t - 1] += lam_s
        d0[1:] += lam_s
        d1 += -lam_s
    if t >= 3:
        # Second differences: rows r=1..t-2: x_{r-1} - 2 x_r + x_{r+1}
        for r in range(1, t - 1):
            d0[r - 1] += lam_a
            d0[r] += 4.0 * lam_a
            d0[r + 1] += lam_a
            d1[r - 1] += -2.0 * lam_a
            d1[r] += -2.0 * lam_a
            d2[r - 1] += lam_a
    return d0, d1, d2


# ---------------------------------------------------------------------------
# The solve
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def smooth_profiles(c: Array, cfg: SmoothConfig) -> Array:
    """Solve for smoothed vertex profiles P given C [T,GH,GW,2]."""
    t, gh, gw, _ = c.shape
    g = gh * gw
    v_np, mu_np = spatial_modes(gh, gw)
    v = jnp.asarray(v_np)
    mu = jnp.asarray(mu_np)
    td0, td1, td2 = (
        jnp.asarray(x)
        for x in temporal_diagonals(t, cfg.lambda_smooth, cfg.lambda_accel)
    )

    alpha = cfg.lambda_data + cfg.lambda_rigid * mu  # [G]
    cvec = c.reshape(t, g, 2)
    # To eigenbasis: ctil[t, g, comp] = V^T c
    ctil = _einsum("ig,tic->tgc", v, cvec)
    rhs = (alpha[None, :, None] * ctil).reshape(t, g * 2)

    m = g * 2
    d0 = td0[:, None] + jnp.repeat(alpha, 2)[None, :]
    d0 = jnp.broadcast_to(d0, (t, m))
    d0 = d0 + cfg.damping
    d1 = jnp.broadcast_to(td1[:, None], (max(t - 1, 0), m))
    d2 = jnp.broadcast_to(td2[:, None], (max(t - 2, 0), m))

    if t >= 3 * cfg.block_len:
        ptil = schur_solve(d0, d1, d2, rhs, block_len=cfg.block_len)
    else:
        ptil = banded_solve_scan(d0, d1, d2, rhs)

    ptil = ptil.reshape(t, g, 2)
    p = _einsum("ig,tgc->tic", v, ptil)  # back: V @ ptil
    return p.reshape(t, gh, gw, 2)


@functools.partial(jax.jit, static_argnames=("frame_hw", "cfg"))
def smooth_grid_field(
    flow: Array, frame_hw: Tuple[int, int], cfg: SmoothConfig
) -> Tuple[Array, Dict[str, Array]]:
    """flow [T-1,H,W,2] -> (stabilizing displacement grid [T,GH,GW,2], diags).

    Output disp: the renderer samples input frame t at p + interp(disp_t)(p);
    disp = C - P (real camera path minus smoothed path, in content-motion
    convention — see vstab.smooth.affine for the affine-path derivation).
    """
    c = vertex_profiles(flow, cfg.grid_size, cfg.robust_iters)
    p = smooth_profiles(c, cfg)
    disp = c - p
    return disp, {"profiles": c, "smoothed": p}


__all__ = [
    "vertex_motion",
    "vertex_profiles",
    "spatial_modes",
    "temporal_diagonals",
    "smooth_profiles",
    "smooth_grid_field",
]
