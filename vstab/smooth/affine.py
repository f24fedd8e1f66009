"""Global-affine camera-path smoothing — the v1 / config-1 path
(BASELINE.json:7 "per-frame affine smoothing warp (PR1 ref)"; SURVEY.md §2.1).

Stages:
1. `fit_affine_from_flow` — robust IRLS least-squares fit of a 2x3 affine to
   each inter-frame flow field (vmapped over pairs; normal equations are a
   6x6 solve, trivially batched on the MXU).
2. `chain_path` — accumulate pairwise transforms into the camera trajectory
   C_t (frame-0 -> frame-t), via an associative scan (log-depth on TPU).
3. `smooth_path` — Gaussian low-pass of the trajectory parameters.
4. `stabilizing_transforms` — W_t = C_t ∘ S_t^{-1}: maps output (stabilized)
   pixel coords to input-frame coords for the renderer's backward warp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vstab.core.types import (
    CameraPath,
    compose_affine,
    identity_affine,
    invert_affine,
)

Array = jax.Array


def _grid_points(h: int, w: int, step: int):
    ys = jnp.arange(step // 2, h, step, dtype=jnp.float32)
    xs = jnp.arange(step // 2, w, step, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return xx.reshape(-1), yy.reshape(-1)


@functools.partial(jax.jit, static_argnames=("step", "iters"))
def fit_affine_from_flow(flow: Array, step: int = 16, iters: int = 3) -> Array:
    """Fit 2x3 affines A_t with p + flow_t(p) ≈ A_t p. flow: [N,H,W,2] -> [N,2,3].

    IRLS with Huber weights for robustness to foreground motion — the
    reference-class pipelines use RANSAC on sparse features [RECON]; IRLS is
    the jit-friendly, fixed-shape equivalent.
    """
    n, h, w, _ = flow.shape
    xs, ys = _grid_points(h, w, step)
    xi = xs.astype(jnp.int32)
    yi = ys.astype(jnp.int32)
    u = flow[:, yi, xi, 0]  # [N, P]
    v = flow[:, yi, xi, 1]
    tx = xs[None] + u  # target coords
    ty = ys[None] + v

    ones = jnp.ones_like(xs)
    # Design matrix for [a, b, tx; c, d, ty]: X = [x, y, 1] per point.
    X = jnp.stack([xs, ys, ones], axis=-1)  # [P, 3]

    def solve_one(txi, tyi):
        def body(wgt, _):
            # Weighted normal equations, solved once for both output rows.
            XtW = X.T * wgt[None, :]  # [3, P]
            A = XtW @ X + 1e-6 * jnp.eye(3)
            bx = XtW @ txi
            by = XtW @ tyi
            sol = jnp.linalg.solve(A, jnp.stack([bx, by], axis=-1))  # [3,2]
            aff = sol.T  # [2,3]
            rx = (X @ sol[:, 0]) - txi
            ry = (X @ sol[:, 1]) - tyi
            r = jnp.sqrt(rx**2 + ry**2 + 1e-8)
            delta = 1.345 * jnp.maximum(jnp.median(r), 1e-3)
            new_w = jnp.minimum(1.0, delta / r)  # Huber weights
            return new_w, aff

        w0 = jnp.ones_like(txi)
        _, affs = jax.lax.scan(body, w0, None, length=iters)
        return affs[-1]

    return jax.vmap(solve_one)(tx, ty)


def chain_path(pair_transforms: Array) -> CameraPath:
    """Accumulate pairwise A_t (frame t -> t+1 coords) into C_t (frame 0 -> t).

    C_0 = I; C_{t+1} = A_t ∘ C_t. Log-depth associative scan over the
    (associative) affine composition — TPU-friendly vs a serial loop.
    """
    eye = identity_affine()[None]
    seq = jnp.concatenate([eye, pair_transforms], axis=0)  # [T, 2, 3]
    # associative_scan composes prefixes: out[t] = seq[t] ∘ ... ∘ seq[0]
    chained = jax.lax.associative_scan(
        lambda a, b: compose_affine(b, a), seq, axis=0
    )
    return CameraPath(transforms=chained)


@functools.partial(jax.jit, static_argnames=("sigma",))
def smooth_path(path: CameraPath, sigma: float = 9.0) -> CameraPath:
    """Gaussian low-pass of the 6 affine parameters along time (reflect pad)."""
    t = path.transforms.shape[0]
    radius = max(1, int(3 * sigma))
    k = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    kern = jnp.exp(-0.5 * (k / sigma) ** 2)
    kern = kern / jnp.sum(kern)
    params = path.transforms.reshape(t, 6)
    padded = jnp.pad(params, ((radius, radius), (0, 0)), mode="reflect")
    # [T+2r, 6] conv along time for each param.
    smoothed = jax.vmap(
        lambda col: jnp.convolve(col, kern, mode="valid"), in_axes=1, out_axes=1
    )(padded)
    return CameraPath(transforms=smoothed.reshape(t, 2, 3))


@jax.jit
def stabilizing_transforms(orig: CameraPath, smoothed: CameraPath) -> Array:
    """W_t = C_t ∘ S_t^{-1}: output-pixel -> input-frame coords. [T,2,3]."""
    return compose_affine(orig.transforms, invert_affine(smoothed.transforms))


def smooth_affine(flow: Array, sigma: float = 9.0) -> Array:
    """flow [T-1,H,W,2] -> per-frame stabilizing affine warps [T,2,3]."""
    pair = fit_affine_from_flow(flow)
    path = chain_path(pair)
    sm = smooth_path(path, sigma=sigma)
    return stabilizing_transforms(path, sm)


__all__ = [
    "fit_affine_from_flow",
    "chain_path",
    "smooth_path",
    "stabilizing_transforms",
    "smooth_affine",
]
