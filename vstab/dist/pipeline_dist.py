"""Temporal-block sharded stabilization pipeline (SURVEY.md §2.2, §3.5;
BASELINE.json:9,11).

The time axis is the "sequence" (SURVEY.md §5 "Long-context"): frames are
sharded over the "time" mesh axis; every stage is block-local except

  1. flow at block seams  -> 1-frame halo, `ppermute` (vstab.dist.halo);
  2. vertex-profile cumsum -> exclusive prefix offsets, one `all_gather`
     of per-shard [GH,GW,2] totals;
  3. the smoothing solve  -> distributed Schur (vstab.dist.schur_dist):
     local interior elimination + all_gather'ed tiny separator system;
  4. 'auto' crop scale    -> one scalar `pmin`.

The reference is single-GPU, whole-clip-in-memory [EXT, SURVEY.md §2.2] —
this module is the scale-out capability it lacks. Per-chip memory is
O(T/n_time), enabling 1000+-frame 1080p on one host and multi-host 4K
(mesh spanning hosts; same code — collectives ride ICI then DCN).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vstab.core.config import Config
from vstab.dist.halo import extend_right, exclusive_prefix_sum
from vstab.dist.mesh import TIME_AXIS, make_mesh
from vstab.dist.schur_dist import schur_solve_shard
from vstab.kernels import twopass_validity, warp_twopass
from vstab.render.render import (
    _auto_scale_per_frame,
    grid_to_flow,
    zoom_resample,
)
from vstab.smooth.sparse_ls import (
    _einsum,
    spatial_modes,
    temporal_diagonals,
    vertex_motion,
)

Array = jax.Array


def _stab_shard(
    params,
    frames: Array,
    td0: Array,
    td1: Array,
    td2: Array,
    v: Array,
    alpha: Array,
    *,
    cfg: Config,
    t_real: int,
) -> Array:
    """Per-shard body (runs under shard_map over the "time" axis).

    frames [T_loc,H,W,3]; td* [T_loc,1] global-band temporal diagonals
    (length-T convention, see schur_dist); v [G,G], alpha [G] replicated.
    """
    t_loc, h, w, _ = frames.shape
    sc = cfg.smooth
    gh, gw = sc.grid_size
    g = gh * gw
    m = g * 2

    # --- 1. flow with a 1-frame right halo (ppermute; SURVEY.md §2.2
    # "ring-attention analogue"). Last shard edge-replicates: freeze-frame.
    from vstab.pipeline import clip_flow

    frames_ext = extend_right(frames, 1, TIME_AXIS)
    flow = clip_flow(params, frames_ext, cfg)  # [T_loc, H, W, 2]

    # --- 2. vertex profiles via distributed exclusive cumsum.
    motion = vertex_motion(flow, sc.grid_size)  # [T_loc, GH, GW, 2]
    local_cum = jnp.cumsum(motion, axis=0)
    offset = exclusive_prefix_sum(local_cum[-1], TIME_AXIS)
    # C_t = sum_{s<t} m_s: exclusive local cumsum + cross-shard offset.
    c = jnp.concatenate([jnp.zeros_like(motion[:1]), local_cum[:-1]], 0)
    c = c + offset[None]

    # --- 3. spectral decoupling (local) + distributed Schur solve.
    cvec = c.reshape(t_loc, g, 2)
    ctil = _einsum("ig,tic->tgc", v, cvec)
    rhs = (alpha[None, :, None] * ctil).reshape(t_loc, m)
    d0 = jnp.broadcast_to(td0 + jnp.repeat(alpha, 2)[None, :], (t_loc, m))
    d0 = d0 + sc.damping
    d1 = jnp.broadcast_to(td1, (t_loc, m))
    d2 = jnp.broadcast_to(td2, (t_loc, m))
    ptil = schur_solve_shard(d0, d1, d2, rhs, sc.block_len, TIME_AXIS)
    p = _einsum("ig,tgc->tic", v, ptil.reshape(t_loc, g, 2))
    disp = cvec - p  # stabilizing displacement, content-motion convention

    # --- 4. render: shard-local two-pass warp (kernels/warp1d.py); the
    # crop zoom is a separable resample; 'auto' needs one global pmin over
    # per-frame scales, with freeze-frame PADDED frames excluded so padding
    # cannot change the crop of the real output (ADVICE.md r1, last item).
    warp_flow = grid_to_flow(disp.reshape(t_loc, gh, gw, 2), h, w)
    rc = cfg.render
    out = warp_twopass(
        frames, warp_flow, max_disp=rc.max_residual_disp, impl=rc.kernel_impl
    )
    mask = twopass_validity((h, w), warp_flow, rc.max_residual_disp)[..., None]
    if rc.crop_mode == "none":
        return out * mask + rc.border_value * (1.0 - mask)
    if rc.crop_mode == "fixed":
        s = jnp.float32(rc.fixed_crop_ratio)
    else:  # 'auto'
        gidx = jax.lax.axis_index(TIME_AXIS) * t_loc + jnp.arange(t_loc)
        sper = jnp.where(
            gidx < t_real, _auto_scale_per_frame(warp_flow), 1.0
        )
        s = jax.lax.pmin(jnp.min(sper), TIME_AXIS)
    outz = zoom_resample(out, s)
    maskz = zoom_resample(mask, s)
    valid = (maskz > 0.999).astype(outz.dtype)
    return outz * valid + rc.border_value * (1.0 - valid)


def _band_diagonals(t_pad: int, sc) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Global temporal band diagonals in the length-T convention [T,1]."""
    td0, td1, td2 = temporal_diagonals(t_pad, sc.lambda_smooth, sc.lambda_accel)
    z1 = np.zeros(t_pad - len(td1), np.float32)
    z2 = np.zeros(t_pad - len(td2), np.float32)
    return (
        np.asarray(td0, np.float32)[:, None],
        np.concatenate([td1, z1])[:, None],
        np.concatenate([td2, z2])[:, None],
    )


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "t_real"))
def _stabilize_padded(params, frames, td0, td1, td2, v, alpha, cfg, mesh, t_real):
    fn = jax.shard_map(
        functools.partial(_stab_shard, cfg=cfg, t_real=t_real),
        mesh=mesh,
        in_specs=(
            P(),
            P(TIME_AXIS),
            P(TIME_AXIS),
            P(TIME_AXIS),
            P(TIME_AXIS),
            P(),
            P(),
        ),
        out_specs=P(TIME_AXIS),
        check_vma=False,
    )
    return fn(params, frames, td0, td1, td2, v, alpha)


def stabilize_sharded(
    frames: Array, params, cfg: Config, mesh: Optional[Mesh] = None
) -> Array:
    """Time-parallel stabilize: [T,H,W,3] -> [T,H,W,3] over mesh axis "time".

    Pads T (freeze-frame) so every shard holds an integer number of solver
    blocks; output is sliced back to T.
    """
    mesh = mesh if mesh is not None else make_mesh(cfg.dist)
    n_t = mesh.shape[TIME_AXIS]
    bl = cfg.smooth.block_len
    t = frames.shape[0]
    t_pad = -(-t // (n_t * bl)) * (n_t * bl)
    if t_pad > t:
        frames = jnp.concatenate(
            [frames, jnp.repeat(frames[-1:], t_pad - t, axis=0)], axis=0
        )

    gh, gw = cfg.smooth.grid_size
    v_np, mu_np = spatial_modes(gh, gw)
    alpha = jnp.asarray(
        cfg.smooth.lambda_data + cfg.smooth.lambda_rigid * mu_np
    )
    v = jnp.asarray(v_np)
    td0, td1, td2 = (jnp.asarray(x) for x in _band_diagonals(t_pad, cfg.smooth))

    ts = NamedSharding(mesh, P(TIME_AXIS))
    frames = jax.device_put(frames, ts)
    out = _stabilize_padded(
        params, frames, *(jax.device_put(x, ts) for x in (td0, td1, td2)),
        jax.device_put(v, NamedSharding(mesh, P())),
        jax.device_put(alpha, NamedSharding(mesh, P())),
        cfg, mesh, t,
    )
    return out[:t]


__all__ = ["stabilize_sharded", "_stab_shard", "_band_diagonals"]
