"""PWC-Net assembly: coarse-to-fine flow over the feature pyramid
(SURVEY.md §2.1 "PWC-Net assembly", §3.2 call stack; PAPERS.md:5).

Flow semantics: at every level, flow is in *pixels of that level's
resolution* (self-consistent coarse-to-fine: upsampling doubles both the
grid and the values). The final output is upsampled to input resolution.

The cost-volume and warp ops route through vstab.kernels (Pallas on TPU,
XLA fallback elsewhere) — the reference's CUDA correlation package analogue
[EXT, SURVEY.md §2.3].
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vstab.core.config import FlowConfig
from vstab.flow.context import ContextNet
from vstab.flow.encoder import FeaturePyramid
from vstab.flow.estimator import FlowEstimator, UpBlock
from vstab.kernels import bilinear_warp, cost_volume

Array = jax.Array


def _leaky(x: Array) -> Array:
    return nn.leaky_relu(x, negative_slope=0.1)


class PWCNet(nn.Module):
    """Full coarse-to-fine flow network.

    __call__(im1, im2) -> dict with:
      'flow'         : [N, H, W, 2] full-resolution flow (float32)
      'flow_pyramid' : tuple of per-level flows, coarsest first
    Input H, W must be divisible by 2**len(pyramid_channels); use
    `estimate_flow` for automatic padding.
    """

    cfg: FlowConfig = FlowConfig()

    @nn.compact
    def __call__(
        self, im1: Array, im2: Array, feats: Tuple | None = None
    ) -> Dict[str, object]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        num_levels = len(cfg.pyramid_channels)
        if feats is None:
            pyramid = FeaturePyramid(
                cfg.pyramid_channels, dtype=dtype, name="pyramid"
            )
            feats1 = pyramid(im1)
            feats2 = pyramid(im2)
        else:
            # Precomputed pyramids (estimate_flow_shared): in consecutive-
            # pair clip flow each interior frame is both someone's f1 and
            # someone's f2 — encoding every frame once halves the encoder
            # work (measured ~5% MFU at 720p, ~20% of the flow wall;
            # VERDICT r4 item 5).
            feats1, feats2 = feats

        flows = []
        flow = None
        feat = None
        # levels: index num_levels-1 (coarsest) down to output_level-1 (finest
        # estimated level; output_level is in "pyramid level" numbering where
        # level 1 = half res, so index = output_level - 1).
        fine_idx = cfg.output_level - 1
        for idx in range(num_levels - 1, fine_idx - 1, -1):
            f1, f2 = feats1[idx], feats2[idx]
            if flow is None:
                f2w = f2
                up_inputs = []
            else:
                upflow, upfeat = UpBlock(
                    feat_channels=2, dtype=dtype, name=f"up{idx}"
                )(flow, feat)
                upflow = 2.0 * upflow  # level change doubles pixel units
                f2w = bilinear_warp(
                    f2,
                    upflow.astype(f2.dtype),
                    impl=cfg.kernel_impl,
                    max_disp=cfg.warp_max_disp,
                )
                up_inputs = [upflow.astype(dtype), upfeat]
            cv = cost_volume(
                f1.astype(dtype), f2w.astype(dtype),
                radius=cfg.search_radius, impl=cfg.kernel_impl,
            )
            cv = _leaky(cv.astype(dtype))
            inp = jnp.concatenate([cv, f1.astype(dtype)] + up_inputs, axis=-1)
            flow_l, feat = FlowEstimator(
                cfg.estimator_channels, dtype=dtype, name=f"estimator{idx}"
            )(inp)
            if flow is not None:
                flow_l = flow_l + upflow
            flow = flow_l
            flows.append(flow)

        # Context refinement at the finest estimated level.
        flow = ContextNet(
            cfg.context_dilations, dtype=dtype, name="context"
        )(feat, flow)
        flows[-1] = flow

        # Upsample to full input resolution (x 2**output_level, scaling values).
        scale = 2.0 ** cfg.output_level
        n, h, w, _ = flow.shape
        full = (
            jax.image.resize(
                flow,
                (n, int(h * scale), int(w * scale), 2),
                method="bilinear",
            )
            * scale
        )
        return {"flow": full.astype(jnp.float32), "flow_pyramid": tuple(flows)}


def pad_to_multiple(x: Array, mult: int) -> Tuple[Array, Tuple[int, int]]:
    """Edge-pad H, W (axes 1, 2) up to a multiple of `mult`."""
    h, w = x.shape[1], x.shape[2]
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return x, (ph, pw)


def estimate_flow(params, im1: Array, im2: Array, cfg: FlowConfig) -> Array:
    """Flow for a batch of frame pairs, any H/W: [N,H,W,3]x2 -> [N,H,W,2]."""
    mult = 2 ** len(cfg.pyramid_channels)
    h, w = im1.shape[1], im1.shape[2]
    im1p, _ = pad_to_multiple(im1, mult)
    im2p, _ = pad_to_multiple(im2, mult)
    out = PWCNet(cfg).apply(params, im1p, im2p)
    return out["flow"][:, :h, :w]


def estimate_flow_pairs(params, frames: Array, cfg: FlowConfig) -> Array:
    """Consecutive-pair flow over a clip: [T,H,W,3] -> [T-1,H,W,2].

    Shared-pyramid path: each of the T frames is encoded ONCE and the
    per-level features are sliced into (f1, f2) views — a plain
    estimate_flow(frames[:-1], frames[1:]) encodes every interior frame
    twice (VERDICT r4 item 5; ~20% of the 720p flow wall is encoder)."""
    from vstab.flow.encoder import FeaturePyramid

    cfg_dtype = jnp.dtype(cfg.compute_dtype)
    mult = 2 ** len(cfg.pyramid_channels)
    h, w = frames.shape[1], frames.shape[2]
    fp, _ = pad_to_multiple(frames, mult)
    pyr = FeaturePyramid(cfg.pyramid_channels, dtype=cfg_dtype)
    feats = pyr.apply({"params": params["params"]["pyramid"]}, fp)
    feats1 = tuple(f[:-1] for f in feats)
    feats2 = tuple(f[1:] for f in feats)
    out = PWCNet(cfg).apply(params, fp[:-1], fp[1:], feats=(feats1, feats2))
    return out["flow"][:, :h, :w]


def init_params(rng: jax.Array, cfg: FlowConfig, h: int = 64, w: int = 64):
    """Initialize PWC-Net parameters with dummy shapes (shape-agnostic convs)."""
    mult = 2 ** len(cfg.pyramid_channels)
    h = max(h, mult)
    w = max(w, mult)
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    # jit the init: eager flax init dispatches hundreds of individual ops,
    # which is minutes of round-trips on a remote-tunneled TPU backend.
    return jax.jit(PWCNet(cfg).init)(rng, dummy, dummy)


__all__ = [
    "PWCNet",
    "estimate_flow",
    "estimate_flow_pairs",
    "init_params",
    "pad_to_multiple",
]
