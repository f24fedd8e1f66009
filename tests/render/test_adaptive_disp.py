"""Adaptive render-warp displacement bound (VERDICT r3 item 7).

Round 3's fixed max_residual_disp=16 masked any pixel whose mean-removed
residual exceeded 16px to border_value — strong shake punched border-colored
holes in the interior. The renderer now derives the bound from the solved
path (render.residual_disp_bound / pick_max_disp); the headline test here is
the VERDICT "done" criterion: 24px shake renders with NO masked-out interior
pixels."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from vstab.core.config import Config, FlowConfig, RenderConfig, SmoothConfig
from vstab.render.render import (
    _resize_mean_weights,
    grid_to_flow,
    pick_max_disp,
    residual_disp_bound,
)


def test_resize_mean_weights_are_exact():
    """w[v] must reproduce the pixel mean of any bilinear-upsampled field."""
    rng = np.random.default_rng(0)
    g, n = 5, 37
    vals = rng.normal(size=(1, g, 1, 1)).astype(np.float32)
    dense = np.asarray(grid_to_flow(jnp.asarray(np.tile(vals, (1, 1, 4, 2))), n, 16))
    wv = np.asarray(_resize_mean_weights(g, n), np.float32)
    np.testing.assert_allclose(
        float(dense[0, :, :, 0].mean()), float((wv * vals[0, :, 0, 0]).sum()),
        atol=1e-5,
    )
    assert abs(wv.sum() - 1.0) < 1e-5


def test_residual_bound_grid_covers_dense_flow():
    """Bound >= the true dense per-frame mean-removed residual."""
    rng = np.random.default_rng(1)
    path = rng.normal(scale=9.0, size=(4, 6, 8, 2)).astype(np.float32)
    h, w = 96, 128
    bound = residual_disp_bound(path, h, w, "sparse_ls")
    dense = np.asarray(grid_to_flow(jnp.asarray(path), h, w))
    true = np.abs(dense - dense.mean(axis=(1, 2), keepdims=True)).max()
    assert bound + 1e-4 >= true
    assert bound <= 4.0 * true + 1e-4  # and not wildly loose


def test_residual_bound_affine_exact_for_translation_and_rotation():
    # pure translation: residual is exactly 0 regardless of magnitude
    tr = np.tile(
        np.array([[[1, 0, 31.0], [0, 1, -17.0]]], np.float32), (5, 1, 1)
    )
    assert residual_disp_bound(tr, 64, 96, "affine") < 1e-4
    # rotation: residual max at corners; check against dense evaluation
    th = 0.04
    rot = np.array(
        [[[np.cos(th), -np.sin(th), 0.0], [np.sin(th), np.cos(th), 0.0]]],
        np.float32,
    )
    from vstab.render.render import affine_to_flow

    h, w = 64, 96
    bound = residual_disp_bound(rot, h, w, "affine")
    dense = np.asarray(affine_to_flow(jnp.asarray(rot), h, w))
    true = np.abs(dense - dense.mean(axis=(1, 2), keepdims=True)).max()
    assert bound + 1e-3 >= true
    assert bound <= 1.5 * true + 1e-3


def test_pick_max_disp_buckets():
    cfg = RenderConfig()
    assert pick_max_disp(3.0, cfg) == 16  # floor at cfg.max_residual_disp
    assert pick_max_disp(20.0, cfg) == 24
    assert pick_max_disp(30.0, cfg) == 32
    assert pick_max_disp(100.0, cfg) == 127  # contract-scale 1080p shake
    assert pick_max_disp(200.0, cfg) == 255  # 4K-scale shake
    assert pick_max_disp(300.0, cfg) == 255  # capped at the limit
    off = dataclasses.replace(cfg, adaptive_max_disp=False)
    assert pick_max_disp(200.0, off) == 16
    lim = dataclasses.replace(cfg, max_disp_limit=32)
    assert pick_max_disp(40.0, lim) == 32
    old = dataclasses.replace(cfg, max_disp_limit=63)  # round-4 ladder cap
    assert pick_max_disp(100.0, old) == 63


def _rotation_warps(t, h, w, theta):
    """Per-frame stabilizing affines: alternating +-theta rotations about the
    frame center — corner residual ~= theta * corner radius."""
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    warps = []
    for i in range(t):
        a = theta * (1 if i % 2 == 0 else -1)
        c, s = np.cos(a), np.sin(a)
        warps.append(
            [[c, -s, cx - c * cx + s * cy], [s, c, cy - s * cx - c * cy]]
        )
    return np.asarray(warps, np.float32)


def test_24px_shake_renders_interior_without_holes():
    """THE VERDICT r3 item-7 criterion: a path with ~24px corner residual
    renders with NO border-filled interior pixels under the adaptive bound,
    while the fixed d=16 bound provably punches holes (sensitivity guard)."""
    from vstab.render.render import affine_to_flow, render_stabilized

    t, h, w = 6, 128, 192
    theta = 24.0 / np.hypot((h - 1) / 2, (w - 1) / 2)  # ~24px at corners
    warps = _rotation_warps(t, h, w, theta)
    flow = affine_to_flow(jnp.asarray(warps), h, w)
    frames = jnp.full((t, h, w, 3), 0.8, jnp.float32)
    rcfg = RenderConfig(crop_mode="none", kernel_impl="xla", border_value=0.0)

    bound = residual_disp_bound(warps, h, w, "affine")
    assert 20.0 < bound < 30.0, bound  # the scenario really is ~24px
    d = pick_max_disp(bound, rcfg)
    assert d >= bound and d > 16

    out = np.asarray(render_stabilized(frames, flow, rcfg, max_disp=d))
    # margin 20: contains pixels at radius ~87px — beyond the ~76px radius
    # where d=16 starts masking (16/24 of the corner radius), yet whose
    # rotational displacement (~18px) still samples inside the frame.
    interior = out[:, 20:-20, 20:-20]
    assert interior.min() > 0.4, (
        f"border-filled interior pixels: min={interior.min():.3f} "
        "(adaptive max_disp failed to cover the shake)"
    )
    out16 = np.asarray(render_stabilized(frames, flow, rcfg, max_disp=16))
    assert out16[:, 20:-20, 20:-20].min() < 0.4, (
        "fixed d=16 renderer no longer fails on 24px shake — test stale"
    )


@pytest.mark.parametrize(
    "h,w,theta_px", [(1080, 1920, 104.0), (2160, 3840, 208.0)]
)
def test_contract_scale_shake_renders_without_holes(h, w, theta_px):
    """THE VERDICT r4 item-1 criterion: the judge-measured 1080p failure was
    a 104.2px residual bound blowing past the 63px cap and border-filling up
    to 18.5% of a frame's interior. With the 127/255 buckets the same
    rotation magnitude (and its 4K double) must render with <= 0.1%
    all-channel-black interior pixels and match the ideal warp."""
    from vstab.eval.synthetic import checker_scene
    from vstab.render.render import affine_to_flow, render_stabilized

    t = 2
    theta = theta_px / np.hypot((h - 1) / 2, (w - 1) / 2)
    warps = _rotation_warps(t, h, w, theta)
    bound = residual_disp_bound(warps, h, w, "affine")
    assert bound > 63.0, bound  # the round-4 ladder would have warned here
    rcfg = RenderConfig(crop_mode="none", kernel_impl="xla", border_value=0.0)
    d = pick_max_disp(bound, rcfg)
    assert d >= bound  # no "exceeds max_disp_limit" warning path taken

    frames = jnp.asarray(
        np.tile(checker_scene(h, w, seed=3)[None], (t, 1, 1, 1))
    )
    flow = affine_to_flow(jnp.asarray(warps), h, w)

    # Judge protocol (default fixed 0.9 crop, as in the blocked-run config):
    # all-channel-black fraction of the 60px-inset interior of the OUTPUT.
    fixed = dataclasses.replace(rcfg, crop_mode="fixed")
    outc = np.asarray(render_stabilized(frames, flow, fixed, max_disp=d))
    inset = 60
    interior = outc[:, inset:-inset, inset:-inset]
    black = np.all(interior < 1e-6, axis=-1).mean()
    assert black <= 1e-3, f"{black:.2%} interior border-filled"

    # And wherever the warp is declared valid, the uncropped render must
    # MATCH the ideal bilinear warp (the two-pass factorization error stays
    # small at contract displacement).
    from jax.scipy.ndimage import map_coordinates

    from vstab.kernels import twopass_validity

    out = np.asarray(render_stabilized(frames, flow, rcfg, max_disp=d))
    mask = np.asarray(twopass_validity((h, w), flow, d)[0]) > 0.5
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    fl = np.asarray(flow[0])
    ideal = np.stack(
        [
            np.asarray(
                map_coordinates(
                    frames[0, :, :, c], [yy + fl[..., 1], xx + fl[..., 0]],
                    order=1,
                )
            )
            for c in range(3)
        ],
        axis=-1,
    )
    # The valid region must cover all interior pixels whose ideal sample
    # stays in frame (invalidity may only come from genuinely out-of-frame
    # samples — the judge-style 18.5% hole came from the kernel CLIP, whose
    # victims sample in-frame), and the render must match the oracle there.
    sx, sy = xx + fl[..., 0], yy + fl[..., 1]
    in_frame = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    clipped_but_in_frame = in_frame & ~mask
    assert clipped_but_in_frame.mean() <= 1e-6, (
        f"{clipped_but_in_frame.mean():.2%} in-frame pixels masked by clip"
    )
    err = np.abs(out[0] - ideal)[mask]
    assert np.quantile(err, 0.999) < 0.02, float(np.quantile(err, 0.999))


def test_stabilize_adaptive_plumbing_matches_manual():
    """`stabilize` (adaptive on) must equal smooth_paths -> bound -> render
    done by hand — i.e. the adaptive path really is wired in."""
    from vstab.pipeline import (
        clip_flow,
        default_params,
        path_to_flow,
        smooth_paths,
        stabilize,
    )
    from vstab.render.render import render_stabilized

    cfg = Config(
        flow=FlowConfig(
            pyramid_channels=(8, 12, 16),
            estimator_channels=(16, 12),
            kernel_impl="xla",
            compute_dtype="float32",
            output_level=1,
        ),
        smooth=SmoothConfig(method="sparse_ls", grid_size=(4, 4)),
        render=RenderConfig(crop_mode="fixed", kernel_impl="xla"),
    )
    from vstab.eval.synthetic import make_shaky_clip

    frames, _ = make_shaky_clip(t=9, h=48, w=64, seed=11)
    frames = jnp.asarray(frames)
    params = default_params(cfg, seed=0, ckpt_dir="/nonexistent")
    out, _ = stabilize(frames, params, cfg)

    flow = clip_flow(params, frames, cfg)
    path, _ = smooth_paths(flow, cfg, (48, 64))
    d = pick_max_disp(
        residual_disp_bound(np.asarray(path), 48, 64, "sparse_ls"), cfg.render
    )
    want = render_stabilized(
        frames, path_to_flow(path, cfg, (48, 64)), cfg.render, max_disp=d
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)
