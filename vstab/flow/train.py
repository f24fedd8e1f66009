"""Flow-network training (SURVEY.md §2.1 "Flow training loop", §7 M6).

Two loss modes:

  * supervised — multi-scale endpoint-error against ground-truth flow,
    PWC-Net's training objective (PAPERS.md:5): per-level L2 with the
    paper's level weights; GT is average-pooled + rescaled to each level.
    Synthetic warped-scene pairs (vstab.eval.synthetic) provide free labels
    since no reference checkpoint is obtainable (SURVEY.md §7 hard-part 1).

  * photometric — self-supervised for real unstable clips (no labels):
    Charbonnier photometric loss on im1 vs warp(im2, flow) + edge-aware
    first-order smoothness. Enables training directly on DeepStab inputs.

Data parallelism is sharding-native: `make_train_step` jits the step with
params/opt-state replicated and the batch sharded over the mesh — XLA
inserts the gradient psum over ICI (SURVEY.md §2.2 DP row). No pmap, no
NCCL analogue.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vstab.core.config import FlowConfig
from vstab.flow.pwcnet import PWCNet
from vstab.kernels import bilinear_warp

Array = jax.Array

# PWC-Net per-level loss weights, coarsest -> finest (PAPERS.md:5 recipe).
LEVEL_WEIGHTS = (0.32, 0.08, 0.02, 0.01, 0.005)


def _pool_flow_to(flow: Array, hw: Tuple[int, int]) -> Array:
    """Average-pool GT flow [N,H,W,2] to (h,w), rescaling the values by the
    resolution change (flow is in pixels of its own grid)."""
    n, h0, w0, _ = flow.shape
    h, w = hw
    pooled = jax.image.resize(flow, (n, h, w, 2), method="linear")
    scale = jnp.asarray([w / w0, h / h0], flow.dtype)
    return pooled * scale


def multiscale_epe(
    flow_pyramid: Tuple[Array, ...], gt_flow: Array
) -> Tuple[Array, Dict[str, Array]]:
    """Multi-scale L2 loss over the pyramid (coarsest first) + final EPE."""
    losses = []
    nlev = len(flow_pyramid)
    weights = LEVEL_WEIGHTS[-nlev:] if nlev <= len(LEVEL_WEIGHTS) else (
        (0.32,) * (nlev - len(LEVEL_WEIGHTS)) + LEVEL_WEIGHTS
    )
    for wgt, fl in zip(weights, flow_pyramid):
        gt_l = _pool_flow_to(gt_flow, (fl.shape[1], fl.shape[2]))
        err = jnp.sum((fl.astype(jnp.float32) - gt_l) ** 2, axis=-1)
        losses.append(wgt * jnp.mean(jnp.sqrt(err + 1e-8)))
    total = sum(losses)
    fin = flow_pyramid[-1].astype(jnp.float32)
    gt_f = _pool_flow_to(gt_flow, (fin.shape[1], fin.shape[2]))
    epe = jnp.mean(jnp.sqrt(jnp.sum((fin - gt_f) ** 2, -1) + 1e-8))
    return total, {"epe_finest": epe}


def _charbonnier(x: Array, eps: float = 1e-3) -> Array:
    return jnp.sqrt(x * x + eps * eps)


def photometric_loss(
    im1: Array, im2: Array, flow_pyramid: Tuple[Array, ...], cfg: FlowConfig,
    smooth_weight: float = 0.05,
) -> Tuple[Array, Dict[str, Array]]:
    """Self-supervised: Charbonnier photometric + edge-aware smoothness,
    applied at the finest level (downsampled images)."""
    fl = flow_pyramid[-1].astype(jnp.float32)
    n, h, w, _ = fl.shape
    im1_l = jax.image.resize(im1, (n, h, w, im1.shape[-1]), "linear")
    im2_l = jax.image.resize(im2, (n, h, w, im2.shape[-1]), "linear")
    warped = bilinear_warp(im2_l, fl, impl="xla")
    photo = jnp.mean(_charbonnier(im1_l - warped))

    dfx = fl[:, :, 1:] - fl[:, :, :-1]
    dfy = fl[:, 1:] - fl[:, :-1]
    dix = jnp.mean(jnp.abs(im1_l[:, :, 1:] - im1_l[:, :, :-1]), -1, keepdims=True)
    diy = jnp.mean(jnp.abs(im1_l[:, 1:] - im1_l[:, :-1]), -1, keepdims=True)
    sm = jnp.mean(jnp.abs(dfx) * jnp.exp(-10.0 * dix)) + jnp.mean(
        jnp.abs(dfy) * jnp.exp(-10.0 * diy)
    )
    return photo + smooth_weight * sm, {"photo": photo, "smooth": sm}


def make_optimizer(
    lr: float = 1e-4, weight_decay: float = 4e-4, clip: float = 1.0
) -> optax.GradientTransformation:
    """AdamW + clip; PWC-Net's "S-long" style schedule is applied by the
    caller via optax.piecewise_constant_schedule if desired."""
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(lr, weight_decay=weight_decay),
    )


def make_train_step(
    cfg: FlowConfig,
    tx: optax.GradientTransformation,
    mode: str = "supervised",
) -> Callable:
    """Returns train_step(params, opt_state, batch) -> (params, opt_state, metrics).

    batch: dict with 'im1','im2' [N,H,W,3] (+ 'flow' [N,H,W,2] if supervised).
    Shard the batch leading axis over the mesh for DP; params replicated.
    """
    net = PWCNet(cfg)

    def loss_fn(params, batch):
        out = net.apply(params, batch["im1"], batch["im2"])
        pyr = out["flow_pyramid"]
        if mode == "supervised":
            # GT at input res; finest estimated level is H/2**output_level.
            gt = batch["flow"]
            loss, aux = multiscale_epe(pyr, gt)
        else:
            loss, aux = photometric_loss(batch["im1"], batch["im2"], pyr, cfg)
        return loss, aux

    @jax.jit
    def train_step(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm, **aux}

    return train_step


def synthetic_batch(
    rng: jax.Array, n: int, h: int, w: int, max_disp: float = 8.0
) -> Dict[str, Array]:
    """Labeled training pairs from random smooth warps of procedural scenes.

    im2 = backward-warp(im1, flow_gt) with flow_gt a random low-frequency
    field — by construction im1(p) content appears in im2 displaced by
    -flow, and estimate_flow(im1, im2) should recover flow_gt.
    """
    from vstab.eval.synthetic import checker_scene

    k1, k2, k3 = jax.random.split(rng, 3)
    scenes = []
    for i in range(n):
        scenes.append(checker_scene(h, w, seed=int(jax.random.randint(
            jax.random.fold_in(k1, i), (), 0, 2**31 - 1))))
    im1 = jnp.stack(scenes)
    # Low-frequency random flow: coarse grid upsampled.
    coarse = max_disp * jax.random.uniform(k2, (n, 4, 5, 2), minval=-1.0, maxval=1.0)
    flow = jax.image.resize(coarse, (n, h, w, 2), "bicubic")
    im2 = bilinear_warp(im1, flow, impl="xla")
    return {"im1": im1, "im2": im2, "flow": flow}


def make_scene_pool(
    n_scenes: int, h: int, w: int, seed: int = 0,
    kinds: Tuple[str, ...] = ("checker", "shapes"),
) -> Array:
    """[S,h,w,3] pool of procedural scenes, generated host-side once.

    `kinds` round-robins over scene families (eval/synthetic.SCENE_FNS).
    The default training mix is checker (dense texture) + shapes (flat
    regions, occlusion-like edges); 'perlin' is deliberately excluded so it
    can serve as the cross-distribution holdout family that the trainer
    never saw (VERDICT r3 missing-6)."""
    from vstab.eval.synthetic import make_scene

    return jnp.stack(
        [
            make_scene(kinds[i % len(kinds)], h, w, seed=seed * 1000 + i)
            for i in range(n_scenes)
        ]
    )


def _add_occluders(
    rng: jax.Array,
    im1: Array,
    im2: Array,
    flow: Array,
    scenes: Array,
    max_disp: float,
    n_occ: int = 3,
) -> Tuple[Array, Array, Array]:
    """Dynamic-scene augmentation (VERDICT r4 item 3): paste up to `n_occ`
    independently TRANSLATING textured ellipses over a warped pair, with
    exact GT flow.

    Construction keeps the labels exact under the batch convention
    im2(p) = im1(p + flow(p)): occluder k occupies the ellipse E1 (center
    c) in im1 showing texture tex, and the shifted ellipse E2 (center
    c - d) in im2 showing the same texture shifted by d — so for p in E2,
    im2(p) = tex(p + d) = im1(p + d) exactly, giving GT flow d there.
    Disoccluded background pixels (bg visible in im2 whose im1 source was
    covered) keep the background label — geometrically right, photometric
    supervision unknowable; a few percent of pixels, standard for layered
    synthetic flow data. Occluders are drawn in a fixed order in BOTH
    frames, so overlaps stay consistent."""
    n, h, w, _ = im1.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    s = scenes.shape[0]
    for j in range(n_occ):
        kj = jax.random.fold_in(rng, j)
        ktex, kgeo, kmove, kon = jax.random.split(kj, 4)
        tex = scenes[jax.random.randint(ktex, (n,), 0, s)]
        cy = jax.random.uniform(kgeo, (n,), minval=0.15 * h, maxval=0.85 * h)
        cx = jax.random.uniform(
            jax.random.fold_in(kgeo, 1), (n,), minval=0.15 * w, maxval=0.85 * w
        )
        ry = jax.random.uniform(
            jax.random.fold_in(kgeo, 2), (n,), minval=h / 7.0, maxval=h / 3.5
        )
        rx = jax.random.uniform(
            jax.random.fold_in(kgeo, 3), (n,), minval=w / 7.0, maxval=w / 3.5
        )
        # independent motion, most of the global translation range; kept
        # below the occluder radius so the disocclusion band (wrong-label
        # pixels) stays a small fraction of each occluder
        d = 0.75 * max_disp * jax.random.uniform(
            kmove, (n, 2), minval=-1.0, maxval=1.0
        )
        # each occluder active on ~60% of samples
        on = (jax.random.uniform(kon, (n,)) < 0.6).astype(jnp.float32)

        def ell(cy_, cx_):
            dy = (yy[None] - cy_[:, None, None]) / ry[:, None, None]
            dx = (xx[None] - cx_[:, None, None]) / rx[:, None, None]
            return (dy * dy + dx * dx < 1.0).astype(jnp.float32) * on[
                :, None, None
            ]

        m1 = ell(cy, cx)[..., None]
        m2 = ell(cy - d[:, 1], cx - d[:, 0])[..., None]
        im1 = im1 * (1.0 - m1) + tex * m1
        tex_shift = bilinear_warp(
            tex, jnp.broadcast_to(d[:, None, None, :], (n, h, w, 2)),
            impl="xla",
        )
        im2 = im2 * (1.0 - m2) + tex_shift * m2
        flow = flow * (1.0 - m2) + jnp.broadcast_to(
            d[:, None, None, :], (n, h, w, 2)
        ) * m2
    return im1, im2, flow


def _sample_batch(
    rng: jax.Array, scenes: Array, n: int, max_disp: float, blur: bool = True,
    occluders: bool = True,
) -> Dict[str, Array]:
    """On-device labeled batch: scene pick + (global affine ∘ low-freq) flow
    + independently moving occluders.

    Stabilization flow is dominated by global camera motion, so the GT flow
    mixes a global similarity (translation ±max_disp, rotation ±0.02 rad,
    scale ±2%) with a low-frequency residual field — unlike the pure
    low-freq fields of `synthetic_batch`, this covers the inference regime
    (shake ≈ global affine per pair). `occluders` adds dynamic foreground
    layers with exact labels (_add_occluders; VERDICT r4 item 3).
    """
    s, h, w, _ = scenes.shape
    kidx, kaff, kgrid, kbr, kbl, kocc = jax.random.split(rng, 6)
    idx = jax.random.randint(kidx, (n,), 0, s)
    im1 = scenes[idx]

    # Random smoothness augmentation (TRAIN only — eval gates run on clean
    # scenes): per-sample blend across progressively blurred copies, up to
    # sigma~3px. Low-texture smooth regions are the flow net's hard case
    # (aperture problem); the round-3 checkpoint, trained on crisp checker
    # scenes only, degraded 0.3px -> 7-10px EPE on smooth families (VERDICT
    # r3 missing-6). Blurring the SCENE before warping leaves the GT flow
    # exact.
    if blur:

        def _blur3(x):
            x = 0.25 * jnp.roll(x, 1, 1) + 0.5 * x + 0.25 * jnp.roll(x, -1, 1)
            return 0.25 * jnp.roll(x, 1, 2) + 0.5 * x + 0.25 * jnp.roll(x, -1, 2)

        levels = [im1]
        for _ in range(3):
            levels.append(_blur3(_blur3(levels[-1])))
        sel = jax.random.randint(kbl, (n,), 0, 8)  # P(clean)=5/8, else blur
        sel = jnp.maximum(sel - 4, 0)
        stacked = jnp.stack(levels, axis=0)  # [4,n,h,w,3]
        im1 = jnp.einsum(
            "knhwc,nk->nhwc", stacked, jax.nn.one_hot(sel, 4, dtype=im1.dtype)
        )

    ang = 0.02 * jax.random.uniform(kaff, (n,), minval=-1.0, maxval=1.0)
    sc = 1.0 + 0.02 * jax.random.uniform(
        jax.random.fold_in(kaff, 1), (n,), minval=-1.0, maxval=1.0
    )
    txy = max_disp * jax.random.uniform(
        jax.random.fold_in(kaff, 2), (n, 2), minval=-1.0, maxval=1.0
    )
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - (h - 1) / 2.0
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - (w - 1) / 2.0
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    # displacement of the affine map (sc·R − I)·p + t at each pixel
    dx = (sc * ca - 1.0)[:, None, None] * xx - (sc * sa)[:, None, None] * yy
    dy = (sc * sa)[:, None, None] * xx + (sc * ca - 1.0)[:, None, None] * yy
    aff = jnp.stack(
        [dx + txy[:, 0, None, None], dy + txy[:, 1, None, None]], axis=-1
    )

    coarse = 0.4 * max_disp * jax.random.uniform(
        kgrid, (n, 4, 5, 2), minval=-1.0, maxval=1.0
    )
    flow = aff + jax.image.resize(coarse, (n, h, w, 2), "bicubic")
    im2 = bilinear_warp(im1, flow, impl="xla")
    if occluders:
        im1, im2, flow = _add_occluders(kocc, im1, im2, flow, scenes, max_disp)
    # photometric jitter on im1 only (robustness to brightness change)
    gain = 1.0 + 0.08 * jax.random.uniform(kbr, (n, 1, 1, 1), minval=-1.0, maxval=1.0)
    off = 0.04 * jax.random.uniform(
        jax.random.fold_in(kbr, 1), (n, 1, 1, 1), minval=-1.0, maxval=1.0
    )
    return {"im1": jnp.clip(im1 * gain + off, 0.0, 1.0), "im2": im2, "flow": flow}


def train_fast(
    cfg: FlowConfig,
    steps: int = 4000,
    batch_size: int = 8,
    hw: Tuple[int, int] = (192, 256),
    lr: float = 2e-4,
    seed: int = 0,
    params=None,
    scan_len: int = 100,
    n_scenes: int = 64,
    max_disp: float = 12.0,
    ckpt_dir: Optional[str] = "ckpts",
    mode: str = "supervised",
    kinds: Tuple[str, ...] = ("checker", "shapes"),
) -> Any:
    """Scan-based trainer: data generation AND `scan_len` optimizer steps run
    inside one jitted dispatch — essential on a remote-tunneled TPU where
    per-step dispatch latency would dominate (~0.1 s/round-trip)."""
    from vstab.flow.pwcnet import init_params
    from vstab.utils.checkpoint import save_params

    h, w = hw
    rng = jax.random.PRNGKey(seed)
    if params is None:
        rng, sub = jax.random.split(rng)
        params = init_params(sub, cfg)
    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.02)
    tx = make_optimizer(sched)
    opt_state = tx.init(params)
    net = PWCNet(cfg)
    scenes = make_scene_pool(n_scenes, h, w, seed=seed, kinds=kinds)

    def loss_fn(params, batch):
        out = net.apply(params, batch["im1"], batch["im2"])
        if mode == "supervised":
            return multiscale_epe(out["flow_pyramid"], batch["flow"])
        return photometric_loss(batch["im1"], batch["im2"], out["flow_pyramid"], cfg)

    # `scenes` is an ARGUMENT, not a closure capture: a closed-over pool
    # becomes a jaxpr constant shipped with the compile payload — a
    # 128-scene 384x512 pool is ~300MB and overflows the remote-compile
    # request (HTTP 413 through the axon tunnel).
    @jax.jit
    def run_chunk(params, opt_state, rng, scenes):
        def body(carry, _):
            params, opt_state, rng = carry
            rng, sub = jax.random.split(rng)
            batch = _sample_batch(sub, scenes, batch_size, max_disp)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), {"loss": loss, **aux}

        (params, opt_state, rng), ms = jax.lax.scan(
            body, (params, opt_state, rng), None, length=scan_len
        )
        return params, opt_state, rng, jax.tree_util.tree_map(jnp.mean, ms)

    n_chunks = -(-steps // scan_len)
    for ci in range(n_chunks):
        params, opt_state, rng, ms = run_chunk(params, opt_state, rng, scenes)
        m = {k: round(float(v), 4) for k, v in ms.items()}
        print(f"step {min((ci + 1) * scan_len, steps)}/{steps}: {m}", flush=True)

    if ckpt_dir is not None:
        import os

        os.makedirs(ckpt_dir, exist_ok=True)
        save_params(os.path.join(ckpt_dir, f"flow_{steps:06d}.msgpack"), params)
    return params


def eval_epe(
    params, cfg: FlowConfig, hw: Tuple[int, int] = (192, 256),
    n: int = 16, seed: int = 999, max_disp: float = 12.0,
    kinds: Tuple[str, ...] = ("checker", "shapes"),
    occluders: bool = False,
) -> float:
    """Held-out synthetic EPE at full input resolution (the M6 gate metric).

    kinds=('perlin',) gives the cross-distribution gate: a scene family the
    trainer never saw (different seeds alone are a near-train eval —
    VERDICT r3 weak-5). occluders=True measures the dynamic-scene regime
    (independently moving foreground; VERDICT r4 item 3) — off by default
    so the static-scene gates keep their historical meaning."""
    from vstab.flow.pwcnet import estimate_flow

    scenes = make_scene_pool(8, hw[0], hw[1], seed=seed, kinds=kinds)
    rng = jax.random.PRNGKey(seed)
    epes = []
    for i in range(-(-n // 8)):
        batch = jax.jit(
            lambda r: _sample_batch(
                r, scenes, 8, max_disp, blur=False, occluders=occluders
            )
        )(jax.random.fold_in(rng, i))
        fl = estimate_flow(params, batch["im1"], batch["im2"], cfg)
        err = jnp.sqrt(jnp.sum((fl - batch["flow"]) ** 2, -1) + 1e-12)
        epes.append(float(jnp.mean(err)))
    return sum(epes) / len(epes)


def train(
    cfg: FlowConfig,
    steps: int = 1000,
    batch_size: int = 4,
    hw: Tuple[int, int] = (192, 256),
    lr: float = 1e-4,
    seed: int = 0,
    params=None,
    log_every: int = 50,
    ckpt_dir: Optional[str] = "ckpts",
    mode: str = "supervised",
) -> Any:
    """Single-host training driver on synthetic labeled pairs."""
    import logging

    from vstab.flow.pwcnet import init_params
    from vstab.utils.checkpoint import save_params

    log = logging.getLogger("vstab.train")
    rng = jax.random.PRNGKey(seed)
    if params is None:
        params = init_params(rng, cfg)
    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.05)
    tx = make_optimizer(sched)
    opt_state = tx.init(params)
    step_fn = make_train_step(cfg, tx, mode=mode)
    h, w = hw
    for step in range(steps):
        rng, sub = jax.random.split(rng)
        batch = synthetic_batch(sub, batch_size, h, w)
        params, opt_state, metrics = step_fn(params, opt_state, batch)
        if step % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            log.info("step %d: %s", step, m)
            print(f"step {step}: {m}", flush=True)
    if ckpt_dir is not None:
        import os

        save_params(os.path.join(ckpt_dir, f"flow_{steps:06d}.msgpack"), params)
    return params


def _main() -> int:
    """python -m vstab.flow.train --steps 4000 [--hw 192 256] ..."""
    import argparse
    import logging

    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs=2, default=(192, 256))
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scan-len", type=int, default=100)
    ap.add_argument("--max-disp", type=float, default=12.0)
    ap.add_argument(
        "--n-scenes", type=int, default=256,
        help="procedural scene pool size (too small -> the net memorizes it)",
    )
    ap.add_argument("--ckpt-dir", default="ckpts")
    ap.add_argument("--resume", default=None, help="msgpack to warm-start from")
    ap.add_argument("--compute-dtype", default="float32")
    ap.add_argument(
        "--scenes", default="checker,shapes",
        help="comma-separated training scene families (eval/synthetic)",
    )
    args = ap.parse_args()

    from vstab.core.config import FlowConfig
    from vstab.utils.checkpoint import load_params

    kinds = tuple(args.scenes.split(","))
    cfg = FlowConfig(compute_dtype=args.compute_dtype, kernel_impl="auto")
    params = load_params(args.resume) if args.resume else None
    params = train_fast(
        cfg, steps=args.steps, batch_size=args.batch, hw=tuple(args.hw),
        lr=args.lr, seed=args.seed, params=params, scan_len=args.scan_len,
        max_disp=args.max_disp, ckpt_dir=args.ckpt_dir, kinds=kinds,
        n_scenes=args.n_scenes,
    )
    for gate_kinds, label in ((kinds, "in-dist"), (("perlin",), "cross-dist")):
        epe = eval_epe(
            params, cfg, hw=tuple(args.hw), max_disp=args.max_disp,
            kinds=gate_kinds,
        )
        print(f"held-out EPE [{label}] @ {tuple(args.hw)}: {epe:.3f} px", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(_main())


__all__ = [
    "multiscale_epe",
    "photometric_loss",
    "make_optimizer",
    "make_train_step",
    "synthetic_batch",
    "make_scene_pool",
    "train_fast",
    "eval_epe",
    "train",
]
