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


__all__ = [
    "multiscale_epe",
    "photometric_loss",
    "make_optimizer",
    "make_train_step",
    "synthetic_batch",
    "train",
]
