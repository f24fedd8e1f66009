"""Core pytree types for the TPU-native video-stabilization framework.

Design note (SURVEY.md L0): the reference (posgraph/coupe.optical_flow_based_
deep_video_stabilization — mount empty at v0, see SURVEY.md §0) passes bare
numpy/TF arrays between stages. Here every stage contract is an explicitly
typed, registered pytree so the whole pipeline composes under jit / shard_map
and shards cleanly over a `jax.sharding.Mesh`.

Conventions
-----------
- Image layout is NHWC / THWC (time-major clips), channels last: the lane
  dimension on TPU; keeps convs and Pallas kernels tiled on (8,128).
- `Clip.frames` is float32/bfloat16 in [0, 1] on device; uint8 only at the
  host I/O boundary (vstab.io.video).
- Flow is stored as (u, v) = (dx, dy) displacement in *pixels of its own
  resolution*, channel-last: flow[..., 0] = horizontal, flow[..., 1] = vertical.
- Affine transforms are 2x3 row-major matrices mapping source -> target pixel
  coordinates: [x', y']^T = A[:, :2] @ [x, y]^T + A[:, 2].
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

Array = jax.Array


def _pytree_dataclass(cls):
    """Register a dataclass as a JAX pytree (all fields are children)."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, n) for n in fields), None

    def unflatten(_, children):
        return cls(*children)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytree_dataclass
class Clip:
    """A video clip: frames [T, H, W, C] plus fps metadata.

    fps is carried as a float array so the pytree stays jit-transparent.
    """

    frames: Array  # [T, H, W, C], float in [0, 1]
    fps: Array  # scalar float

    @property
    def num_frames(self) -> int:
        return self.frames.shape[0]

    @property
    def height(self) -> int:
        return self.frames.shape[1]

    @property
    def width(self) -> int:
        return self.frames.shape[2]

    @staticmethod
    def from_array(frames: Array, fps: float = 30.0) -> "Clip":
        return Clip(frames=frames, fps=jnp.asarray(fps, jnp.float32))


@_pytree_dataclass
class FlowField:
    """Dense optical flow between consecutive frame pairs.

    flow[t] maps frame t -> frame t+1: pixel p in frame t corresponds to
    p + flow[t, p] in frame t+1. Shape [T-1, H, W, 2] (or [N, H, W, 2] for a
    batch of independent pairs), channels (u=dx, v=dy).
    """

    flow: Array  # [N, H, W, 2]

    @property
    def u(self) -> Array:
        return self.flow[..., 0]

    @property
    def v(self) -> Array:
        return self.flow[..., 1]


@_pytree_dataclass
class CameraPath:
    """Per-frame global camera motion as a chain of 2x3 affine transforms.

    transforms[t] maps frame-0 coordinates to frame-t coordinates (the
    accumulated camera trajectory, "C_t" in bundled-camera-paths notation).
    Shape [T, 2, 3].
    """

    transforms: Array  # [T, 2, 3]

    @property
    def num_frames(self) -> int:
        return self.transforms.shape[0]


@_pytree_dataclass
class VertexGrid:
    """Per-frame mesh-vertex positions for grid (dense motion-field) smoothing.

    positions[t, i, j] = (x, y) position of vertex (i, j) at time t, in pixels.
    This is the unknown of the sparse-LS smoothing problem (SURVEY.md §2.1,
    "Sparse-LS motion smoothing"). Shape [T, GH, GW, 2].
    """

    positions: Array  # [T, GH, GW, 2]


def identity_affine(dtype=jnp.float32) -> Array:
    """The 2x3 identity transform."""
    return jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], dtype=dtype)


def compose_affine(a: Array, b: Array) -> Array:
    """Compose 2x3 affines: result applies b first, then a (a ∘ b).

    Supports leading batch dims on either argument (broadcasting).
    """
    lin = jnp.einsum("...ij,...jk->...ik", a[..., :2], b[..., :2])
    trans = (
        jnp.einsum("...ij,...j->...i", a[..., :2], b[..., 2]) + a[..., 2]
    )
    return jnp.concatenate([lin, trans[..., None]], axis=-1)


def invert_affine(a: Array) -> Array:
    """Invert a (batch of) 2x3 affine transform(s)."""
    lin = a[..., :2]
    det = lin[..., 0, 0] * lin[..., 1, 1] - lin[..., 0, 1] * lin[..., 1, 0]
    inv_det = 1.0 / det
    inv_lin = (
        jnp.stack(
            [
                jnp.stack([lin[..., 1, 1], -lin[..., 0, 1]], axis=-1),
                jnp.stack([-lin[..., 1, 0], lin[..., 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        * inv_det[..., None, None]
    )
    inv_trans = -jnp.einsum("...ij,...j->...i", inv_lin, a[..., 2])
    return jnp.concatenate([inv_lin, inv_trans[..., None]], axis=-1)


def apply_affine(a: Array, xy: Array) -> Array:
    """Apply 2x3 affine(s) to points xy [..., 2] -> [..., 2]."""
    return jnp.einsum("...ij,...j->...i", a[..., :2], xy) + a[..., 2]


__all__ = [
    "Array",
    "Clip",
    "FlowField",
    "CameraPath",
    "VertexGrid",
    "identity_affine",
    "compose_affine",
    "invert_affine",
    "apply_affine",
]
