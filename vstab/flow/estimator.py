"""Per-level flow estimator head (SURVEY.md §2.1 "Flow estimator head").

DenseNet-style conv stack over [cost volume ⊕ f1 features ⊕ upsampled flow ⊕
upsampled decoder features], predicting a flow field at this level
(PAPERS.md:5, PWC-Net decoder).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _leaky(x: Array) -> Array:
    return nn.leaky_relu(x, negative_slope=0.1)


class FlowEstimator(nn.Module):
    channels: Sequence[int] = (128, 128, 96, 64, 32)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array]:
        """Returns (flow [N,H,W,2] float32, last features [N,H,W,c_last])."""
        x = x.astype(self.dtype)
        for i, ch in enumerate(self.channels):
            y = _leaky(nn.Conv(ch, (3, 3), dtype=self.dtype, name=f"conv{i}")(x))
            x = jnp.concatenate([y, x], axis=-1)  # dense connections
        flow = nn.Conv(2, (3, 3), dtype=jnp.float32, name="predict_flow")(
            x.astype(jnp.float32)
        )
        return flow, x


class UpBlock(nn.Module):
    """2x transposed-conv upsampling of flow + decoder features."""

    feat_channels: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, flow: Array, feat: Array) -> Tuple[Array, Array]:
        upflow = nn.ConvTranspose(
            2, (4, 4), strides=(2, 2), dtype=jnp.float32, name="upflow"
        )(flow)
        upfeat = nn.ConvTranspose(
            self.feat_channels, (4, 4), strides=(2, 2), dtype=self.dtype,
            name="upfeat",
        )(feat)
        return upflow, upfeat


__all__ = ["FlowEstimator", "UpBlock"]
