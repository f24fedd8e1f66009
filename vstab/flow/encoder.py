"""Feature pyramid encoder (SURVEY.md §2.1 "Feature pyramid encoder").

PWC-Net-style siamese pyramid: L strided conv stages, each halving
resolution (PAPERS.md:5). NHWC layout, bfloat16 compute by default so the
3x3 convs tile onto the MXU; params stay float32.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _leaky(x: Array) -> Array:
    return nn.leaky_relu(x, negative_slope=0.1)


class FeaturePyramid(nn.Module):
    """Returns features per level, index 0 = finest (1/2 res) ... L-1 = 1/2^L."""

    channels: Sequence[int] = (16, 32, 64, 96, 128, 196)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, ...]:
        x = x.astype(self.dtype)
        feats = []
        for lvl, ch in enumerate(self.channels):
            x = _leaky(
                nn.Conv(ch, (3, 3), strides=(2, 2), dtype=self.dtype,
                        name=f"conv{lvl}a")(x)
            )
            x = _leaky(
                nn.Conv(ch, (3, 3), dtype=self.dtype, name=f"conv{lvl}b")(x)
            )
            x = _leaky(
                nn.Conv(ch, (3, 3), dtype=self.dtype, name=f"conv{lvl}c")(x)
            )
            feats.append(x)
        return tuple(feats)


__all__ = ["FeaturePyramid"]
