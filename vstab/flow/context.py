"""Context / refinement network (SURVEY.md §2.1 "Context/refinement network").

Dilated-conv refinement of the finest-level flow (PWC-Net context network,
PAPERS.md:5): consumes the estimator's last features + flow, emits a flow
residual.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _leaky(x: Array) -> Array:
    return nn.leaky_relu(x, negative_slope=0.1)


class ContextNet(nn.Module):
    dilations: Sequence[int] = (1, 2, 4, 8, 16, 1)
    channels: Sequence[int] = (128, 128, 128, 96, 64, 32)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feat: Array, flow: Array) -> Array:
        x = jnp.concatenate(
            [feat.astype(self.dtype), flow.astype(self.dtype)], axis=-1
        )
        for i, (ch, dil) in enumerate(zip(self.channels, self.dilations)):
            x = _leaky(
                nn.Conv(
                    ch, (3, 3), kernel_dilation=(dil, dil), dtype=self.dtype,
                    name=f"dconv{i}",
                )(x)
            )
        res = nn.Conv(2, (3, 3), dtype=jnp.float32, name="predict_res")(
            x.astype(jnp.float32)
        )
        return flow + res


__all__ = ["ContextNet"]
