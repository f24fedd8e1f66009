"""TPU kernels (Pallas + XLA fallbacks) — SURVEY.md L1."""

from vstab.kernels.cost_volume import (
    cost_volume,
    cost_volume_pallas,
    cost_volume_xla,
)
from vstab.kernels.warp import (
    bilinear_warp,
    bilinear_warp_pallas,
    bilinear_warp_xla,
    warp_validity,
)
from vstab.kernels.warp1d import (
    hwarp,
    hwarp_pallas,
    hwarp_xla,
    vwarp,
    vwarp_pallas,
    vwarp_xla,
    warp_twopass,
    twopass_validity,
)

__all__ = [
    "cost_volume",
    "cost_volume_pallas",
    "cost_volume_xla",
    "bilinear_warp",
    "bilinear_warp_pallas",
    "bilinear_warp_xla",
    "warp_validity",
    "vwarp",
    "hwarp",
    "vwarp_xla",
    "hwarp_xla",
    "vwarp_pallas",
    "hwarp_pallas",
    "warp_twopass",
    "twopass_validity",
]
