"""vstab — TPU-native video stabilization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
posgraph/coupe.optical_flow_based_deep_video_stabilization (SURVEY.md):
PWC-Net-style coarse-to-fine optical flow (Pallas cost-volume + warp
kernels), sparse-least-squares motion smoothing with Schur-complement
reduction, full-frame stabilized rendering, DeepStab-protocol metrics, and
temporal-block scale-out over TPU meshes.
"""

__version__ = "0.1.0"

from vstab.core.config import Config, preset
from vstab.core.types import CameraPath, Clip, FlowField, VertexGrid
from vstab.pipeline import default_params, stabilize, stabilize_clip

__all__ = [
    "Config",
    "preset",
    "Clip",
    "FlowField",
    "CameraPath",
    "VertexGrid",
    "stabilize",
    "stabilize_clip",
    "default_params",
]
