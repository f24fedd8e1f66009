"""Core types and config — SURVEY.md L0."""

from vstab.core.config import Config, DistConfig, FlowConfig, IOConfig, RenderConfig, SmoothConfig, preset
from vstab.core.types import (
    CameraPath,
    Clip,
    FlowField,
    VertexGrid,
    apply_affine,
    compose_affine,
    identity_affine,
    invert_affine,
)

__all__ = [
    "Config",
    "FlowConfig",
    "SmoothConfig",
    "RenderConfig",
    "DistConfig",
    "IOConfig",
    "preset",
    "Clip",
    "FlowField",
    "CameraPath",
    "VertexGrid",
    "identity_affine",
    "compose_affine",
    "invert_affine",
    "apply_affine",
]
