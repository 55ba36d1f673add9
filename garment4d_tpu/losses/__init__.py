"""Losses & metrics (reference L5 layer, SURVEY.md 2.4)."""

from garment4d_tpu.losses.losses import (
    LossWeights,
    acceleration_error,
    canonical_stage_loss,
    cot_laplacian_loss,
    interpenetration_loss,
    posed_stage_loss,
    sem_seg_loss,
    shape_l2_loss,
    temporal_constraint_loss,
    uniform_laplacian_regularizer,
    vertex_l2_loss,
    vertex_msre,
)

__all__ = [
    "LossWeights",
    "acceleration_error",
    "canonical_stage_loss",
    "cot_laplacian_loss",
    "interpenetration_loss",
    "posed_stage_loss",
    "sem_seg_loss",
    "shape_l2_loss",
    "temporal_constraint_loss",
    "uniform_laplacian_regularizer",
    "vertex_l2_loss",
    "vertex_msre",
]
