"""Model layer (reference L4, SURVEY.md 2.2)."""

from garment4d_tpu.models.assets import CLASS_NUM, LABEL_DICT, GarmentAssets, quads_to_tris
from garment4d_tpu.models.backbone import BackboneOutput, PointNet2SegBackbone
from garment4d_tpu.models.canonical import (
    CanonicalGarmentModel,
    CanonicalOutput,
    select_garment_points,
)
from garment4d_tpu.models.mgn import MgnGarmentModel
from garment4d_tpu.models.posed import BodyInputs, PosedGarmentModel, PosedOutput
from garment4d_tpu.models.skinning import (
    LbsResult,
    lbs_garment_interpolation,
    lbs_garment_single_nn,
)

__all__ = [
    "CLASS_NUM",
    "LABEL_DICT",
    "GarmentAssets",
    "quads_to_tris",
    "BackboneOutput",
    "PointNet2SegBackbone",
    "CanonicalGarmentModel",
    "CanonicalOutput",
    "select_garment_points",
    "BodyInputs",
    "MgnGarmentModel",
    "PosedGarmentModel",
    "PosedOutput",
    "LbsResult",
    "lbs_garment_interpolation",
    "lbs_garment_single_nn",
]
