"""The three model families: APF, Pix4Point, and the multi-view renderer."""

from pointvit_tpu.models.apf import AdaptPointFormer, apf_serving_preset, apf_trainable_mask
from pointvit_tpu.models.pix4point import (
    VIT_PRESETS,
    Pix4Point,
    PointViT,
    pix4point_trainable_mask,
)
from pointvit_tpu.models.renderer import (
    TORCHVISION_VIT_PRESETS,
    PointCloudRendererClassifier,
    ViewTransformationNetwork,
    renderer_trainable_mask,
)
from pointvit_tpu.models.registry import get_timm_vit, get_vit

__all__ = [
    "AdaptPointFormer",
    "apf_serving_preset",
    "apf_trainable_mask",
    "Pix4Point",
    "PointViT",
    "pix4point_trainable_mask",
    "VIT_PRESETS",
    "PointCloudRendererClassifier",
    "ViewTransformationNetwork",
    "renderer_trainable_mask",
    "TORCHVISION_VIT_PRESETS",
    "get_vit",
    "get_timm_vit",
]
