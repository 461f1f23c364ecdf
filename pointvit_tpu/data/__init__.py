"""Datasets, augmentations, and host→device feeding."""

from pointvit_tpu.data.augment import (
    center_and_normalize_point_cloud,
    drop_and_replace_with_noise,
    normalize_point_cloud,
    random_jitter_point_cloud,
    random_point_dropout,
    random_rotate_point_cloud,
    random_scale_point_cloud,
    random_shift_point_cloud,
    rotate_point_cloud,
    rotate_point_cloud_y,
    rotate_point_cloud_z,
    scale_point_cloud,
)
from pointvit_tpu.data.loader import DeviceDataset, FastLoader, Loader
from pointvit_tpu.data.native import BatchAugmenter, native_available
from pointvit_tpu.data.modelnet40 import ModelNet40
from pointvit_tpu.data.scanobjectnn import ScanObjectNN

__all__ = [
    "ScanObjectNN",
    "ModelNet40",
    "Loader",
    "FastLoader",
    "DeviceDataset",
    "BatchAugmenter",
    "native_available",
    "normalize_point_cloud",
    "random_point_dropout",
    "random_scale_point_cloud",
    "random_shift_point_cloud",
    "random_jitter_point_cloud",
    "rotate_point_cloud_y",
    "rotate_point_cloud_z",
    "drop_and_replace_with_noise",
    "random_rotate_point_cloud",
    "scale_point_cloud",
    "center_and_normalize_point_cloud",
    "rotate_point_cloud",
]
