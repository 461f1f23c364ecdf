"""Experiment-config snapshotting (reference ``src/train/train_utils.py:4-47``)."""

from __future__ import annotations

import os
from datetime import datetime

__all__ = ["save_configs", "native_loaders"]


def native_loaders(
    train_dataset,
    test_dataset,
    batch_size: int,
    dataset_config: dict,
    train_config: dict,
    seed: int = 0,
):
    """Build FastLoader pairs over the native C++ augmentation engine for the
    standard (normalize + custom-augment) pipeline, or (None, None) when the
    native path is unavailable/disabled or the sampling mode needs per-item
    work. Used by the Pix4Point and renderer trainers (the APF trainer adds
    its dict-transform stages on top and builds its own)."""
    if not train_config.get("native_pipeline", True):
        return None, None
    if dataset_config.get("sampling_method", "all") not in ("all", "fps"):
        return None, None
    from pointvit_tpu.data import BatchAugmenter, FastLoader, native_available

    if not native_available():
        return None, None
    normalize = dataset_config.get("normalize", False)
    train_loader = FastLoader.for_dataset(
        train_dataset,
        batch_size,
        BatchAugmenter(
            normalize=normalize,
            custom=dataset_config.get("use_custom_augmentation", False),
            custom_prob=dataset_config.get("augmentation_probability", 0.2),
            seed=seed,
        ),
        shuffle=True,
        drop_last=True,
        seed=seed,
    )
    test_loader = FastLoader.for_dataset(
        test_dataset,
        batch_size,
        BatchAugmenter(normalize=normalize, seed=seed + 1),
        seed=seed + 1,
    )
    return train_loader, test_loader


def save_configs(
    model_config: dict,
    dataset_config: dict,
    train_config: dict,
    output_dir: str,
    device: str,
) -> str:
    """Write ``experiment_config_<timestamp>.txt`` with all three config dicts."""
    timestamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    config_path = os.path.join(output_dir, f"experiment_config_{timestamp}.txt")

    with open(config_path, "w") as f:
        f.write("======== EXPERIMENT CONFIGURATION ========\n\n")
        f.write("== MODEL CONFIGURATION ==\n")
        for key, value in model_config.items():
            f.write(f"{key}: {value}\n")
        f.write("\n== DATASET CONFIGURATION ==\n")
        for key, value in dataset_config.items():
            f.write(f"{key}: {value}\n")
        f.write("\n== TRAINING CONFIGURATION ==\n")
        for key, value in train_config.items():
            f.write(f"{key}: {value}\n")
        f.write("\n== ENVIRONMENT ==\n")
        f.write(f"Device: {device}\n")
        f.write(f"Output directory: {output_dir}\n")
        f.write(f"Timestamp: {timestamp}\n")

    print(f"Configuration saved to {config_path}")
    return config_path
