"""APF trainer — config-dict API parity with ``src/train/apf_trainer.py``.

Accepts the reference's exact ``model_config`` / ``dataset_config`` /
``train_config`` keys (train_apf.py:3-42) and drives the generic
:class:`~pointvit_tpu.train.trainer.Trainer`: AdamW + timm-style cosine
schedule with warmup, CE with label smoothing 0.3, dict-transform data
pipelines (scale → centre/normalize+heights → rotate for train;
centre/normalize for test), CSV metrics with a learning-rate column, and
best/interval checkpoints.

Note: the reference entry script passes ``dropout_path_rate`` while its
trainer reads ``drop_path_rate`` — silently dropping the setting
(apf_trainer.py:79 vs train_apf.py:12). Here both spellings are honoured
(``drop_path_rate`` wins if both are present).
"""

from __future__ import annotations

import jax.numpy as jnp

from pointvit_tpu.data.augment import (
    center_and_normalize_point_cloud,
    rotate_point_cloud,
    scale_point_cloud,
)
from pointvit_tpu.data.scanobjectnn import ScanObjectNN
from pointvit_tpu.models.apf import apf_trainable_mask
from pointvit_tpu.models.factory import build_model
from pointvit_tpu.train.schedules import timm_cosine_schedule
from pointvit_tpu.train.trainer import Trainer, build_optimizer

__all__ = ["APFTrainer"]


class _TransformedDataset:
    """Apply the APF dict-transform pipeline (+ optional heights channel) on
    top of a raw (points, label) dataset — the ModelNet40 adapter for the
    APF data path (ScanObjectNN applies transforms internally)."""

    def __init__(self, base, transforms, use_height: bool = False):
        self.base = base
        self.transforms = transforms
        self.use_height = use_height
        # surface the attrs FastLoader/Trainer rely on; pre-apply the
        # first-num_points protocol so vectorized slicing matches __getitem__
        self.data = base.data[:, : base.num_points]
        self.labels = base.labels
        self.num_classes = base.num_classes
        self.sampling_method = "all"

    def __len__(self):
        return len(self.base)

    def __getitem__(self, idx):
        import numpy as np

        points, label = self.base[idx]
        heights = None
        if self.transforms:
            data = {"xyz": points, "label": label}
            for fn in self.transforms:
                data = fn(data)
            points = data["xyz"]
            label = data["label"]
            heights = data.get("heights")
        if self.use_height and heights is not None:
            points = np.concatenate(
                [points.astype(np.float32), heights.astype(np.float32)], axis=1
            )
        return points.astype(np.float32), label


class APFTrainer(Trainer):
    """Trainer for AdaptPointFormer on ScanObjectNN."""

    def __init__(
        self,
        model_config: dict,
        dataset_config: dict,
        train_config: dict,
        device: str = "tpu",
        output_dir: str = "./output",
        seed: int = 0,
    ) -> None:
        self._device_hint = device  # informational; JAX selects the backend

        model = build_model(model_config, family="apf")

        train_transforms = [
            scale_point_cloud,
            center_and_normalize_point_cloud,
            rotate_point_cloud,
        ]
        test_transforms = [center_and_normalize_point_cloud]

        if dataset_config.get("dataset", "scanobjectnn") == "modelnet40":
            # North-star benchmark dataset (BASELINE.md) — the reference has
            # no ModelNet40 loader; config keys follow the same shape.
            from pointvit_tpu.data.modelnet40 import ModelNet40

            train_dataset = _TransformedDataset(
                ModelNet40(
                    dataset_config["root_dir"],
                    split="training",
                    num_points=dataset_config["train_num_points"],
                    normalize=dataset_config.get("normalize", False),
                    use_custom_augmentation=dataset_config.get(
                        "use_custom_augmentation", False
                    ),
                    augmentation_probability=dataset_config.get(
                        "augmentation_probability", 0.5
                    ),
                    seed=seed,
                ),
                train_transforms,
                use_height=dataset_config.get("use_height", False),
            )
            test_dataset = _TransformedDataset(
                ModelNet40(
                    dataset_config["root_dir"],
                    split="test",
                    num_points=dataset_config["test_num_points"],
                    normalize=dataset_config.get("normalize", False),
                    seed=seed + 1,
                ),
                test_transforms,
                use_height=dataset_config.get("use_height", False),
            )
        else:
            common = dict(
                root_dir=dataset_config["root_dir"],
                variant=dataset_config["variant"],
                augmentation=dataset_config["augmentation"],
                background=dataset_config.get("background", False),
                use_newsplit=dataset_config.get("use_newsplit", False),
                normalize=dataset_config.get("normalize", False),
                sampling_method=dataset_config.get("sampling_method", "fps"),
                use_height=dataset_config.get("use_height", False),
                use_custom_augmentation=dataset_config.get("use_custom_augmentation", False),
                augmentation_probability=dataset_config.get("augmentation_probability", 0.0),
            )
            train_dataset = ScanObjectNN(
                split="training",
                num_points=dataset_config["train_num_points"],
                transform=train_transforms,
                seed=seed,
                **common,
            )
            test_dataset = ScanObjectNN(
                split="test",
                num_points=dataset_config["test_num_points"],
                transform=test_transforms,
                seed=seed + 1,
                **common,
            )

        epochs = train_config["epochs"]
        batch_size = train_config["batch_size"]
        steps_per_epoch = max(len(train_dataset) // batch_size, 1)
        schedule = timm_cosine_schedule(
            train_config["learning_rate"],
            epochs,
            steps_per_epoch,
            warmup_epochs=train_config.get("warmup_epochs", 10),
            warmup_lr_init=train_config.get("warmup_lr_init", 1e-3),
        )

        # Freeze the ViT trunk; train adapters/head/norm/point-encoder (or
        # reproduce the reference's exact frozen set with reference_quirks).
        quirks = model_config.get("reference_quirks", False)
        example = jnp.zeros((1,) + tuple(train_dataset[0][0].shape))
        import jax

        params_shape = jax.eval_shape(
            lambda: model.init({"params": jax.random.PRNGKey(0)}, example)
        )["params"]
        mask = apf_trainable_mask(params_shape, reference_quirks=quirks)

        optimizer = build_optimizer(
            schedule,
            weight_decay=train_config["weight_decay"],
            trainable_mask=mask,
            betas=(0.9, 0.999),
            eps=1e-8,
        )

        # Batch-level native augmentation pipeline (C++/OpenMP) when the
        # sampling mode permits vectorized slicing; disable with
        # train_config['native_pipeline'] = False for the per-item path.
        train_loader = test_loader = None
        if train_config.get("native_pipeline", True) and dataset_config.get(
            "sampling_method", "fps"
        ) in ("all", "fps"):
            from pointvit_tpu.data import BatchAugmenter, FastLoader, native_available

            if native_available():
                use_height = dataset_config.get("use_height", False)
                train_loader = FastLoader.for_dataset(
                    train_dataset,
                    batch_size,
                    BatchAugmenter(
                        normalize=dataset_config.get("normalize", False),
                        custom=dataset_config.get("use_custom_augmentation", False),
                        custom_prob=dataset_config.get("augmentation_probability", 0.0),
                        apf_transforms=True,
                        seed=seed,
                    ),
                    use_height=use_height,
                    shuffle=True,
                    drop_last=True,
                    seed=seed,
                )
                test_loader = FastLoader.for_dataset(
                    test_dataset,
                    batch_size,
                    BatchAugmenter(
                        normalize=dataset_config.get("normalize", False),
                        apf_test_transforms=True,
                        seed=seed + 1,
                    ),
                    use_height=use_height,
                    seed=seed + 1,
                )

        super().__init__(
            model,
            train_dataset=train_dataset,
            test_dataset=test_dataset,
            optimizer=optimizer,
            schedule=schedule,
            batch_size=batch_size,
            epochs=epochs,
            label_smoothing=train_config.get("label_smoothing", 0.3),
            output_dir=output_dir,
            model_config=model_config,
            dataset_config=dataset_config,
            train_config=train_config,
            log_lr=True,
            best_filename="model_best",
            save_interval=train_config.get("save_interval", 0),
            save_best=train_config.get("save_best", True),
            seed=seed,
            train_loader=train_loader,
            test_loader=test_loader,
            trainable_mask=mask,
            prefetch=train_config.get("prefetch", 2),
            nan_guard=train_config.get("nan_guard"),
            grad_accum=train_config.get("grad_accum", 1),
            ema_decay=train_config.get("ema_decay"),
            ema_eval=train_config.get("ema_eval", True),
            fsdp=train_config.get("fsdp", False),
        )

        pretrained = model_config.get("pretrained", True)
        if pretrained:
            self._load_pretrained(model_config)

    def _load_pretrained(self, model_config: dict) -> None:
        """Load timm ViT weights into the trunk from the local weight cache
        (this environment has no egress; absent cache → keep random init)."""
        from pointvit_tpu.pretrained import load_apf_vit_weights

        params = load_apf_vit_weights(
            self.state.params,
            model_config.get("vit_name", "vit_base_patch16_224"),
            reference_quirks=model_config.get("reference_quirks", False),
        )
        if params is not None:
            self.replace_params(params)
