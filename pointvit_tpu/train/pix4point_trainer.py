"""Pix4Point trainer — config-dict API parity with
``src/train/pix4point_trainer.py``.

AdamW over no-decay param groups (cls token/pos, biases, norms —
pix4point.py:386-401), linear-warmup → cosine-annealing schedule
(pix4point_trainer.py:108-122), plain CE, grad-norm clipping, best
checkpoint named ``best_model`` (reference naming, pix4point_trainer.py:144).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from pointvit_tpu.data.scanobjectnn import ScanObjectNN
from pointvit_tpu.models.factory import build_model
from pointvit_tpu.models.pix4point import pix4point_trainable_mask
from pointvit_tpu.train.schedules import warmup_then_cosine_schedule
from pointvit_tpu.train.trainer import Trainer, build_optimizer

__all__ = ["Pix4PointTrainer"]


def weight_decay_mask(params):
    """True = apply weight decay. Mirrors the reference's no-decay groups:
    cls_token/cls_pos, every bias, and params whose path contains 'norm'
    (pix4point.py:390-396 — note torch Sequential BatchNorms don't have
    'norm' in their names, so only their biases are excluded; preserved)."""

    def decay(path) -> bool:
        keys = [p.key for p in path if isinstance(p, jtu.DictKey)]
        joined = "/".join(keys)
        if keys and keys[-1] == "bias":
            return False
        if "cls_token" in joined or "cls_pos" in joined:
            return False
        if "norm" in joined:
            return False
        return True

    flat = jtu.tree_flatten_with_path(params)[0]
    return jtu.tree_unflatten(jtu.tree_structure(params), [decay(p) for p, _ in flat])


class Pix4PointTrainer(Trainer):
    """Trainer for Pix4Point on ScanObjectNN."""

    def __init__(
        self,
        model_config: dict,
        dataset_config: dict,
        train_config: dict,
        device: str = "tpu",
        output_dir: str = "./output_pix4point",
        seed: int = 0,
    ) -> None:
        self._device_hint = device

        model = build_model(model_config, family="pix4point")

        common = dict(
            root_dir=dataset_config["root_dir"],
            variant=dataset_config["variant"],
            augmentation=dataset_config["augmentation"],
            num_points=dataset_config["num_points"],
            normalize=dataset_config["normalize"],
            sampling_method=dataset_config.get("sampling_method", "all"),
        )
        train_dataset = ScanObjectNN(
            split="training",
            use_custom_augmentation=dataset_config.get("use_custom_augmentation", False),
            seed=seed,
            **common,
        )
        test_dataset = ScanObjectNN(
            split="test", use_custom_augmentation=False, seed=seed + 1, **common
        )

        epochs = train_config["epochs"]
        batch_size = train_config["batch_size"]
        steps_per_epoch = max(len(train_dataset) // batch_size, 1)
        schedule = warmup_then_cosine_schedule(
            train_config["learning_rate"],
            steps_per_epoch,
            warmup_epochs=train_config.get("warmup_epochs", 10),
            t_max=train_config["t_max"],
            min_lr=train_config.get("min_lr", 1e-6),
        )

        example = jnp.zeros((1,) + tuple(train_dataset[0][0].shape))
        params_shape = jax.eval_shape(
            lambda: model.init({"params": jax.random.PRNGKey(0)}, example)
        )["params"]
        trainable = (
            pix4point_trainable_mask(params_shape, frozen=True)
            if model_config.get("frozen", False)
            else None
        )

        optimizer = build_optimizer(
            schedule,
            weight_decay=train_config["weight_decay"],
            grad_clip=train_config.get("grad_norm_clip"),
            trainable_mask=trainable,
            weight_decay_mask=weight_decay_mask,
        )

        from pointvit_tpu.train.train_utils import native_loaders

        train_loader, test_loader = native_loaders(
            train_dataset, test_dataset, batch_size, dataset_config, train_config, seed
        )

        super().__init__(
            model,
            train_dataset=train_dataset,
            test_dataset=test_dataset,
            optimizer=optimizer,
            schedule=schedule,
            batch_size=batch_size,
            epochs=epochs,
            label_smoothing=0.0,
            output_dir=output_dir,
            model_config=model_config,
            dataset_config=dataset_config,
            train_config=train_config,
            log_lr=False,
            best_filename="best_model",
            save_interval=train_config.get("save_interval", 0),
            save_best=train_config.get("save_best", True),
            seed=seed,
            train_loader=train_loader,
            test_loader=test_loader,
            trainable_mask=trainable,
            prefetch=train_config.get("prefetch", 2),
            nan_guard=train_config.get("nan_guard"),
            grad_accum=train_config.get("grad_accum", 1),
            ema_decay=train_config.get("ema_decay"),
            ema_eval=train_config.get("ema_eval", True),
            fsdp=train_config.get("fsdp", False),
        )

        if model_config.get("pretrained", True):
            self._load_pretrained(model_config)

    def _load_pretrained(self, model_config: dict) -> None:
        from pointvit_tpu.pretrained import load_pix4point_vit_weights

        params = load_pix4point_vit_weights(
            self.state.params, model_config["pretrained_model"]
        )
        if params is not None:
            self.replace_params(params)
