"""Renderer trainer — config-dict API parity with
``src/train/renderer_trainer.py``.

AdamW over trainable (adapter + head + view-net) params only, optional
cosine annealing, optional grad clipping, and the reference's extra
observability: every ``save_views_interval`` epochs the first test cloud is
rendered from all views and saved as a PNG grid under
``<output_dir>/rendered_views/`` (renderer_trainer.py:189-234, 356-361).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from pointvit_tpu.data.scanobjectnn import ScanObjectNN
from pointvit_tpu.models.factory import build_model
from pointvit_tpu.models.renderer import renderer_trainable_mask
from pointvit_tpu.train.schedules import cosine_annealing_schedule, constant_schedule
from pointvit_tpu.train.trainer import Trainer, build_optimizer

__all__ = ["RendererTrainer"]


class RendererTrainer(Trainer):
    """Trainer for PointCloudRendererClassifier on ScanObjectNN."""

    def __init__(
        self,
        model_config: dict,
        dataset_config: dict,
        train_config: dict,
        device: str = "tpu",
        output_dir: str = "./output",
        seed: int = 0,
    ) -> None:
        self._device_hint = device

        model = build_model(model_config, family="renderer")

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
        if batch_size < 64 and device == "tpu":
            # Measured (DESIGN.md renderer anatomy): the backward pass is
            # per-kernel-overhead-bound at small batches on TPU — bs64 is
            # 3.35× the examples/s of the reference's bs16 config (fwd+bwd
            # 998 ms vs 834 ms for 4× the examples). The reference default
            # (train_renderer.py:3-35) is a GPU-era choice.
            import warnings

            warnings.warn(
                f"batch_size={batch_size} is latency-bound on TPU; "
                "batch_size >= 64 is ~3.35x examples/s at bs64 vs bs16 "
                "(DESIGN.md renderer training anatomy)",
                stacklevel=2,
            )
        steps_per_epoch = max(len(train_dataset) // batch_size, 1)
        if train_config.get("use_lr_scheduler", False):
            schedule = cosine_annealing_schedule(
                train_config["learning_rate"],
                epochs,
                steps_per_epoch,
                min_lr=train_config.get("min_lr", 1e-6),
            )
        else:
            schedule = constant_schedule(train_config["learning_rate"])

        example = jnp.zeros((1,) + tuple(train_dataset[0][0].shape))
        params_shape = jax.eval_shape(
            lambda: model.init({"params": jax.random.PRNGKey(0)}, example)
        )["params"]
        mask = renderer_trainable_mask(params_shape)

        optimizer = build_optimizer(
            schedule,
            weight_decay=train_config["weight_decay"],
            grad_clip=train_config.get("clip_grad_norm") or None,
            trainable_mask=mask,
        )

        self.save_views_interval = train_config.get("save_views_interval", 5)
        self.views_dir = os.path.join(output_dir, "rendered_views")
        os.makedirs(self.views_dir, exist_ok=True)

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
            trainable_mask=mask,
            epoch_hooks=(_save_views_hook,),
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
        from pointvit_tpu.pretrained import load_torchvision_vit_weights

        params = load_torchvision_vit_weights(
            self.state.params, model_config["vit_name"]
        )
        if params is not None:
            self.replace_params(params)

    # -- rendered-view observability --------------------------------------

    def save_rendered_views(self, points: np.ndarray, epoch: int) -> str | None:
        """Render views of the first cloud and save a PNG grid."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:  # matplotlib optional
            return None

        variables = {"params": self.state.params}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        views = self.model.apply(
            variables, jnp.asarray(points[:1]), method=self.model.render_views
        )
        views = np.asarray(views[0])  # (V, H, W)

        num_views = views.shape[0]
        cols = min(num_views, 3)
        rows = int(np.ceil(num_views / 3))
        fig = plt.figure(figsize=(cols * 4, rows * 4))
        for i in range(num_views):
            ax = fig.add_subplot(rows, cols, i + 1)
            ax.imshow(np.clip(views[i], 0, 1), cmap="gray")
            ax.axis("off")
            ax.set_title(f"View {i}")
        fig.tight_layout()
        path = os.path.join(self.views_dir, f"test_views_epoch_{epoch}.png")
        fig.savefig(path)
        plt.close(fig)
        print(f"Test rendered views saved to {path}")
        return path

    def get_predicted_views(self, points: np.ndarray):
        """Learned view angles in degrees (renderer.py:351-368)."""
        variables = {"params": self.state.params}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        az, el = self.model.apply(
            variables, jnp.asarray(points), method=self.model.predict_views
        )
        return np.asarray(az), np.asarray(el)


def _save_views_hook(trainer: RendererTrainer, epoch: int) -> None:
    if epoch % trainer.save_views_interval == 0 and len(trainer.test_dataset) > 0:
        points, _ = trainer.test_dataset[0]
        trainer.save_rendered_views(points[None], epoch)
