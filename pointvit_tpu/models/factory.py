"""Model factory: one config dict → one Flax module, per family.

The reference constructs each family's model inline in its trainer
(``src/train/apf_trainer.py:44-63``, ``src/train/pix4point_trainer.py:19-42``,
``src/train/renderer_trainer.py:19-63``), so nothing outside a trainer can
rebuild the architecture a checkpoint was trained with. Here construction is
a standalone factory shared by training (``pointvit_tpu/train/*``) and
serving (``pointvit_tpu/serve.py``): the ``model_config`` dict a checkpoint's
sidecar JSON carries is sufficient to rebuild its model byte-identically.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["FAMILIES", "detect_family", "build_model"]

FAMILIES = ("apf", "pix4point", "renderer")


def detect_family(model_config: dict) -> str:
    """Infer the model family from the reference config-dict key sets.

    Discriminators (each unique to one entry script's ``model_config``):
    ``pretrained_model`` → Pix4Point (train_pix4point.py:6-13); ``num_views``
    → renderer (train_renderer.py:28-38); otherwise APF (train_apf.py:10-19,
    requires ``in_channels``).
    """
    if "pretrained_model" in model_config:
        return "pix4point"
    if "num_views" in model_config:
        return "renderer"
    if "in_channels" in model_config:
        return "apf"
    raise ValueError(
        "cannot infer model family from model_config keys "
        f"{sorted(model_config)}; pass family= explicitly"
    )


def build_model(model_config: dict, family: str | None = None):
    """Build the family's Flax module from a reference-style config dict.

    Exactly the construction the family trainer performs — trainers call this
    factory, so a checkpoint's ``model_config`` (sidecar JSON) rebuilds the
    architecture it was trained with. ``bf16`` (default True) selects the
    compute dtype; parameters are always f32.
    """
    family = family or detect_family(model_config)
    compute_dtype = jnp.bfloat16 if model_config.get("bf16", True) else jnp.float32

    if family == "apf":
        from pointvit_tpu.models.apf import AdaptPointFormer

        return AdaptPointFormer(
            num_classes=model_config["num_classes"],
            in_channels=model_config["in_channels"],
            embedding_dim=model_config.get("embedding_dim", 768),
            npoint=model_config.get("npoint", 196),
            nsample=model_config.get("nsample", 32),
            dropout_rate=model_config.get("dropout_rate", 0.1),
            dropout_path_rate=model_config.get(
                # The reference reads drop_path_rate while its entry script
                # supplies dropout_path_rate (apf_trainer.py:79 vs
                # train_apf.py:12) — honour both spellings.
                "drop_path_rate", model_config.get("dropout_path_rate", 0.1)
            ),
            depth=model_config.get("depth", 12),
            num_heads=model_config.get("num_heads", 12),
            dtype=compute_dtype,
            encoder_second_width=model_config.get("encoder_second_width"),
            remat_encoder=model_config.get("remat_encoder", False),
            quantized=model_config.get("quantized", False),
        )
    if family == "pix4point":
        from pointvit_tpu.models.pix4point import Pix4Point

        overrides = {
            k: model_config[k]
            for k in (
                "depth",
                "num_heads",
                "moe_experts",
                "moe_every",
                "moe_top_k",
                "moe_normalize_gates",
            )
            if k in model_config
        }
        return Pix4Point.from_pretrained_name(
            model_config["pretrained_model"],
            num_classes=model_config["num_classes"],
            k_neighbors=model_config["k_neighbors"],
            embed_dim=model_config["embed_dim"],
            dtype=compute_dtype,
            **overrides,
        )
    if family == "renderer":
        from pointvit_tpu.models.renderer import PointCloudRendererClassifier

        return PointCloudRendererClassifier(
            num_classes=model_config["num_classes"],
            vit_name=model_config["vit_name"],
            adapter_dim=model_config["adapter_dim"],
            num_views=model_config["num_views"],
            img_size=model_config["img_size"],
            dropout_rate=model_config["dropout_rate"],
            diff_renderer=model_config.get("diff_renderer", False),
            view_transform_hidden=model_config.get("view_transform_hidden", 256),
            dtype=compute_dtype,
        )
    raise ValueError(f"unknown family {family!r}; expected one of {FAMILIES}")
