"""Serving API: load a trained classifier and run batched inference.

The reference has no inference entry beyond ``RendererTrainer.predict``
(renderer_trainer.py:431-445); production serving is a rebuild target
(BASELINE.md), so this module provides the deployment surface:

    clf = Classifier.for_family("apf", model_config)        # random init
    clf = Classifier.for_family("apf", model_config,
                                checkpoint="model_best.msgpack")       # ours
    clf = Classifier.for_family("apf", model_config,
                                reference_checkpoint="model_best.pt")  # theirs
    labels = clf.predict(points)          # (N_clouds, N_pts, C) → (N_clouds,)
    probs  = clf.predict_proba(points)

Batches are padded to a fixed compiled shape (one XLA program regardless of
request size) and the forward runs in bf16 by default.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["Classifier"]

_FAMILIES = ("apf", "pix4point", "renderer")


def _build_model(family: str, model_config: dict, dtype):
    if family == "apf":
        from pointvit_tpu.models import AdaptPointFormer

        return AdaptPointFormer(
            num_classes=model_config["num_classes"],
            in_channels=model_config.get("in_channels", 3),
            embedding_dim=model_config.get("embedding_dim", 768),
            npoint=model_config.get("npoint", 196),
            nsample=model_config.get("nsample", 32),
            depth=model_config.get("depth", 12),
            num_heads=model_config.get("num_heads", 12),
            dtype=dtype,
            # serving preset (models.apf_serving_preset): width-only FLOP
            # cut, +20% throughput; accuracy parity measured on synthetic
            # corpora only so far (r3 paired-seed instrument,
            # results/parity_r3/summary.json "slim" ACCEPTED, DESIGN.md) —
            # real-data validation pending (RUNBOOK_real_data)
            encoder_second_width=model_config.get("encoder_second_width"),
            quantized=model_config.get("quantized", False),
        )
    if family == "pix4point":
        from pointvit_tpu.models import Pix4Point

        return Pix4Point.from_pretrained_name(
            model_config.get("pretrained_model", "vit_small_patch16_384"),
            num_classes=model_config["num_classes"],
            k_neighbors=model_config.get("k_neighbors", 16),
            embed_dim=model_config.get("embed_dim", 384),
            dtype=dtype,
            **{k: model_config[k] for k in ("depth", "num_heads") if k in model_config},
        )
    if family == "renderer":
        from pointvit_tpu.models import PointCloudRendererClassifier

        return PointCloudRendererClassifier(
            num_classes=model_config["num_classes"],
            vit_name=model_config.get("vit_name", "vit_b_16"),
            adapter_dim=model_config.get("adapter_dim", 64),
            num_views=model_config.get("num_views", 6),
            img_size=model_config.get("img_size", 224),
            diff_renderer=model_config.get("diff_renderer", False),
            view_transform_hidden=model_config.get("view_transform_hidden", 256),
            dtype=dtype,
        )
    raise ValueError(f"unknown family {family!r}; expected one of {_FAMILIES}")


class Classifier:
    """Batched point-cloud classifier over any of the three model families."""

    def __init__(self, model, variables, *, batch_size: int = 64):
        self.model = model
        self.variables = variables
        self.batch_size = batch_size
        self._fwd = jax.jit(
            lambda v, p: self.model.apply(v, p, train=False)
        )

    @classmethod
    def for_family(
        cls,
        family: str,
        model_config: dict,
        *,
        checkpoint: str | None = None,
        reference_checkpoint: str | None = None,
        example_points: int = 1024,
        batch_size: int = 64,
        bf16: bool = True,
        seed: int = 0,
    ) -> "Classifier":
        """Build a classifier; restore weights from one of our msgpack
        checkpoints or a reference torch checkpoint if given."""
        dtype = jnp.bfloat16 if bf16 else jnp.float32
        model = _build_model(family, model_config, dtype)
        in_ch = model_config.get("in_channels", 3) if family == "apf" else 3
        example = jnp.zeros((1, example_points, in_ch), jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(seed)}, example)
        variables = dict(variables)

        if checkpoint is not None:
            from flax import serialization

            with open(checkpoint, "rb") as f:
                raw = serialization.msgpack_restore(f.read())
            template = {
                "params": jax.device_get(variables["params"]),
                "batch_stats": jax.device_get(variables.get("batch_stats", {})),
            }
            restored = serialization.from_state_dict(
                template, {k: raw[k] for k in template}
            )
            variables["params"] = restored["params"]
            if restored["batch_stats"]:
                variables["batch_stats"] = restored["batch_stats"]
        elif reference_checkpoint is not None:
            from pointvit_tpu.pretrained import (
                load_reference_apf_checkpoint,
                load_reference_pix4point_checkpoint,
                load_reference_renderer_checkpoint,
            )

            loader = {
                "apf": load_reference_apf_checkpoint,
                "pix4point": load_reference_pix4point_checkpoint,
                "renderer": load_reference_renderer_checkpoint,
            }[family]
            params, batch_stats, _ = loader(variables, reference_checkpoint)
            variables["params"] = params
            if batch_stats:
                variables["batch_stats"] = batch_stats

        return cls(model, variables, batch_size=batch_size)

    def logits(self, points: np.ndarray) -> np.ndarray:
        """(N, P, C) clouds → (N, num_classes) logits; batches padded to the
        compiled batch size so any request size reuses one XLA program."""
        points = np.asarray(points, np.float32)
        n = len(points)
        outs = []
        for start in range(0, n, self.batch_size):
            chunk = points[start : start + self.batch_size]
            pad = self.batch_size - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[:1], pad, 0)], 0)
            out = np.asarray(
                self._fwd(self.variables, jnp.asarray(chunk)).astype(jnp.float32)
            )
            outs.append(out[: len(points[start : start + self.batch_size])])
        return np.concatenate(outs, 0)

    def predict_proba(self, points: np.ndarray) -> np.ndarray:
        logits = self.logits(points)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    def predict(self, points: np.ndarray) -> np.ndarray:
        return np.argmax(self.logits(points), axis=-1)
