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

For the production engine — sidecar-config checkpoint auto-rebuild, a
compiled batch-bucket ladder, mesh data parallelism, and request
micro-batching — see :mod:`pointvit_tpu.serve`; both build models through
:func:`pointvit_tpu.models.factory.build_model`, the same factory the
trainers use (serving architecture == training architecture by
construction).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["Classifier"]

_FAMILIES = ("apf", "pix4point", "renderer")

# Reference entry-script defaults (train_*.py config dicts) so callers may
# pass partial configs; the serving preset note: encoder_second_width is a
# width-only FLOP cut with accuracy parity measured on synthetic corpora so
# far (r3 paired-seed instrument, results/parity_r3/summary.json "slim"
# ACCEPTED, DESIGN.md) — real-data validation pending (RUNBOOK_real_data).
_FAMILY_DEFAULTS = {
    "apf": {"in_channels": 3},
    "pix4point": {
        "pretrained_model": "vit_small_patch16_384",
        "k_neighbors": 16,
        "embed_dim": 384,
    },
    "renderer": {
        "vit_name": "vit_b_16",
        "adapter_dim": 64,
        "num_views": 6,
        "img_size": 224,
        "dropout_rate": 0.0,
    },
}


def _build_model(family: str, model_config: dict, dtype):
    if family not in _FAMILIES:
        raise ValueError(f"unknown family {family!r}; expected one of {_FAMILIES}")
    from pointvit_tpu.models.factory import build_model

    cfg = {**_FAMILY_DEFAULTS[family], **model_config}
    cfg["bf16"] = dtype == jnp.bfloat16
    return build_model(cfg, family=family)


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
        use_ema: bool = True,
    ) -> "Classifier":
        """Build a classifier; restore weights from one of our msgpack
        checkpoints or a reference torch checkpoint if given. Checkpoints
        written by an EMA trainer (``Trainer(ema_decay=...)``) deploy their
        averaged weights by default — pass ``use_ema=False`` for the raw
        params."""
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
            ema = use_ema and isinstance(raw, dict) and "ema_params" in raw
            params_raw = raw["ema_params"] if ema else raw["params"]
            stats_raw = (
                raw["ema_batch_stats"]
                if ema and raw.get("ema_batch_stats")
                else raw["batch_stats"]
            )
            template = {
                "params": jax.device_get(variables["params"]),
                "batch_stats": jax.device_get(variables.get("batch_stats", {})),
            }
            restored = serialization.from_state_dict(
                template,
                {"params": params_raw, "batch_stats": stats_raw},
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
