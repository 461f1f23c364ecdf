"""Point-feature encoders: APF mini-PointNet and the Pix4Point P3Embed tokenizer.

The reference expresses these as Conv1d/Conv2d stacks with kernel size 1 over
channel-first tensors (``src/models/apf.py:114-217``,
``src/models/pix4point.py:105-191``); a k=1 conv is a pointwise Dense, so here
they are Dense layers over channel-last tensors — the layout XLA prefers on
TPU (lanes = features). BatchNorm uses torch's momentum (0.9 in running-stat
convention) and runs over all leading axes.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointvit_tpu.ops.group import p3_group

__all__ = ["GroupFeatureEncoder", "P3Embed", "PosEmbedMLP"]

_BN = dict(momentum=0.9, epsilon=1e-5)
# Pix4Point initializes its (non-ViT) Linears with xavier_uniform and zero
# biases (pix4point.py:376-383); flax's Dense default is lecun_normal.
_XAVIER = nn.initializers.xavier_uniform()


class GroupFeatureEncoder(nn.Module):
    """Per-group shared-MLP encoder producing one token per point group.

    Reference: APF ``Encoder`` (apf.py:114-181). Input (B, G, K, C_in) →
    first stack (C_in→256→512→E) → max over K → concat(global, local) →
    second stack (2E→2E→E) → max over K → (B, G, E).
    """

    embed_dim: int
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False
    # None = auto (fused Pallas kernel on TPU inference), 'fused' / 'xla' force.
    implementation: str | None = None
    # Width of the post-concat second stack. None → 2·E, the reference's
    # exact-parity width (apf.py:160-176). The serving preset sets E: same
    # structure (global+local fusion, depth, nonlinearity), half the hidden
    # width — the encoder is ~40% of the model's FLOPs and this halves its
    # dominant two matmuls (accuracy-neutrality evidence, synthetic-only:
    # the r3 paired-seed instrument, results/parity_r3/summary.json "slim"
    # ACCEPTED; DESIGN.md "r3 accuracy-parity instrument").
    second_width: int | None = None
    # jax.checkpoint the training body (recompute-in-backward); enables
    # exact-config training at batch sizes whose activations overflow HBM.
    remat: bool = False

    def _fused_ok(self, B: int, G: int, *, train: bool) -> bool:
        if self.implementation == "xla" or train or self.quantized:
            return False
        if self.is_initializing() or not self.has_variable("batch_stats", "first_bn0"):
            return False
        if (B * G) % 16 != 0:
            return False
        if self.implementation == "fused":
            return True
        try:
            return jax.default_backend() in ("tpu", "axon")
        except Exception:
            return False

    @nn.compact
    def __call__(self, groups: jax.Array, *, train: bool = False) -> jax.Array:
        E = self.embed_dim
        B, G, K, C = groups.shape
        if self._fused_ok(B, G, train=train):
            # Inference: the whole encoder runs as one Pallas kernel with the
            # BatchNorms folded into the matmuls — the (B·G, K, 2E) second-stack
            # intermediate never reaches HBM (see ops/pallas_encoder.py).
            from pointvit_tpu.ops.pallas_encoder import (
                fold_encoder_params,
                fused_group_encoder,
            )

            weights = fold_encoder_params(
                self.variables["params"], self.variables["batch_stats"]
            )
            interpret = jax.default_backend() not in ("tpu", "axon")
            x = groups.astype(self.dtype).reshape(B * G, K, C)
            return fused_group_encoder(x, weights, interpret).reshape(B, G, E)
        body = self._body_remat if self.remat else self._body
        return body(groups, train)

    def _body(self, groups: jax.Array, train: bool) -> jax.Array:
        from pointvit_tpu.nn.quant import dense

        E = self.embed_dim
        B, G, K, C = groups.shape
        # Flatten groups to 3D (B·G, K, C) — matches the reference's reshape
        # (apf.py:157) and sidesteps an XLA TPU fusion crash in the backward
        # select-and-scatter of 4D bf16 max-pools.
        x = groups.reshape(B * G, K, C)
        # first_0 stays bf16: its contraction dim (C≈6-8) is far below the
        # MXU tile and the layer is <0.1% of encoder FLOPs.
        x = nn.Dense(256, dtype=self.dtype, name="first_0")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="first_bn0", **_BN)(x)
        x = nn.relu(x)
        x = dense(self.quantized, 512, dtype=self.dtype, name="first_1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="first_bn1", **_BN)(x)
        x = nn.relu(x)
        x = dense(self.quantized, E, dtype=self.dtype, name="first_2")(x)

        g = jnp.max(x, axis=-2, keepdims=True)  # (B·G, 1, E)

        # The second stack's first layer acts on concat([global, local]):
        #     W · [g; l] = W_g·g + W_l·l
        # and g is shared by all K points of a group, so the W_g·g half runs
        # once per *group* instead of per point — exact same arithmetic,
        # K× fewer FLOPs on that half (the single largest matmul here).
        # Init scale 0.5 emulates the fused layer's fan-in of 2E.
        H = self.second_width or 2 * E
        half_init = nn.initializers.variance_scaling(0.5, "fan_in", "truncated_normal")
        xg = nn.Dense(
            H, use_bias=True, kernel_init=half_init, dtype=self.dtype,
            name="second_0_global",
        )(g)  # (B·G, 1, H) — per-group only; too small to quantize usefully
        xl = dense(
            self.quantized, H, use_bias=False, kernel_init=half_init,
            dtype=self.dtype, name="second_0_local",
        )(x)  # (B·G, K, H)
        x = xg + xl

        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="second_bn0", **_BN)(x)
        x = nn.relu(x)
        x = dense(self.quantized, E, dtype=self.dtype, name="second_1")(x)
        return jnp.max(x, axis=-2).reshape(B, G, E)

    # Rematerialized twin of _body for memory-bound training: the (B·G, K, H)
    # second-stack activations (~4.9 GB bf16 each at batch 256 full size) are
    # recomputed in the backward instead of held — exact APF training at
    # batch 256 otherwise exceeds v5e HBM by ~280 MB. Gradients identical
    # (test_models.py::TestEncoderRemat).
    _body_remat = nn.remat(_body, static_argnums=(2,))


class P3Embed(nn.Module):
    """Progressive point-patch tokenizer (Pix4Point ``P3Embed``).

    Reference: pix4point.py:105-191. Each stage: FPS to N/4 centers, kNN
    grouping (absolute neighbour coordinates — reference semantics), concat
    [coords, features], conv stack 1, concat global max, conv stack 2, max
    pool → per-center token. With the defaults (sample_ratio=0.25, scale=4)
    there is exactly one stage: 2048 pts → 512 tokens of dim ``embed_dim``.

    FPS start indices are randomized when an ``'fps'`` PRNG stream is
    provided to ``apply`` (the reference randomizes every forward,
    pix4point.py:30); otherwise deterministic at index 0.
    """

    in_channels: int = 3
    sample_ratio: float = 0.25
    scale: int = 4
    k: int = 16
    layers: int = 4
    embed_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    # None = auto (fused Pallas stage kernel on TPU inference); 'fused'
    # forces the stage kernel (interpret off-TPU); 'xla' forces the XLA
    # FPS/kNN and conv-stack paths.
    implementation: str | None = None

    def _fused_stage_ok(self, M: int, stage: int, *, train: bool) -> bool:
        # Mirror of GroupFeatureEncoder._fused_ok: the stage kernel
        # (ops/pallas_encoder.py::fused_p3_embed) folds inference BNs and
        # the conv1 linear pair, so it needs frozen stats + the default
        # 4-layer stage structure (conv1 pair, conv2 [2D, D]).
        if self.implementation == "xla" or train or self.layers != 4:
            return False
        if self.is_initializing() or not self.has_variable(
            "batch_stats", f"s{stage}_conv1_bn"
        ):
            return False
        if M % 16 != 0:
            return False
        if self.implementation == "fused":
            return True
        try:
            return jax.default_backend() in ("tpu", "axon")
        except Exception:
            return False

    @nn.compact
    def __call__(
        self, points: jax.Array, features: jax.Array, *, train: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        """points: (B, N, 3); features: (B, N, C_in) → (centers, tokens)."""
        stages = int(math.log(1 / self.sample_ratio, self.scale))
        stage_dim = int(self.embed_dim // 2 ** (stages - 1))
        key = self.make_rng("fps") if self.has_rng("fps") else None

        # 'fused' governs the embed kernel only; grouping stays auto
        # (p3_group/FPS accept None or 'xla').
        tok_impl = "xla" if self.implementation == "xla" else None

        p, f = points, features
        in_ch = self.in_channels
        N = points.shape[1]
        for s in range(stages):
            N = N // 4  # reference hard-codes the per-stage ratio (pix4point.py:174)
            stage_key = None
            if key is not None:
                key, stage_key = jax.random.split(key)
            centers, dp, fj = p3_group(
                p, f, N, self.k, key=stage_key,
                implementation=tok_impl,
            )
            x = jnp.concatenate([dp, fj], axis=-1)  # (B, S, k, 3 + in_ch)

            B, S, K, C = x.shape
            if self._fused_stage_ok(B * S, s, train=train):
                # Inference: the whole conv stack runs as one Pallas kernel —
                # BNs folded, the conv1 linear pair collapsed to one matmul,
                # the (B·S, K, 2D) concat intermediate never in HBM
                # (ops/pallas_encoder.py::fused_p3_embed).
                from pointvit_tpu.ops.pallas_encoder import (
                    fold_p3_stage_params,
                    fused_p3_embed,
                )

                weights = fold_p3_stage_params(
                    self.variables["params"], self.variables["batch_stats"], s
                )
                interpret = jax.default_backend() not in ("tpu", "axon")
                f = fused_p3_embed(
                    x.astype(self.dtype).reshape(B * S, K, C), weights, interpret
                ).reshape(B, S, stage_dim)
                p = centers
                in_ch = stage_dim
                stage_dim *= 2
                continue

            # conv1: Dense(no bias) → Dense(bias) → BN → ReLU  (pix4point.py:137-145)
            half = self.layers // 2
            for i in range(half):
                last = i == half - 1
                x = nn.Dense(
                    stage_dim, use_bias=last, kernel_init=_XAVIER,
                    dtype=self.dtype, name=f"s{s}_conv1_{i}"
                )(x)
                if last:
                    x = nn.BatchNorm(
                        use_running_average=not train,
                        dtype=self.dtype,
                        name=f"s{s}_conv1_bn",
                        **_BN,
                    )(x)
                    x = nn.relu(x)

            g = jnp.max(x, axis=-2, keepdims=True)
            x = jnp.concatenate([jnp.broadcast_to(g, x.shape), x], axis=-1)  # 2·dim

            # conv2: (2·dim → 2·dim → dim), each Dense(no bias) → BN → ReLU
            # (pix4point.py:147-156)
            widths = [2 * stage_dim] * (half - 1) + [stage_dim]
            for i, w in enumerate(widths):
                x = nn.Dense(
                    w, use_bias=False, kernel_init=_XAVIER, dtype=self.dtype,
                    name=f"s{s}_conv2_{i}",
                )(x)
                x = nn.BatchNorm(
                    use_running_average=not train,
                    dtype=self.dtype,
                    name=f"s{s}_conv2_bn{i}",
                    **_BN,
                )(x)
                x = nn.relu(x)

            f = jnp.max(x, axis=-2)  # (B, S, dim)
            p = centers
            in_ch = stage_dim
            stage_dim *= 2

        return p, f


class PosEmbedMLP(nn.Module):
    """Learned 3D positional embedding: Dense(3→128) → GELU → Dense(128→E).

    Reference: pix4point.py:214-218.
    """

    embed_dim: int
    hidden: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz: jax.Array) -> jax.Array:
        h = nn.Dense(self.hidden, kernel_init=_XAVIER, dtype=self.dtype, name="fc1")(xyz)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.embed_dim, kernel_init=_XAVIER, dtype=self.dtype, name="fc2")(h)
