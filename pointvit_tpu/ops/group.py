"""Point-cloud grouping pipelines: FPS centers → kNN neighbourhoods → serialization.

One shared implementation of the tokenizer front-end replacing the reference's
two private copies:

- :func:`apf_group` — the APF ``Group`` module (``src/models/apf.py:12-112``):
  FPS centers, kNN gather of the full feature channels, centre-relative
  normalization, concat of the centre feature, then Morton-sort of groups and
  centers along the Z-order curve of the center coordinates.
- :func:`p3_group` — one stage of Pix4Point's ``P3Embed`` grouping
  (``src/models/pix4point.py:166-182``): FPS centers + kNN gather of points
  and features; grouped coordinates stay *absolute* (reference semantics) or
  centre-relative behind a flag.

Everything is jit-able with static shapes and runs on device as part of the
model's forward graph — tokenization is no longer a host-side preprocessing
concern.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pointvit_tpu.ops.fps import farthest_point_sample, fps_gather
from pointvit_tpu.ops.knn import knn_gather, knn_group, knn_indices
from pointvit_tpu.ops.morton import morton_argsort

__all__ = ["apf_group", "p3_group"]


def _use_fused_knn(n_points: int) -> bool:
    """Use the fused Pallas kNN+gather kernel on TPU for lane-aligned point
    counts (over the XLA distance+top_k+gather chain; the (B, S, N) distance
    tensor never leaves VMEM). Near-equal distances may resolve to a
    different (equivalent) neighbour than XLA top_k. N ≤ 2048 because the
    kernel packs the lane index into the distance key's mantissa tail.

    Precision note: the fused kernel's in-kernel one-hot gather carries the
    feature payload as split bf16 (hi + lo ≈ 16 mantissa bits), so gathered
    *features* differ from exact f32 by up to ~2⁻¹⁶ relative — distances and
    neighbour selection stay exact f32. Every in-repo consumer (the APF
    encoder, P3Embed) computes in bf16 (8 mantissa bits), so the error is
    invisible downstream; an f32-exact consumer should pass
    ``implementation='xla'`` to the samplers instead."""
    if n_points % 128 != 0 or n_points > 2048:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _grouped_neighbourhood(xyz, centers, feats, k, implementation=None):
    """kNN-gather ``feats`` around ``centers``: fused Pallas kernel on TPU,
    XLA fallback elsewhere (``implementation='xla'`` forces the fallback).
    Returns (B, S, k, C); row 0 of each group is the centre itself (distance
    0, lowest index — FPS centres are support points; any exact-duplicate
    tie shares identical features)."""
    if implementation != "xla" and _use_fused_knn(xyz.shape[1]):
        from pointvit_tpu.ops.pallas_knn import knn_group_pallas

        _, grouped = knn_group_pallas(xyz, centers, feats, k)
        return grouped
    idx = knn_indices(centers, xyz, k)
    return knn_gather(feats, idx)


@functools.partial(
    jax.jit, static_argnames=("num_group", "group_size", "implementation")
)
def apf_group(
    x: jax.Array,
    xyz: jax.Array,
    num_group: int,
    group_size: int,
    *,
    key: jax.Array | None = None,
    implementation: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Group features around FPS centers and serialize by Morton order.

    Args:
        x: (B, N, C) per-point features (xyz [+ height] channels for APF).
        xyz: (B, N, 3) coordinates used for sampling/ordering.
        num_group: number of groups G (static).
        group_size: points per group K (static).
        key: optional PRNG key for the FPS start point.
        implementation: None (auto) or 'xla' — force the XLA FPS/kNN paths
            (parity debugging; the fused kNN payload is split-bf16,
            ~2⁻¹⁶ relative on gathered features).

    Returns:
        neighborhood: (B, G, K, 2C) — centre-relative neighbour features
            concatenated with the (repeated) centre feature, groups ordered
            along the Morton curve of their centers (apf.py:82-105).
        center: (B, G, 3) Morton-ordered group centers.
    """
    fps_idx = farthest_point_sample(
        xyz, num_group, key=key, implementation=implementation
    )  # (B, G)
    center = fps_gather(xyz, fps_idx)  # (B, G, 3)

    # Serialize along the Z-order curve of the centers (apf.py:97-110) —
    # applied to the centers BEFORE grouping: each group's kNN is
    # independent of the others, so sorting the (B, G, 3) centers first
    # yields bit-identical output to the reference's post-hoc sort of the
    # (B, G, K, 2C) neighborhood tensor while skipping that ~50 MB gather.
    order = morton_argsort(center)  # (B, G)
    center = jnp.take_along_axis(center, order[:, :, None], axis=1)

    neighborhood = _grouped_neighbourhood(
        xyz, center, x, group_size, implementation
    )  # (B,G,K,C)
    # The centre is its own nearest neighbour (see _grouped_neighbourhood),
    # so its feature row doubles as the reference's ``index_points(x, fps_idx)``.
    center_feat = neighborhood[:, :, 0, :]  # (B, G, C)

    # Centre-relative normalization over the full feature channels, then
    # concat the centre feature (apf.py:83-95).
    neighborhood = neighborhood - center_feat[:, :, None, :]
    neighborhood = jnp.concatenate(
        [
            neighborhood,
            jnp.broadcast_to(
                center_feat[:, :, None, :], neighborhood.shape
            ),
        ],
        axis=-1,
    )

    return neighborhood, center


@functools.partial(
    jax.jit, static_argnames=("num_samples", "k", "relative_pos", "implementation")
)
def p3_group(
    points: jax.Array,
    features: jax.Array,
    num_samples: int,
    k: int,
    *,
    key: jax.Array | None = None,
    relative_pos: bool = False,
    implementation: str | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One progressive-tokenizer grouping stage (Pix4Point P3Embed).

    Args:
        points: (B, N, 3) current-stage coordinates.
        features: (B, N, D) current-stage features.
        num_samples: FPS centre count S (static).
        k: neighbour count (static).
        key: optional PRNG key for the FPS start point.
        relative_pos: if True, return centre-relative grouped coordinates
            (the Pix4Point paper's semantics); False matches the reference
            implementation, which feeds *absolute* neighbour coordinates to
            the conv stack (pix4point.py:178-182).
        implementation: None (auto) or 'xla' — force the XLA FPS/kNN paths.

    Returns:
        (centers (B, S, 3), grouped_points (B, S, k, 3),
         grouped_features (B, S, k, D)).
    """
    fps_idx = farthest_point_sample(
        points, num_samples, key=key, implementation=implementation
    )
    centers = fps_gather(points, fps_idx)  # (B, S, 3)
    if implementation != "xla" and _use_fused_knn(points.shape[1]):
        # One fused gather over [coords ‖ features]; split after.
        combined = jnp.concatenate([points, features], axis=-1)
        grouped = _grouped_neighbourhood(points, centers, combined, k)
        grouped_points = grouped[..., :3]
        grouped_features = grouped[..., 3:]
    else:
        grouped_points, grouped_features = knn_group(points, centers, features, k)
    if relative_pos:
        grouped_points = grouped_points - centers[:, :, None, :]
    return centers, grouped_points, grouped_features
