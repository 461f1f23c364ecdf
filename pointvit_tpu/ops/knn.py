"""k-nearest-neighbour grouping, TPU-native.

Replaces the reference's duplicated kNN paths (``src/data/sampler.py:47-75``
and ``src/models/pix4point.py:79-91``) with one batched implementation whose
pairwise-distance stage is phrased as a matmul so XLA lowers it onto the MXU:

    ||q - s||^2 = ||q||^2 + ||s||^2 - 2 <q, s>

followed by ``lax.top_k`` over the (small) neighbour axis. Tie-breaking
between equal distances may differ from torch's ``topk(sorted=False)``
(sampler.py:74) — tests tolerate tie permutations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["square_distance", "knn_indices", "knn_gather", "knn_group"]


def square_distance(query: jax.Array, support: jax.Array) -> jax.Array:
    """Pairwise squared distances. query: (B, S, C), support: (B, N, C) → (B, S, N).

    Matmul-form of the reference's ``_square_distance`` (sampler.py:47-62);
    the -2·q·sᵀ term is a (S, C)x(C, N) contraction that runs on the MXU.
    """
    qq = jnp.sum(jnp.square(query), axis=-1, keepdims=True)  # (B,S,1)
    ss = jnp.sum(jnp.square(support), axis=-1, keepdims=True)  # (B,N,1)
    # HIGHEST keeps f32 accumulation on the MXU (bf16x3 passes); default
    # precision flips neighbour membership on near-ties, which changes group
    # composition versus the reference.
    cross = jnp.einsum(
        "bsc,bnc->bsn",
        query,
        support,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    return qq + jnp.swapaxes(ss, -1, -2) - 2.0 * cross


@functools.partial(jax.jit, static_argnames=("k",))
def knn_indices(query: jax.Array, support: jax.Array, k: int) -> jax.Array:
    """Indices of the k nearest support points per query point.

    Reference: ``knn_point`` (sampler.py:64-75) / ``knn`` in pix4point.py:79-89.

    Args:
        query: (B, S, C) query/centroid coordinates.
        support: (B, N, C) support-point coordinates.
        k: static neighbour count, k <= N.

    Returns:
        (B, S, k) int32 indices into N, nearest-first.
    """
    N = support.shape[1]
    if k > N:
        raise ValueError(f"k={k} > N={N}; shapes are static on TPU")
    d = square_distance(query, support)
    _, idx = lax.top_k(-d, k)
    return idx.astype(jnp.int32)


def knn_gather(values: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather neighbour values. values: (B, N, C), idx: (B, S, k) → (B, S, k, C)."""
    B, S, K = idx.shape
    flat = jnp.take_along_axis(values, idx.reshape(B, S * K)[..., None], axis=1)
    return flat.reshape(B, S, K, values.shape[-1])


@functools.partial(jax.jit, static_argnames=("k",))
def knn_group(
    points: jax.Array, centroids: jax.Array, features: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Group the k nearest points+features around each centroid.

    Capability match for ``group_knn`` (pix4point.py:56-102): returns the
    *absolute* grouped coordinates (the reference does not re-centre them)
    and the grouped features.

    Args:
        points: (B, N, 3) support coordinates.
        centroids: (B, S, 3) centroid coordinates.
        features: (B, N, D) per-point features.
        k: static neighbour count.

    Returns:
        (grouped_points (B, S, k, 3), grouped_features (B, S, k, D)).
    """
    idx = knn_indices(centroids, points, k)
    return knn_gather(points, idx), knn_gather(features, idx)
