"""Morton (Z-order curve) serialization of 3D points, TPU-native.

Capability match for the reference's ``MortonEncoder``
(``src/models/apf_utils.py:8-104``): normalize each cloud to a 10-bit/axis
grid, interleave bits into a single Morton code, and argsort. All pure
vectorized int32 bit ops — XLA fuses the interleave into a handful of VPU
instructions; no kernel needed.

The maximum code is < 2^30 (three 10-bit axes spread to bit 27, z shifted by
2 → bit 29), so int32 is exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["part1by2", "encode_morton3", "morton_codes", "morton_argsort"]

_RESOLUTION = 1024  # 10 bits per axis, matching apf_utils.py:67


def part1by2(n: jax.Array) -> jax.Array:
    """Spread the low 10 bits of each int so consecutive bits are 3 apart.

    Reference: ``part1by2_vectorized`` (apf_utils.py:34-48).
    """
    n = n.astype(jnp.uint32)
    n = n & jnp.uint32(0x000003FF)
    n = (n ^ (n << 16)) & jnp.uint32(0xFF0000FF)
    n = (n ^ (n << 8)) & jnp.uint32(0x0300F00F)
    n = (n ^ (n << 4)) & jnp.uint32(0x030C30C3)
    n = (n ^ (n << 2)) & jnp.uint32(0x09249249)
    return n.astype(jnp.int32)  # result < 2^28, sign-safe


def encode_morton3(x: jax.Array, y: jax.Array, z: jax.Array) -> jax.Array:
    """Interleave three 10-bit coordinate tensors into Morton codes.

    Reference: ``encode_morton3_vectorized`` (apf_utils.py:51-64).
    """
    return (part1by2(z) << 2) + (part1by2(y) << 1) + part1by2(x)


def morton_codes(points: jax.Array, resolution: int = _RESOLUTION) -> jax.Array:
    """Per-cloud-normalized Morton codes. points: (B, N, 3) → (B, N) int32.

    Reference: normalization steps of ``points_to_morton`` (apf_utils.py:86-100).
    """
    pmin = jnp.min(points, axis=1, keepdims=True)
    pmax = jnp.max(points, axis=1, keepdims=True)
    normalized = (points - pmin) / (pmax - pmin + 1e-8)
    discrete = (normalized * (resolution - 1)).astype(jnp.int32)
    return encode_morton3(discrete[..., 0], discrete[..., 1], discrete[..., 2])


@jax.jit
def morton_argsort(points: jax.Array, resolution: int = _RESOLUTION) -> jax.Array:
    """Indices that sort each cloud along the Z-order curve.

    Reference: ``points_to_morton`` (apf_utils.py:67-104). points: (B, N, 3)
    → (B, N) int32 sort permutation.
    """
    return jnp.argsort(morton_codes(points, resolution), axis=1).astype(jnp.int32)
