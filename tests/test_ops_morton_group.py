"""Unit tests for Morton serialization and grouping pipelines."""

import jax
import jax.numpy as jnp
import numpy as np

from pointvit_tpu.ops import (
    apf_group,
    encode_morton3,
    morton_argsort,
    morton_codes,
    p3_group,
    part1by2,
)


def _part1by2_oracle(n: int) -> int:
    n &= 0x3FF
    out = 0
    for bit in range(10):
        out |= ((n >> bit) & 1) << (3 * bit)
    return out


def test_part1by2_matches_bitwise_oracle():
    vals = np.array([0, 1, 2, 3, 7, 255, 511, 1023, 12345], dtype=np.int32)
    got = np.asarray(part1by2(jnp.asarray(vals)))
    expected = np.array([_part1by2_oracle(int(v)) for v in vals], dtype=np.int32)
    np.testing.assert_array_equal(got, expected)


def test_encode_morton3_interleaving():
    # x=1 → bit 0; y=1 → bit 1; z=1 → bit 2.
    x = jnp.asarray([1, 0, 0])
    y = jnp.asarray([0, 1, 0])
    z = jnp.asarray([0, 0, 1])
    got = np.asarray(encode_morton3(x, y, z))
    np.testing.assert_array_equal(got, [1, 2, 4])


def test_morton_codes_fit_int32(rng):
    pts = rng.standard_normal((2, 100, 3)).astype(np.float32) * 50
    codes = np.asarray(morton_codes(jnp.asarray(pts)))
    assert codes.dtype == np.int32
    assert codes.min() >= 0
    assert codes.max() < 2**30


def test_morton_argsort_orders_z_curve():
    # Points along a diagonal: Morton order must match coordinate order.
    n = 16
    pts = np.zeros((1, n, 3), dtype=np.float32)
    diag = np.linspace(0, 1, n)
    perm = np.random.default_rng(1).permutation(n)
    pts[0, :, 0] = diag[perm]
    pts[0, :, 1] = diag[perm]
    pts[0, :, 2] = diag[perm]
    order = np.asarray(morton_argsort(jnp.asarray(pts)))[0]
    np.testing.assert_array_equal(perm[order], np.arange(n))


def test_apf_group_shapes_and_relative_normalization(rng):
    B, N, C, G, K = 2, 256, 4, 16, 8
    xyz = rng.standard_normal((B, N, 3)).astype(np.float32)
    heights = rng.random((B, N, 1)).astype(np.float32)
    x = np.concatenate([xyz, heights], axis=-1)

    nbhd, center = apf_group(jnp.asarray(x), jnp.asarray(xyz), G, K)
    nbhd, center = np.asarray(nbhd), np.asarray(center)
    assert nbhd.shape == (B, G, K, 2 * C)
    assert center.shape == (B, G, 3)

    # Local part: each group's nearest neighbour is its own center → the
    # first local offset row is ~zero in the xyz channels.
    np.testing.assert_allclose(nbhd[:, :, 0, :3], 0.0, atol=1e-5)
    # Global part: last C channels are constant across the group (the center
    # feature repeated), and their xyz slice equals the (sorted) center.
    for k in range(K):
        np.testing.assert_allclose(nbhd[:, :, k, C : C + 3], center, atol=1e-6)

    # Centers are Morton-sorted: codes must be non-decreasing.
    from pointvit_tpu.ops import morton_codes as mc

    codes = np.asarray(mc(jnp.asarray(center)))
    assert np.all(np.diff(codes, axis=1) >= 0)


def test_p3_group_semantics(rng):
    B, N, S, K = 2, 128, 32, 8
    pts = rng.standard_normal((B, N, 3)).astype(np.float32)
    feats = pts.copy()  # Pix4Point uses coordinates as initial features
    centers, gp, gf = p3_group(jnp.asarray(pts), jnp.asarray(feats), S, K)
    assert centers.shape == (B, S, 3)
    assert gp.shape == (B, S, K, 3)
    assert gf.shape == (B, S, K, 3)
    # Absolute coordinates by default (reference quirk).
    np.testing.assert_allclose(np.asarray(gp)[:, :, 0], np.asarray(centers), atol=1e-6)

    # relative_pos=True re-centres the grouped coordinates.
    _, gp_rel, _ = p3_group(
        jnp.asarray(pts), jnp.asarray(feats), S, K, relative_pos=True
    )
    np.testing.assert_allclose(np.asarray(gp_rel)[:, :, 0], 0.0, atol=1e-6)


def test_apf_group_jit_under_vmap_key(rng):
    # Keys thread deterministically.
    xyz = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    n1, c1 = apf_group(xyz, xyz[..., :3], 8, 4, key=key)
    n2, c2 = apf_group(xyz, xyz[..., :3], 8, 4, key=key)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
