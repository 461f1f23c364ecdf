"""Unit tests for FPS / kNN / gather ops against numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointvit_tpu.ops import (
    farthest_point_sample,
    fps_gather,
    knn_gather,
    knn_group,
    knn_indices,
    square_distance,
)


def _fps_oracle(xyz: np.ndarray, n_samples: int, start: int) -> np.ndarray:
    """Sequential FPS, single cloud, numpy."""
    N = xyz.shape[0]
    dist = np.full(N, np.inf)
    farthest = start
    out = np.zeros(n_samples, dtype=np.int64)
    for i in range(n_samples):
        out[i] = farthest
        d = np.sum((xyz - xyz[farthest]) ** 2, axis=1)
        dist = np.minimum(dist, d)
        farthest = int(np.argmax(dist))
    return out


def test_fps_matches_oracle(rng):
    xyz = rng.standard_normal((4, 128, 3)).astype(np.float32)
    idx = np.asarray(farthest_point_sample(jnp.asarray(xyz), 32))
    assert idx.shape == (4, 32)
    for b in range(4):
        expected = _fps_oracle(xyz[b], 32, start=0)
        np.testing.assert_array_equal(idx[b], expected)


def test_fps_random_start_key(rng):
    xyz = rng.standard_normal((2, 64, 3)).astype(np.float32)
    key = jax.random.PRNGKey(7)
    idx = np.asarray(farthest_point_sample(jnp.asarray(xyz), 16, key=key))
    # Deterministic under the same key.
    idx2 = np.asarray(farthest_point_sample(jnp.asarray(xyz), 16, key=key))
    np.testing.assert_array_equal(idx, idx2)
    # All indices distinct per batch (well-spread samples).
    for b in range(2):
        assert len(set(idx[b].tolist())) == 16


def test_fps_covers_extremes():
    # Points on a line: FPS from index 0 must pick the two endpoints first.
    xyz = np.zeros((1, 10, 3), dtype=np.float32)
    xyz[0, :, 0] = np.arange(10)
    idx = np.asarray(farthest_point_sample(jnp.asarray(xyz), 3))
    assert idx[0, 0] == 0
    assert idx[0, 1] == 9
    # Third point is the midpoint-farthest from {0, 9}: index 4 or 5.
    assert idx[0, 2] in (4, 5)


def test_fps_num_samples_too_large():
    xyz = jnp.zeros((1, 8, 3))
    with pytest.raises(ValueError):
        farthest_point_sample(xyz, 9)


def test_square_distance_oracle(rng):
    q = rng.standard_normal((2, 5, 3)).astype(np.float32)
    s = rng.standard_normal((2, 7, 3)).astype(np.float32)
    d = np.asarray(square_distance(jnp.asarray(q), jnp.asarray(s)))
    expected = np.sum((q[:, :, None, :] - s[:, None, :, :]) ** 2, axis=-1)
    np.testing.assert_allclose(d, expected, rtol=1e-4, atol=1e-5)


def test_knn_indices_sets_match_oracle(rng):
    q = rng.standard_normal((3, 16, 3)).astype(np.float32)
    s = rng.standard_normal((3, 64, 3)).astype(np.float32)
    k = 8
    idx = np.asarray(knn_indices(jnp.asarray(q), jnp.asarray(s), k))
    d = np.sum((q[:, :, None, :] - s[:, None, :, :]) ** 2, axis=-1)
    expected = np.argsort(d, axis=-1)[..., :k]
    # Tolerate tie permutations: compare as sets per query.
    for b in range(3):
        for i in range(16):
            assert set(idx[b, i].tolist()) == set(expected[b, i].tolist())


def test_knn_nearest_first(rng):
    q = rng.standard_normal((1, 4, 3)).astype(np.float32)
    s = rng.standard_normal((1, 32, 3)).astype(np.float32)
    idx = np.asarray(knn_indices(jnp.asarray(q), jnp.asarray(s), 5))
    d = np.sum((q[:, :, None, :] - s[:, None, :, :]) ** 2, axis=-1)[0]
    for i in range(4):
        dists = d[i, idx[0, i]]
        assert np.all(np.diff(dists) >= -1e-5)  # sorted ascending


def test_gathers(rng):
    pts = rng.standard_normal((2, 10, 4)).astype(np.float32)
    idx2 = rng.integers(0, 10, (2, 3)).astype(np.int32)
    out2 = np.asarray(fps_gather(jnp.asarray(pts), jnp.asarray(idx2)))
    for b in range(2):
        np.testing.assert_array_equal(out2[b], pts[b, idx2[b]])

    idx3 = rng.integers(0, 10, (2, 3, 5)).astype(np.int32)
    out3 = np.asarray(knn_gather(jnp.asarray(pts), jnp.asarray(idx3)))
    for b in range(2):
        np.testing.assert_array_equal(out3[b], pts[b, idx3[b]])


def test_knn_group_shapes_and_absolute_coords(rng):
    pts = rng.standard_normal((2, 64, 3)).astype(np.float32)
    feats = rng.standard_normal((2, 64, 6)).astype(np.float32)
    ctr = pts[:, :8]
    gp, gf = knn_group(jnp.asarray(pts), jnp.asarray(ctr), jnp.asarray(feats), 4)
    assert gp.shape == (2, 8, 4, 3)
    assert gf.shape == (2, 8, 4, 6)
    # Each centroid is its own nearest neighbour → first grouped point equals
    # the centroid itself (absolute coordinates, reference semantics).
    np.testing.assert_allclose(np.asarray(gp)[:, :, 0, :], ctr, atol=1e-6)


def test_fps_pallas_interpret_matches_xla(rng):
    # The Pallas kernel (interpret mode on CPU) must select identically to
    # the XLA implementation, including tie-breaking.
    import jax.numpy as jnp

    from pointvit_tpu.ops.fps import _fps_xla
    from pointvit_tpu.ops.pallas_fps import fps_pallas

    xyz = jnp.asarray(rng.standard_normal((8, 128, 3)).astype(np.float32))
    start = jnp.asarray([0, 5, 17, 99, 1, 42, 77, 127], dtype=jnp.int32)
    ix = np.asarray(_fps_xla(xyz, 48, start))
    ip = np.asarray(fps_pallas(xyz, 48, start, interpret=True))
    np.testing.assert_array_equal(ix, ip)
