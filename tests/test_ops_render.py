"""Unit tests for the rendering ops against scatter-based numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from pointvit_tpu.ops import (
    depth_intensity,
    fixed_view_angles,
    rasterize_amax,
    render_diff_views,
    render_fixed_views,
    rotate_az_el,
    splat_bilinear,
)


def _splat_oracle(points_2d, features, img_size):
    """Scatter-add bilinear splat, mirroring diff_renderer.py:155-219."""
    B, N, _ = points_2d.shape
    H = W = img_size
    out = np.zeros((B, H, W), dtype=np.float64)
    for b in range(B):
        for n in range(N):
            px = (points_2d[b, n, 0] + 1) * 0.5 * W - 0.5
            py = (points_2d[b, n, 1] + 1) * 0.5 * H - 0.5
            x1, y1 = np.floor(px), np.floor(py)
            x2, y2 = x1 + 1, y1 + 1
            if not (x1 >= 0 and y1 >= 0 and x2 < W and y2 < H):
                continue
            f = features[b, n]
            out[b, int(y1), int(x1)] += f * (x2 - px) * (y2 - py)
            out[b, int(y2), int(x1)] += f * (x2 - px) * (py - y1)
            out[b, int(y1), int(x2)] += f * (px - x1) * (y2 - py)
            out[b, int(y2), int(x2)] += f * (px - x1) * (py - y1)
    return out


def test_splat_bilinear_matches_scatter_oracle(rng):
    B, N, S = 2, 64, 16
    pts = (rng.random((B, N, 2)) * 2.4 - 1.2).astype(np.float32)  # some OOB
    feats = rng.random((B, N)).astype(np.float32)
    img = np.asarray(splat_bilinear(jnp.asarray(pts), jnp.asarray(feats), S))
    expected = _splat_oracle(pts, feats, S)
    np.testing.assert_allclose(img, expected, rtol=1e-4, atol=1e-5)


def test_splat_bilinear_mass_conservation(rng):
    # All in-bounds points: total splatted mass equals total feature mass.
    B, N, S = 1, 32, 32
    pts = (rng.random((B, N, 2)) * 1.2 - 0.6).astype(np.float32)
    feats = rng.random((B, N)).astype(np.float32)
    img = np.asarray(splat_bilinear(jnp.asarray(pts), jnp.asarray(feats), S))
    np.testing.assert_allclose(img.sum(), feats.sum(), rtol=1e-4)


def test_splat_bilinear_gradients_flow(rng):
    B, N, S = 1, 16, 8
    pts = jnp.asarray((rng.random((B, N, 2)) - 0.5).astype(np.float32))
    feats = jnp.asarray(rng.random((B, N)).astype(np.float32))

    def loss(p, f):
        return jnp.sum(splat_bilinear(p, f, S) ** 2)

    gp, gf = jax.grad(loss, argnums=(0, 1))(pts, feats)
    assert np.isfinite(np.asarray(gp)).all()
    assert np.isfinite(np.asarray(gf)).all()
    assert np.abs(np.asarray(gp)).max() > 0
    assert np.abs(np.asarray(gf)).max() > 0


def _amax_oracle(points_2d, features, img_size, kernel_size=5):
    """Per-pixel max rasterizer with NDC dilation, mirroring renderer.py:96-137."""
    B, N, _ = points_2d.shape
    H = W = img_size
    out = np.zeros((B, H, W), dtype=np.float32)
    offset = np.linspace(-2.0 / img_size, 2.0 / img_size, kernel_size)
    dyg, dxg = np.meshgrid(offset, offset, indexing="ij")
    kern = np.stack([dxg, dyg], -1).reshape(-1, 2)
    for b in range(B):
        for n in range(N):
            for dx, dy in kern:
                px = int(np.trunc((points_2d[b, n, 0] + dx + 1) * 0.5 * (img_size - 1)))
                py = int(np.trunc((points_2d[b, n, 1] + dy + 1) * 0.5 * (img_size - 1)))
                if 0 <= px < W and 0 <= py < H:
                    out[b, py, px] = max(out[b, py, px], features[b, n])
    return out


def test_rasterize_amax_matches_oracle(rng):
    B, N, S = 2, 48, 16
    pts = (rng.random((B, N, 2)) * 2.2 - 1.1).astype(np.float32)
    feats = (0.3 + 0.7 * rng.random((B, N))).astype(np.float32)
    img = np.asarray(rasterize_amax(jnp.asarray(pts), jnp.asarray(feats), S))
    expected = _amax_oracle(pts, feats, S)
    np.testing.assert_allclose(img, expected, atol=1e-6)


def test_depth_intensity_range(rng):
    z = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))
    f = np.asarray(depth_intensity(z))
    assert f.min() >= 0.3 - 1e-5
    assert f.max() <= 1.0 + 1e-5


def test_rotate_az_el_identity_and_quarter_turn():
    pts = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]])
    zero = jnp.zeros((1,))
    out = np.asarray(rotate_az_el(pts, zero, zero))
    np.testing.assert_allclose(out, np.asarray(pts), atol=1e-6)

    # 90° azimuth about y: matches R_az = [[c,0,s],[0,1,0],[-s,0,c]], x' = p·Rᵀ.
    out = np.asarray(rotate_az_el(pts, jnp.asarray([np.pi / 2]), zero))[0]
    np.testing.assert_allclose(out[0], [0.0, 0.0, -1.0], atol=1e-6)  # x → -z
    np.testing.assert_allclose(out[2], [1.0, 0.0, 0.0], atol=1e-6)  # z → x


def test_fixed_view_angles():
    az, el = fixed_view_angles(4)
    np.testing.assert_allclose(np.asarray(az), [0, 90, 180, 270])
    np.testing.assert_allclose(np.asarray(el), [0, 30, -30, 0])


def test_render_views_shapes(rng):
    pts = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32) * 0.4)
    fixed = render_fixed_views(pts, 32, 3)
    assert fixed.shape == (2, 3, 32, 32)
    assert np.asarray(fixed).max() > 0

    az = jnp.zeros((2,))
    el = jnp.zeros((2,))
    diff = render_diff_views(pts, az, el, 32)
    assert diff.shape == (2, 32, 32)
    assert np.isfinite(np.asarray(diff)).all()


def test_rasterize_fast_covers_exact(rng):
    # The fast rasterizer paints the full 3x3 box; the exact kernel's
    # footprint is a subset (edge rows/cols conditionally absent). So
    # fast >= exact everywhere, differences confined to box edges, and the
    # two agree on the vast majority of painted pixels.
    from pointvit_tpu.ops import rasterize_amax_fast

    B, N, S = 2, 128, 64
    pts = (rng.random((B, N, 2)) * 1.6 - 0.8).astype(np.float32)
    feats = (0.3 + 0.7 * rng.random((B, N))).astype(np.float32)
    exact = np.asarray(rasterize_amax(jnp.asarray(pts), jnp.asarray(feats), S))
    fast = np.asarray(rasterize_amax_fast(jnp.asarray(pts), jnp.asarray(feats), S))
    assert np.all(fast >= exact - 1e-6)
    painted = exact > 0
    agree = np.isclose(fast[painted], exact[painted], atol=1e-6).mean()
    assert agree > 0.95


def test_rasterize_fast_exact_interior_fractions():
    # Points whose fractional pixel positions are well inside (0.25..0.75):
    # fast and exact are bit-identical.
    from pointvit_tpu.ops import rasterize_amax_fast

    S = 32
    scale = 0.5 * (S - 1)
    px = np.array([5.5, 10.25, 20.75, 16.4]) / scale - 1.0
    py = np.array([7.5, 12.6, 25.3, 3.5]) / scale - 1.0
    pts = np.stack([px, py], -1)[None].astype(np.float32)
    feats = np.asarray([[0.5, 0.7, 0.9, 1.0]], np.float32)
    exact = np.asarray(rasterize_amax(jnp.asarray(pts), jnp.asarray(feats), S))
    fast = np.asarray(rasterize_amax_fast(jnp.asarray(pts), jnp.asarray(feats), S))
    np.testing.assert_allclose(fast, exact, atol=1e-6)
