"""Point-cloud → multi-view image rendering, TPU-native.

Capability parity with the reference's two renderers, re-designed around the
TPU's strengths:

- :func:`splat_bilinear` — the differentiable bilinear splat
  (``src/models/diff_renderer.py:155-219``). The reference builds flat indices
  and ``scatter_add_``s 4 weighted contributions per point. XLA scatter with
  duplicate indices serializes badly on TPU, so instead we exploit that
  bilinear splatting is *separable*: the weight a point with continuous pixel
  coords (px, py) contributes to pixel (x, y) is
  ``hat(px - x) * hat(py - y)`` with ``hat(t) = max(0, 1 - |t|)``. Evaluating
  the two hat matrices densely gives ``image = (Hyᵀ · diag(f)) · Hx`` — two
  MXU matmuls, zero scatters, and the VJP is again matmuls. Out-of-bounds
  points are masked to reproduce the reference's boundary-drop semantics
  (diff_renderer.py:186).
- :func:`rasterize_amax` — the fixed-view depth-shaded rasterizer
  (``src/models/renderer.py:71-139``): 5×5 dilation kernel in NDC, truncating
  quantization, per-pixel max of intensity. Fully batched via a single
  scatter-max (``.at[].max`` with dropped OOB indices), eliminating the
  reference's per-batch-item Python loop (renderer.py:117-137).
- rotation/projection helpers shared by both paths.

All images are single-channel (H, W); the reference's 3-channel output is a
broadcast of the same intensity (renderer.py:94, diff_renderer.py:217), which
callers apply lazily to avoid 3× the HBM traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "rotate_az_el",
    "project_orthographic",
    "depth_intensity",
    "splat_bilinear",
    "rasterize_amax",
    "rasterize_amax_fast",
    "project_points_spherical",
    "render_diff_views",
    "render_fixed_views",
    "fixed_view_angles",
]


def fixed_view_angles(num_views: int) -> tuple[jax.Array, jax.Array]:
    """Default camera angles in degrees (renderer.py:30-31). num_views <= 6."""
    if num_views > 6:
        raise ValueError("fixed renderer supports at most 6 views (renderer.py:31)")
    azimuths = jnp.linspace(0.0, 360.0, num_views + 1)[:-1]
    elevations = jnp.asarray([0.0, 30.0, -30.0, 0.0, 0.0, 0.0])[:num_views]
    return azimuths, elevations


def rotate_az_el(points: jax.Array, azimuth: jax.Array, elevation: jax.Array) -> jax.Array:
    """Rotate clouds by azimuth (about y) then elevation (about x), radians.

    points: (B, N, 3); azimuth/elevation: (B,) → (B, N, 3).
    Matches ``DifferentiablePointCloudRenderer.apply_rotation``
    (diff_renderer.py:118-153): R = R_el @ R_az, applied as points @ Rᵀ.
    """
    cos_az, sin_az = jnp.cos(azimuth), jnp.sin(azimuth)
    cos_el, sin_el = jnp.cos(elevation), jnp.sin(elevation)
    zeros = jnp.zeros_like(cos_az)
    ones = jnp.ones_like(cos_az)
    r_az = jnp.stack(
        [
            jnp.stack([cos_az, zeros, sin_az], -1),
            jnp.stack([zeros, ones, zeros], -1),
            jnp.stack([-sin_az, zeros, cos_az], -1),
        ],
        -2,
    )  # (B, 3, 3)
    r_el = jnp.stack(
        [
            jnp.stack([ones, zeros, zeros], -1),
            jnp.stack([zeros, cos_el, -sin_el], -1),
            jnp.stack([zeros, sin_el, cos_el], -1),
        ],
        -2,
    )
    r = jnp.einsum("bij,bjk->bik", r_el, r_az)
    return jnp.einsum("bnj,bkj->bnk", points, r)


def project_orthographic(points: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Split rotated points into 2D NDC xy and depth z (diff_renderer.py:236-238)."""
    return points[..., :2], points[..., 2]


def depth_intensity(z: jax.Array) -> jax.Array:
    """Per-cloud depth-normalized shading 0.3 + 0.7·ẑ (diff_renderer.py:241-244)."""
    z_min = jnp.min(z, axis=1, keepdims=True)
    z_max = jnp.max(z, axis=1, keepdims=True)
    z_norm = (z - z_min) / (z_max - z_min + 1e-6)
    return 0.3 + 0.7 * z_norm


def _hat_weights(coord: jax.Array, size: int, dtype) -> jax.Array:
    """Dense bilinear hat matrix. coord: (B, N) continuous pixel coords →
    (B, N, size) with row n holding max(0, 1 - |coord_n - j|) for j in [0, size)."""
    grid = jnp.arange(size, dtype=dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord[..., None] - grid))


@functools.partial(jax.jit, static_argnames=("img_size",))
def splat_bilinear(
    points_2d: jax.Array, features: jax.Array, img_size: int
) -> jax.Array:
    """Differentiable bilinear splat of per-point features onto an image grid.

    Args:
        points_2d: (B, N, 2) NDC coordinates in [-1, 1].
        features: (B, N) per-point intensities.
        img_size: output H = W (static).

    Returns:
        (B, H, W) splatted image; grads flow to both coords and features.
    """
    H = W = img_size
    dtype = points_2d.dtype
    px = (points_2d[..., 0] + 1.0) * 0.5 * W - 0.5  # (B, N)
    py = (points_2d[..., 1] + 1.0) * 0.5 * H - 0.5

    # Reference boundary semantics: a point is dropped entirely unless all 4
    # neighbours are in-bounds (diff_renderer.py:186).
    px1 = jnp.floor(px)
    py1 = jnp.floor(py)
    valid = (px1 >= 0) & (py1 >= 0) & (px1 + 1 < W) & (py1 + 1 < H)
    f = jnp.where(valid, features, 0.0)

    hx = _hat_weights(px, W, dtype)  # (B, N, W)
    hy = _hat_weights(py, H, dtype)  # (B, N, H)
    # image[y, x] = Σ_n f_n · hy[n, y] · hx[n, x]  — two MXU contractions.
    # HIGHEST keeps the accumulation in f32; the splat is a negligible share
    # of total FLOPs next to the downstream ViT.
    return jnp.einsum(
        "bny,bnx->byx",
        hy * f[..., None],
        hx,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(dtype)


@functools.partial(jax.jit, static_argnames=("img_size", "kernel_size"))
def rasterize_amax(
    points_2d: jax.Array,
    features: jax.Array,
    img_size: int,
    kernel_size: int = 5,
) -> jax.Array:
    """Depth-shaded max-rasterization with NDC dilation (fixed-view renderer).

    Args:
        points_2d: (B, N, 2) NDC coordinates in [-1, 1].
        features: (B, N) per-point intensities.
        img_size: output H = W (static).
        kernel_size: dilation kernel edge (reference: 5, renderer.py:100).

    Returns:
        (B, H, W) image; each pixel holds the max intensity of covering points.
    """
    B, N, _ = points_2d.shape
    H = W = img_size
    # 5×5 NDC offsets spanning ±2/img_size (renderer.py:100-103).
    offset = jnp.linspace(-2.0 / img_size, 2.0 / img_size, kernel_size)
    dx = jnp.tile(offset, kernel_size)  # x varies fastest, as meshgrid(ij)+stack([dx,dy])
    dy = jnp.repeat(offset, kernel_size)

    x = points_2d[..., 0][..., None] + dx  # (B, N, k²)
    y = points_2d[..., 1][..., None] + dy
    # Truncating quantization, matching `.long()` (renderer.py:119-120).
    px = jnp.trunc((x + 1.0) * 0.5 * (img_size - 1)).astype(jnp.int32)
    py = jnp.trunc((y + 1.0) * 0.5 * (img_size - 1)).astype(jnp.int32)

    valid = (px >= 0) & (px < W) & (py >= 0) & (py < H)
    flat = jnp.where(valid, py * W + px, H * W)  # OOB → dump slot H*W
    batch_base = (jnp.arange(B, dtype=jnp.int32) * (H * W + 1))[:, None, None]
    flat = (flat + batch_base).reshape(-1)

    vals = jnp.broadcast_to(
        features[..., None], (B, N, kernel_size * kernel_size)
    ).reshape(-1)

    image = jnp.zeros((B * (H * W + 1),), dtype=features.dtype)
    image = image.at[flat].max(vals, mode="drop")
    image = image.reshape(B, H * W + 1)[:, : H * W].reshape(B, H, W)
    return image


@functools.partial(jax.jit, static_argnames=("img_size",))
def rasterize_amax_fast(
    points_2d: jax.Array, features: jax.Array, img_size: int
) -> jax.Array:
    """Fast near-exact equivalent of :func:`rasterize_amax`.

    The reference's 5×5 dilation offsets span ±(S−1)/S pixels in half-pixel
    steps, so after truncating quantization the painted footprint is the
    pixel box [⌊px−δ⌋, ⌊px+δ⌋] × [⌊py−δ⌋, ⌊py+δ⌋] with δ = (S−1)/S — the
    3×3 box around the centre pixel except when the fractional position sits
    within 1/S of a pixel edge (≈0.9 % of points per axis at S=224), where
    one edge row/column of the box is absent. This path scatter-maxes one
    pixel per point (25× fewer serialized scatter updates) and dilates with
    a 3×3 max-pool — i.e. it always paints the full 3×3 box, over-dilating
    those edge cases by one pixel. Visually and for training this is
    indistinguishable (the dilation only thickens points); the exact kernel
    stays available via ``render_fixed_views(..., exact_raster=True)``.
    """
    B, N, _ = points_2d.shape
    H = W = img_size
    px = jnp.trunc((points_2d[..., 0] + 1.0) * 0.5 * (img_size - 1)).astype(jnp.int32)
    py = jnp.trunc((points_2d[..., 1] + 1.0) * 0.5 * (img_size - 1)).astype(jnp.int32)
    valid = (px >= 0) & (px < W) & (py >= 0) & (py < H)
    flat = jnp.where(valid, py * W + px, H * W)
    batch_base = (jnp.arange(B, dtype=jnp.int32) * (H * W + 1))[:, None]
    flat = (flat + batch_base).reshape(-1)

    image = jnp.zeros((B * (H * W + 1),), dtype=features.dtype)
    image = image.at[flat].max(features.reshape(-1), mode="drop")
    image = image.reshape(B, H * W + 1)[:, : H * W].reshape(B, H, W)
    # 3×3 max-pool dilation; SAME padding clips at borders exactly like the
    # reference's per-offset bounds check.
    return jax.lax.reduce_window(
        image,
        jnp.asarray(0.0, image.dtype),
        jax.lax.max,
        (1, 3, 3),
        (1, 1, 1),
        "SAME",
    )


@functools.partial(jax.jit, static_argnames=("img_size",))
def render_diff_views(
    points: jax.Array, azimuth: jax.Array, elevation: jax.Array, img_size: int
) -> jax.Array:
    """Full differentiable render: rotate → project → shade → bilinear splat.

    points: (B, N, 3); azimuth/elevation: (B,) radians → (B, H, W).
    Matches ``DifferentiablePointCloudRenderer.forward`` (diff_renderer.py:221-247).
    """
    rotated = rotate_az_el(points, azimuth, elevation)
    points_2d, z = project_orthographic(rotated)
    return splat_bilinear(points_2d, depth_intensity(z), img_size)


def project_points_spherical(
    points: jax.Array, azimuth_deg: jax.Array, elevation_deg: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Fixed-renderer projection (renderer.py:33-69). Degrees in; note this
    rotation convention is the *inverse* of :func:`rotate_az_el` — the
    reference's two renderers genuinely differ here, and we preserve both.

    points: (B, N, 3); azimuth/elevation: (B,) or scalar, degrees.
    Returns ((B, N, 2) NDC xy, (B, N) depth).
    """
    az = jnp.deg2rad(azimuth_deg)
    el = jnp.deg2rad(elevation_deg)
    cos_az = jnp.cos(az)[..., None]
    sin_az = jnp.sin(az)[..., None]
    cos_el = jnp.cos(el)[..., None]
    sin_el = jnp.sin(el)[..., None]
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    x_rot = x * cos_az - z * sin_az
    z_rot = x * sin_az + z * cos_az
    y_rot = y * cos_el - z_rot * sin_el
    z_final = y * sin_el + z_rot * cos_el
    return jnp.stack([x_rot, y_rot], axis=-1), z_final


@functools.partial(jax.jit, static_argnames=("img_size", "num_views", "exact_raster"))
def render_fixed_views(
    points: jax.Array, img_size: int, num_views: int, *, exact_raster: bool = False
) -> jax.Array:
    """Render from the fixed camera ring; fully batched over views.

    points: (B, N, 3) → (B, V, H, W).
    Matches ``PointCloudRenderer.forward`` (renderer.py:155-178): per-view
    spherical projection in *degrees*, depth shading, 5×5 dilation, amax
    rasterization — but batched over both batch and view axes instead of the
    reference's double Python loop.
    """
    B, N, _ = points.shape
    az_deg, el_deg = fixed_view_angles(num_views)

    # Flatten (B, V) into one batch for a single rasterization call.
    pts = jnp.broadcast_to(points[:, None], (B, num_views, N, 3)).reshape(
        B * num_views, N, 3
    )
    az_flat = jnp.tile(az_deg, B)
    el_flat = jnp.tile(el_deg, B)
    points_2d, z = project_points_spherical(pts, az_flat, el_flat)
    # Fixed renderer also uses 0.3 + 0.7·ẑ shading with 1e-6 eps (renderer.py:90-94).
    raster = rasterize_amax if exact_raster else rasterize_amax_fast
    image = raster(points_2d, depth_intensity(z), img_size)
    return image.reshape(B, num_views, img_size, img_size)
