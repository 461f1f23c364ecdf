"""Host-side numpy point-cloud augmentations.

Capability parity with ``src/data/augment.py`` (same function names, ranges,
and semantics), in two families:

- standalone array → array augments used by the ScanObjectNN
  ``use_custom_augmentation`` path (augment.py:4-191);
- dict-based pipeline transforms used by the APF trainer
  (augment.py:193-307): anisotropic scale, centre+normalize (which also
  derives the per-point *heights* channel), and random axis rotations
  composed in random order.

These run on host workers per sample (they are branchy, cheap, and operate
on 2048×3 arrays); everything after batching runs on device. All randomness
flows through an explicit ``numpy.random.Generator`` (default: a module
default) instead of global numpy state.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "normalize_point_cloud",
    "random_point_dropout",
    "random_scale_point_cloud",
    "random_shift_point_cloud",
    "random_jitter_point_cloud",
    "rotate_point_cloud_y",
    "rotate_point_cloud_z",
    "drop_and_replace_with_noise",
    "random_rotate_point_cloud",
    "scale_point_cloud",
    "center_and_normalize_point_cloud",
    "rotate_point_cloud",
]

_default_rng = np.random.default_rng()


def _rng(rng):
    return rng if rng is not None else _default_rng


def normalize_point_cloud(points: np.ndarray) -> np.ndarray:
    """Centre at origin, scale to the unit sphere (augment.py:4-18)."""
    points = points - np.mean(points, axis=0)
    max_dist = np.max(np.sqrt(np.sum(points**2, axis=1)))
    if max_dist > 0:
        points = points / max_dist
    return points


def random_point_dropout(points, max_dropout_ratio=0.875, rng=None):
    """Replace a random subset of points with the first point (augment.py:20-34)."""
    rng = _rng(rng)
    ratio = rng.random() * max_dropout_ratio
    drop = rng.random(points.shape[0]) <= ratio
    out = points.copy()
    out[drop] = points[0]
    return out


def random_scale_point_cloud(points, scale_low=0.8, scale_high=1.25, rng=None):
    """Uniform isotropic scale (augment.py:36-48)."""
    return points * _rng(rng).uniform(scale_low, scale_high)


def random_shift_point_cloud(points, shift_range=0.1, rng=None):
    """Uniform translation per axis (augment.py:50-61)."""
    return points + _rng(rng).uniform(-shift_range, shift_range, 3)


def random_jitter_point_cloud(points, sigma=0.01, clip=0.05, rng=None):
    """Clipped Gaussian jitter (augment.py:63-75)."""
    jitter = np.clip(sigma * _rng(rng).standard_normal(points.shape), -clip, clip)
    return points + jitter


def _rot_x(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def _rot_y(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _rot_z(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def rotate_point_cloud_y(points, rng=None):
    """Full random rotation about y (augment.py:77-93)."""
    return points @ _rot_y(_rng(rng).uniform(0, 2 * np.pi))


def rotate_point_cloud_z(points, rng=None):
    """Full random rotation about z (augment.py:95-111)."""
    return points @ _rot_z(_rng(rng).uniform(0, 2 * np.pi))


def drop_and_replace_with_noise(point_cloud, drop_ratio=0.05, noise_std=0.02, rng=None):
    """Replace a random subset with bounding-box-uniform noisy points
    (augment.py:113-156)."""
    rng = _rng(rng)
    n = point_cloud.shape[0]
    drop_count = int(n * drop_ratio)
    drop_idx = rng.choice(n, drop_count, replace=False)
    lo = point_cloud.min(axis=0)
    hi = point_cloud.max(axis=0)
    noise = rng.uniform(lo, hi, size=(drop_count, 3))
    noise += rng.normal(0, noise_std, size=(drop_count, 3))
    out = point_cloud.copy()
    out[drop_idx] = noise
    return out


def random_rotate_point_cloud(points, rng=None):
    """Full z rotation + limited (±15°) x/y rotations, composed Z→Y→X and
    applied as ``points @ Rᵀ`` (augment.py:158-191)."""
    rng = _rng(rng)
    r_z = _rot_z(rng.uniform(0, 2 * np.pi))
    r_y = _rot_y(rng.uniform(-np.pi / 12, np.pi / 12))
    r_x = _rot_x(rng.uniform(-np.pi / 12, np.pi / 12))
    return points @ (r_z @ r_y @ r_x).T


# ---------------------------------------------------------------------------
# Dict-based pipeline transforms (APF trainer path).
# ---------------------------------------------------------------------------


def scale_point_cloud(
    data: dict,
    scale_range=(0.9, 1.1),
    anisotropic: bool = True,
    scale_xyz=(True, True, True),
    rng=None,
) -> dict:
    """Anisotropic per-axis scale of ``data['xyz']`` (augment.py:193-226)."""
    rng = _rng(rng)
    if anisotropic:
        scale = rng.uniform(scale_range[0], scale_range[1], size=3)
    else:
        scale = np.full(3, rng.uniform(scale_range[0], scale_range[1]))
    scale = np.where(np.asarray(scale_xyz), scale, 1.0)
    data["xyz"] = data["xyz"] * scale
    return data


def center_and_normalize_point_cloud(
    data: dict, center: bool = True, normalize: bool = True, gravity_dim: int = 1, rng=None
) -> dict:
    """Centre/unit-sphere normalize and derive ``heights`` = y − min(y)
    *before* centring (augment.py:228-261)."""
    points = np.array(data["xyz"])
    heights = points[:, gravity_dim : gravity_dim + 1]
    data["heights"] = heights - np.min(heights, axis=0)
    if center:
        points = points - np.mean(points, axis=0)
    if normalize:
        max_dist = np.max(np.sqrt(np.sum(points**2, axis=1)))
        if max_dist > 0:
            points = points / max_dist
    data["xyz"] = points
    return data


def rotate_point_cloud(
    data: dict, angle=(0.0, 1.0, 0.0), angle_units: str = "radians", rng=None
) -> dict:
    """Random per-axis rotations within bounds, composed in *random order*
    and applied as ``points @ Rᵀ`` (augment.py:263-307)."""
    rng = _rng(rng)
    bounds = np.asarray(angle, dtype=np.float64)
    if angle_units == "degrees":
        bounds = np.deg2rad(bounds)

    mats = []
    for axis_idx, bound in enumerate(bounds):
        if bound != 0:
            theta = rng.uniform(-bound, bound)
            mats.append((_rot_x, _rot_y, _rot_z)[axis_idx](theta))
        else:
            mats.append(np.eye(3))

    combined = np.eye(3)
    for i in rng.permutation(3):
        combined = combined @ mats[i]
    data["xyz"] = data["xyz"] @ combined.T
    return data
