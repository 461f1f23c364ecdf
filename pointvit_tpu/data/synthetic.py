"""Synthetic point-cloud data: class-conditional shape generator + H5 writers.

The build environment has no dataset downloads (zero egress), so tests,
smoke-training, and throughput benchmarks run on synthetic clouds. The
generator produces *learnable* class structure (class-dependent Gaussian
ellipsoid mixtures) so end-to-end training sanity checks can watch accuracy
rise above chance. The writers emit H5 files in the exact on-disk layouts the
:class:`~pointvit_tpu.data.scanobjectnn.ScanObjectNN` and
:class:`~pointvit_tpu.data.modelnet40.ModelNet40` loaders expect, so the
loaders' path/format logic is exercised for real.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = [
    "make_clouds",
    "make_shape_clouds",
    "write_scanobjectnn_h5",
    "write_modelnet40_h5",
]


def make_clouds(
    num_samples: int,
    num_points: int = 2048,
    num_classes: int = 15,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Generate (num_samples, num_points, 3) clouds + labels with
    class-dependent geometry (cluster count, anisotropy, orientation)."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, num_samples)
    clouds = np.empty((num_samples, num_points, 3), dtype=np.float32)

    # Deterministic per-class shape recipe.
    class_rng = np.random.default_rng(1234)
    recipes = []
    for c in range(num_classes):
        k = 1 + c % 4  # cluster count 1..4
        centers = class_rng.uniform(-0.6, 0.6, (k, 3))
        scales = class_rng.uniform(0.05, 0.4, (k, 3))
        recipes.append((k, centers, scales))

    for i, c in enumerate(labels):
        k, centers, scales = recipes[c]
        assignment = rng.integers(0, k, num_points)
        pts = centers[assignment] + rng.standard_normal((num_points, 3)) * scales[assignment]
        clouds[i] = pts.astype(np.float32)
    return clouds, labels.astype(np.int64)


def _unit_sphere(rng, n):
    v = rng.standard_normal((n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _shape_points(c: int, n: int, rng) -> np.ndarray:
    """n points on/in class-``c`` primitive (classes 0-14), roughly unit scale."""
    u = lambda k: rng.uniform(0.0, 1.0, k)
    if c == 0:  # sphere shell
        return 0.9 * _unit_sphere(rng, n)
    if c == 1:  # solid ball
        return 0.95 * _unit_sphere(rng, n) * u(n)[:, None] ** (1 / 3)
    if c == 2:  # cube surface
        pts = rng.uniform(-0.7, 0.7, (n, 3))
        face = rng.integers(0, 3, n)
        pts[np.arange(n), face] = 0.7 * np.sign(rng.standard_normal(n))
        return pts
    if c == 3:  # cylinder surface
        th = 2 * np.pi * u(n)
        return np.stack([0.5 * np.cos(th), 0.5 * np.sin(th),
                         rng.uniform(-0.8, 0.8, n)], axis=1)
    if c == 4:  # cone surface (apex up)
        h = np.sqrt(u(n))  # area-uniform along the slant
        th = 2 * np.pi * u(n)
        r = 0.6 * h
        return np.stack([r * np.cos(th), r * np.sin(th), 0.9 - 1.6 * h], axis=1)
    if c == 5:  # torus
        th, ph = 2 * np.pi * u(n), 2 * np.pi * u(n)
        w = 0.65 + 0.22 * np.cos(ph)
        return np.stack([w * np.cos(th), w * np.sin(th), 0.22 * np.sin(ph)], axis=1)
    if c == 6:  # two disjoint spheres
        side = np.where(u(n) < 0.5, 1.0, -1.0)
        pts = 0.42 * _unit_sphere(rng, n)
        pts[:, 0] += 0.55 * side
        return pts
    if c == 7:  # flat disk
        r, th = np.sqrt(u(n)), 2 * np.pi * u(n)
        return np.stack([0.9 * r * np.cos(th), 0.9 * r * np.sin(th),
                         0.02 * rng.standard_normal(n)], axis=1)
    if c == 8:  # thin rod
        return np.stack([0.04 * rng.standard_normal(n),
                         0.04 * rng.standard_normal(n),
                         rng.uniform(-0.95, 0.95, n)], axis=1)
    if c == 9:  # helix, 3 turns
        t = u(n)
        return np.stack([0.55 * np.cos(6 * np.pi * t), 0.55 * np.sin(6 * np.pi * t),
                         1.7 * t - 0.85], axis=1) + 0.02 * rng.standard_normal((n, 3))
    if c == 10:  # cross of 3 orthogonal rods
        axis = rng.integers(0, 3, n)
        pts = 0.04 * rng.standard_normal((n, 3))
        pts[np.arange(n), axis] = rng.uniform(-0.9, 0.9, n)
        return pts
    if c == 11:  # concentric double shell
        r = np.where(u(n) < 0.5, 0.45, 0.9)
        return r[:, None] * _unit_sphere(rng, n)
    if c == 12:  # hemisphere bowl
        v = _unit_sphere(rng, n)
        v[:, 2] = np.abs(v[:, 2])
        return 0.85 * v
    if c == 13:  # tetrahedron wireframe
        verts = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]],
                         np.float64) * 0.6
        edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        e = rng.integers(0, 6, n)
        t = u(n)[:, None]
        a = verts[[edges[i][0] for i in e]]
        b = verts[[edges[i][1] for i in e]]
        return a + t * (b - a) + 0.02 * rng.standard_normal((n, 3))
    if c == 14:  # four small balls at tetrahedron vertices
        verts = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]],
                         np.float64) * 0.55
        which = rng.integers(0, 4, n)
        return verts[which] + 0.18 * _unit_sphere(rng, n) * u(n)[:, None] ** (1 / 3)
    raise ValueError(f"class {c} out of range (0-14)")


def make_shape_clouds(
    num_samples: int,
    num_points: int = 1024,
    num_classes: int = 15,
    seed: int = 0,
    *,
    rotate: bool = True,
    noise_frac: float = 0.08,
    jitter: float = 0.01,
) -> tuple[np.ndarray, np.ndarray]:
    """Rotation-robust class-separable clouds for accuracy instruments.

    :func:`make_clouds`' classes are fixed ellipsoid-mixture *layouts*, so a
    random per-cloud SO(3) rotation (the realistic evaluation condition)
    destroys most of the class signal — full-size APF plateaus near 29 % on
    the rotated variant, a regime where few-point accuracy regressions
    drown in seed noise (round-2 verdict). These classes are geometric
    *primitives* that differ in intrinsic/radial structure (shells, balls,
    surfaces, curves, disconnected components), so they remain separable
    under rotation and full-size models reach the sensitive ≥70 % band.

    Each cloud: class primitive → per-point Gaussian jitter → ``noise_frac``
    of points replaced by uniform outliers → random SO(3) rotation.
    """
    if not 1 <= num_classes <= 15:
        raise ValueError("num_classes must be in [1, 15]")
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, num_samples)
    clouds = np.empty((num_samples, num_points, 3), dtype=np.float32)
    for i, c in enumerate(labels):
        pts = _shape_points(int(c), num_points, rng)
        pts = pts + jitter * rng.standard_normal((num_points, 3))
        k = int(noise_frac * num_points)
        if k:
            idx = rng.choice(num_points, k, replace=False)
            pts[idx] = rng.uniform(-1.0, 1.0, (k, 3))
        if rotate:
            # uniform SO(3) via QR of a Gaussian matrix
            q, r = np.linalg.qr(rng.standard_normal((3, 3)))
            q *= np.sign(np.diag(r))
            if np.linalg.det(q) < 0:
                q[:, 0] = -q[:, 0]
            pts = pts @ q
        clouds[i] = pts.astype(np.float32)
    return clouds, labels.astype(np.int64)


def write_scanobjectnn_h5(
    root_dir: str,
    variant: str = "main_split",
    augmentation: str = "base",
    background: bool = True,
    num_train: int = 64,
    num_test: int = 32,
    num_points: int = 2048,
    num_classes: int = 15,
    seed: int = 0,
) -> str:
    """Create a synthetic ScanObjectNN tree under ``root_dir`` and return it."""
    import h5py

    dir_name = variant if background else variant + "_nobg"
    os.makedirs(os.path.join(root_dir, dir_name), exist_ok=True)
    suffix = "" if augmentation == "base" else f"_{augmentation}"
    for split, n, s in (("training", num_train, seed), ("test", num_test, seed + 1)):
        data, labels = make_clouds(n, num_points, num_classes, seed=s)
        path = os.path.join(root_dir, dir_name, f"{split}_objectdataset{suffix}.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset("data", data=data)
            f.create_dataset("label", data=labels)
    return root_dir


def write_modelnet40_h5(
    root_dir: str,
    num_train: int = 128,
    num_test: int = 64,
    num_points: int = 2048,
    seed: int = 0,
) -> str:
    """Create a synthetic modelnet40_ply_hdf5_2048-layout tree."""
    import h5py

    os.makedirs(root_dir, exist_ok=True)
    for tag, n, s in (("train", num_train, seed), ("test", num_test, seed + 1)):
        data, labels = make_clouds(n, num_points, num_classes=40, seed=s)
        with h5py.File(os.path.join(root_dir, f"ply_data_{tag}0.h5"), "w") as f:
            f.create_dataset("data", data=data)
            f.create_dataset("label", data=labels)
    return root_dir
