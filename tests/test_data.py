"""Data-layer tests: augment semantics, dataset loading matrix, loaders."""

import os

import numpy as np
import pytest

from pointvit_tpu.data import (
    Loader,
    ModelNet40,
    ScanObjectNN,
    center_and_normalize_point_cloud,
    drop_and_replace_with_noise,
    normalize_point_cloud,
    random_jitter_point_cloud,
    random_rotate_point_cloud,
    random_scale_point_cloud,
    rotate_point_cloud,
    scale_point_cloud,
)
from pointvit_tpu.data.synthetic import (
    make_clouds,
    write_modelnet40_h5,
    write_scanobjectnn_h5,
)


class TestAugment:
    def test_normalize_unit_sphere(self, rng):
        pts = rng.standard_normal((128, 3)).astype(np.float32) * 7 + 3
        out = normalize_point_cloud(pts)
        np.testing.assert_allclose(out.mean(0), 0, atol=1e-5)
        assert abs(np.max(np.linalg.norm(out, axis=1)) - 1.0) < 1e-5

    def test_rotations_preserve_norms(self, rng):
        g = np.random.default_rng(0)
        pts = rng.standard_normal((64, 3))
        out = random_rotate_point_cloud(pts, rng=g)
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=1), np.linalg.norm(pts, axis=1), rtol=1e-6
        )

    def test_jitter_clipped(self, rng):
        g = np.random.default_rng(0)
        pts = np.zeros((1000, 3))
        out = random_jitter_point_cloud(pts, sigma=1.0, clip=0.05, rng=g)
        assert np.abs(out).max() <= 0.05 + 1e-9

    def test_scale_range(self, rng):
        g = np.random.default_rng(0)
        pts = np.ones((10, 3))
        out = random_scale_point_cloud(pts, 0.8, 1.2, rng=g)
        assert 0.8 <= out[0, 0] <= 1.2

    def test_drop_and_replace_shape_and_bounds(self, rng):
        g = np.random.default_rng(0)
        pts = rng.random((100, 3))
        out = drop_and_replace_with_noise(pts, drop_ratio=0.2, noise_std=0.0, rng=g)
        assert out.shape == pts.shape
        changed = np.any(out != pts, axis=1)
        assert changed.sum() == 20
        # noise_std=0 → replacements inside the bounding box
        assert out.min() >= pts.min() - 1e-9
        assert out.max() <= pts.max() + 1e-9

    def test_dict_pipeline_heights(self, rng):
        pts = rng.standard_normal((64, 3))
        data = {"xyz": pts.copy(), "label": 3}
        g = np.random.default_rng(0)
        data = scale_point_cloud(data, rng=g)
        data = center_and_normalize_point_cloud(data, rng=g)
        data = rotate_point_cloud(data, rng=g)
        assert data["label"] == 3
        assert data["heights"].shape == (64, 1)
        assert data["heights"].min() >= 0  # heights = y - min(y), pre-centring
        # normalized to unit sphere before rotation; rotation preserves norms
        assert abs(np.max(np.linalg.norm(data["xyz"], axis=1)) - 1.0) < 1e-6

    def test_anisotropic_scale_mask(self, rng):
        g = np.random.default_rng(0)
        pts = np.ones((4, 3))
        data = scale_point_cloud(
            {"xyz": pts}, scale_range=(2.0, 2.0), scale_xyz=(True, False, True), rng=g
        )
        np.testing.assert_allclose(data["xyz"][:, 1], 1.0)
        np.testing.assert_allclose(data["xyz"][:, [0, 2]], 2.0)


class TestScanObjectNN:
    @pytest.fixture(scope="class")
    def root(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("sonn"))
        write_scanobjectnn_h5(root, num_train=24, num_test=12, num_points=256)
        write_scanobjectnn_h5(root, background=False, num_train=24, num_test=12, num_points=256)
        write_scanobjectnn_h5(
            root, augmentation="augmentedrot_scale75", num_train=24, num_test=12, num_points=256
        )
        return root

    def test_basic_load(self, root):
        ds = ScanObjectNN(root, split="training")
        assert len(ds) == 24
        pts, label = ds[0]
        assert pts.shape == (256, 3)
        assert 0 <= label < 15

    def test_nobg_variant_path(self, root):
        ds = ScanObjectNN(root, split="test", background=False)
        assert len(ds) == 12

    def test_augmentation_variant_path(self, root):
        ds = ScanObjectNN(root, augmentation="augmentedrot_scale75")
        assert len(ds) == 24

    def test_missing_file_raises(self, root):
        with pytest.raises(FileNotFoundError):
            ScanObjectNN(root, variant="split3")

    def test_sampling_methods(self, root):
        for method, n in (("first", 64), ("random", 64), ("first", 512)):
            ds = ScanObjectNN(root, num_points=n, sampling_method=method)
            pts, _ = ds[0]
            assert pts.shape == (n, 3)  # pads with replacement when too few

    def test_fps_offline_sampling(self, root):
        ds = ScanObjectNN(root, num_points=64, sampling_method="fps")
        assert ds.data.shape == (24, 64, 3)
        pts, _ = ds[0]
        assert pts.shape == (64, 3)

    def test_height_channel_via_transform(self, root):
        ds = ScanObjectNN(
            root,
            transform=[center_and_normalize_point_cloud],
            use_height=True,
        )
        pts, _ = ds[0]
        assert pts.shape == (256, 4)
        assert pts[:, 3].min() >= 0

    def test_custom_augmentation_training_only(self, root):
        ds_train = ScanObjectNN(
            root, split="training", use_custom_augmentation=True,
            augmentation_probability=0.0, seed=7,
        )
        # p=0 → every augment fires (reference quirk: fires when rand > p).
        raw = ds_train.data[0]
        pts, _ = ds_train[0]
        assert not np.allclose(pts, raw)

        ds_test = ScanObjectNN(
            root, split="test", use_custom_augmentation=True,
            augmentation_probability=0.0,
        )
        raw = ds_test.data[0]
        pts, _ = ds_test[0]
        np.testing.assert_allclose(pts, raw)


class TestModelNet40:
    @pytest.fixture(scope="class")
    def root(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("mn40"))
        write_modelnet40_h5(root, num_train=32, num_test=16, num_points=256)
        return root

    def test_load_and_protocol(self, root):
        ds = ModelNet40(root, split="training", num_points=128)
        assert len(ds) == 32
        pts, label = ds[0]
        assert pts.shape == (128, 3)
        assert 0 <= label < 40

    def test_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            ModelNet40(str(tmp_path))


class TestLoader:
    def test_shapes_and_drop_last(self):
        clouds, labels = make_clouds(10, 32, 5, seed=0)
        ds = list(zip(clouds, labels))
        loader = Loader(ds, batch_size=4, drop_last=True)
        batches = list(loader)
        assert len(batches) == 2 == len(loader)
        assert batches[0][0].shape == (4, 32, 3)
        assert batches[0][1].shape == (4,)

        loader = Loader(ds, batch_size=4, drop_last=False)
        assert [b[0].shape[0] for b in loader] == [4, 4, 2]

    def test_shuffle_deterministic_per_seed(self):
        clouds, labels = make_clouds(16, 8, 4, seed=0)
        ds = list(zip(clouds, np.arange(16)))
        l1 = [b[1] for b in Loader(ds, 4, shuffle=True, seed=3)]
        l2 = [b[1] for b in Loader(ds, 4, shuffle=True, seed=3)]
        np.testing.assert_array_equal(np.concatenate(l1), np.concatenate(l2))
        # different epoch → different order
        loader = Loader(ds, 4, shuffle=True, seed=3)
        e1 = np.concatenate([b[1] for b in loader])
        e2 = np.concatenate([b[1] for b in loader])
        assert not np.array_equal(e1, e2)


class TestDeviceDataset:
    def test_hbm_resident_batches(self):
        from pointvit_tpu.data import DeviceDataset

        clouds, labels = make_clouds(20, 16, 5, seed=0)
        ds = DeviceDataset(clouds, labels)
        batches = list(ds.batches(8, drop_last=True))
        assert len(batches) == 2
        pts, lbl = batches[0]
        assert pts.shape == (8, 16, 3)
        assert lbl.shape == (8,)
        np.testing.assert_allclose(np.asarray(pts), clouds[:8])

    def test_sharded_placement(self):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from pointvit_tpu.data import DeviceDataset

        clouds, labels = make_clouds(16, 8, 4, seed=1)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        ds = DeviceDataset(clouds, labels, sharding=NamedSharding(mesh, P("data")))
        assert len(ds.points.addressable_shards) == 8


def test_newsplit_filename_path(tmp_path):
    # use_newsplit only alters the TEST split of augmentedrot_scale75
    # (scanobjectnn.py:124-127).
    import h5py

    root = str(tmp_path)
    d = os.path.join(root, "main_split")
    os.makedirs(d)
    data, labels = make_clouds(4, 32, 3, seed=0)
    for name in (
        "training_objectdataset_augmentedrot_scale75.h5",
        "test_objectdataset_augmentedrot_scale75_newsplit.h5",
    ):
        with h5py.File(os.path.join(d, name), "w") as f:
            f.create_dataset("data", data=data)
            f.create_dataset("label", data=labels)

    train = ScanObjectNN(root, split="training",
                         augmentation="augmentedrot_scale75", use_newsplit=True)
    test = ScanObjectNN(root, split="test",
                        augmentation="augmentedrot_scale75", use_newsplit=True)
    assert len(train) == 4 and len(test) == 4
    with pytest.raises(FileNotFoundError):
        ScanObjectNN(root, split="test",
                     augmentation="augmentedrot_scale75", use_newsplit=False)


class TestShapeClouds:
    """make_shape_clouds — the parity instrument's corpus
    (scripts/parity_instrument.py): rotation-invariant class signal."""

    def test_shapes_determinism_labels(self):
        from pointvit_tpu.data.synthetic import make_shape_clouds

        a, ya = make_shape_clouds(24, 128, 15, seed=7)
        b, yb = make_shape_clouds(24, 128, 15, seed=7)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(ya, yb)
        assert a.shape == (24, 128, 3) and a.dtype == np.float32
        assert ya.min() >= 0 and ya.max() < 15

    def test_all_classes_generate(self):
        from pointvit_tpu.data.synthetic import _shape_points

        rng = np.random.default_rng(0)
        for c in range(15):
            pts = _shape_points(c, 64, rng)
            assert pts.shape == (64, 3)
            assert np.isfinite(pts).all()
            assert np.abs(pts).max() < 1.6

    def test_rotation_invariant_separability(self):
        """A trivial rotation-invariant probe (radial histogram) must beat
        chance by a wide margin — the property the old make_clouds corpus
        lacks under rotation, which capped full-size instrument accuracy
        at ~29 % (round-2 verdict)."""
        from pointvit_tpu.data.synthetic import make_shape_clouds

        tr, ytr = make_shape_clouds(300, 256, 15, seed=0)
        te, yte = make_shape_clouds(150, 256, 15, seed=1)

        def feats(x):
            r = np.linalg.norm(x, axis=2)
            return np.stack([
                np.histogram(row, bins=12, range=(0, 1.4), density=True)[0]
                for row in r
            ])

        ftr, fte = feats(tr), feats(te)
        y = np.eye(15)[ytr]
        w = np.linalg.solve(ftr.T @ ftr + 1e-1 * np.eye(12), ftr.T @ y)
        acc = ((fte @ w).argmax(1) == yte).mean()
        assert acc > 0.5, acc  # chance is 1/15
