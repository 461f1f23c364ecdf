"""Trainer tests: schedules, optimizer masking, end-to-end smoke training of
all three families on synthetic data, checkpointing, and 8-device sharding."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointvit_tpu.train.schedules import (
    cosine_annealing_schedule,
    timm_cosine_schedule,
    warmup_then_cosine_schedule,
)
from pointvit_tpu.data.synthetic import write_scanobjectnn_h5


class TestSchedules:
    def test_timm_cosine(self):
        s = timm_cosine_schedule(5e-4, epochs=100, steps_per_epoch=10,
                                 warmup_epochs=10, warmup_lr_init=1e-3)
        # epoch 0 → warmup_lr_init
        assert float(s(0)) == pytest.approx(1e-3)
        # warmup interpolates linearly per epoch (here downward: 1e-3 → 5e-4)
        assert float(s(5 * 10)) == pytest.approx(1e-3 + 5 * (5e-4 - 1e-3) / 10)
        # after warmup: cosine over full horizon
        t = 50
        expected = 0.5 * 5e-4 * (1 + np.cos(np.pi * t / 100))
        assert float(s(t * 10)) == pytest.approx(expected, rel=1e-5)
        # constant within an epoch
        assert float(s(503)) == float(s(509))

    def test_warmup_then_cosine(self):
        s = warmup_then_cosine_schedule(5e-4, steps_per_epoch=7,
                                        warmup_epochs=10, t_max=100, min_lr=1e-6)
        assert float(s(0)) == pytest.approx(5e-4 / 10)
        assert float(s(9 * 7)) == pytest.approx(5e-4)
        # milestone: cosine starts at base
        assert float(s(10 * 7)) == pytest.approx(5e-4)
        t = 50
        expected = 1e-6 + 0.5 * (5e-4 - 1e-6) * (1 + np.cos(np.pi * t / 100))
        assert float(s((10 + t) * 7)) == pytest.approx(expected, rel=1e-5)
        # clamped at t_max
        assert float(s((10 + 100) * 7)) == pytest.approx(1e-6, abs=1e-9)
        assert float(s((10 + 150) * 7)) == pytest.approx(1e-6, abs=1e-9)

    def test_cosine_annealing(self):
        s = cosine_annealing_schedule(1e-3, epochs=100, steps_per_epoch=3, min_lr=1e-6)
        assert float(s(0)) == pytest.approx(1e-3)
        assert float(s(50 * 3)) == pytest.approx(1e-6 + 0.5 * (1e-3 - 1e-6), rel=1e-4)


@pytest.fixture(scope="module")
def sonn_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sonn_train"))
    write_scanobjectnn_h5(root, num_train=32, num_test=16, num_points=128, num_classes=15)
    write_scanobjectnn_h5(
        root, background=False, num_train=32, num_test=16, num_points=128, num_classes=15
    )
    return root


def _tiny_apf_configs(root):
    model_config = {
        "num_classes": 15, "in_channels": 4, "vit_name": "vit_base_patch16_224",
        "pretrained": False, "embedding_dim": 32, "npoint": 16, "nsample": 8,
        "dropout_rate": 0.1, "dropout_path_rate": 0.1, "depth": 2, "num_heads": 4,
        "bf16": False,
    }
    dataset_config = {
        "root_dir": root, "variant": "main_split", "augmentation": "base",
        "background": False, "use_newsplit": False, "train_num_points": 64,
        "test_num_points": 64, "sampling_method": "fps", "use_height": True,
    }
    train_config = {
        "batch_size": 8, "save_interval": 2, "epochs": 2, "label_smoothing": 0.3,
        "learning_rate": 5e-4, "weight_decay": 5e-2, "warmup_epochs": 1,
        "warmup_lr_init": 1e-3,
    }
    return model_config, dataset_config, train_config


class TestAPFTrainer:
    def test_end_to_end(self, sonn_root, tmp_path):
        from pointvit_tpu.train import APFTrainer

        out = str(tmp_path / "apf_out")
        trainer = APFTrainer(*_tiny_apf_configs(sonn_root), output_dir=out)
        best = trainer.train()
        assert 0.0 <= best <= 1.0

        # CSV with LR column, config snapshot, best + interval checkpoints.
        csv_path = os.path.join(out, "training_metrics.csv")
        lines = open(csv_path).read().strip().split("\n")
        assert lines[0] == "epoch,train_loss,train_accuracy,test_loss,test_accuracy,learning_rate"
        assert len(lines) == 3
        assert glob.glob(os.path.join(out, "experiment_config_*.txt"))
        assert os.path.exists(os.path.join(out, "model_best.msgpack"))
        assert os.path.exists(os.path.join(out, "model_epoch_2.msgpack"))

        # Frozen trunk params must not move; head params must.
        params = trainer.state.params
        trainer2 = APFTrainer(*_tiny_apf_configs(sonn_root), output_dir=str(tmp_path / "x"))
        fresh = trainer2.state.params
        same_qkv = np.allclose(
            np.asarray(params["blocks_0"]["attention"]["qkv"]["kernel"]),
            np.asarray(fresh["blocks_0"]["attention"]["qkv"]["kernel"]),
        )
        assert same_qkv  # same seed init + frozen → unchanged by training

    def test_kill_and_resume_continuous_csv(self, sonn_root, tmp_path):
        """Kill-and-resume: a fresh process restoring an interval checkpoint
        continues from the next epoch, appends to (not truncates) the CSV,
        and keeps the optimizer step counter running."""
        from pointvit_tpu.train import APFTrainer

        out = str(tmp_path / "apf_resume")
        mc, dc, tc = _tiny_apf_configs(sonn_root)
        tc = {**tc, "epochs": 2, "save_interval": 1}
        trainer = APFTrainer(mc, dc, tc, output_dir=out)
        trainer.train()
        csv_path = os.path.join(out, "training_metrics.csv")
        rows = open(csv_path).read().strip().split("\n")
        assert [r.split(",")[0] for r in rows[1:]] == ["1", "2"]
        step_after_2 = int(trainer.state.step)

        # "new process": fresh trainer on the same output dir + restore
        trainer2 = APFTrainer(mc, dc, {**tc, "epochs": 3}, output_dir=out)
        # construction alone must not clobber the history
        assert open(csv_path).read().strip().split("\n") == rows
        trainer2.load_checkpoint(os.path.join(out, "model_epoch_2.msgpack"))
        assert trainer2.start_epoch == 2
        assert int(trainer2.state.step) == step_after_2
        trainer2.train()

        rows2 = open(csv_path).read().strip().split("\n")
        assert [r.split(",")[0] for r in rows2[1:]] == ["1", "2", "3"]
        assert rows2[1:3] == rows[1:3]  # history preserved verbatim
        assert int(trainer2.state.step) == step_after_2 + step_after_2 // 2

    def test_checkpoint_roundtrip(self, sonn_root, tmp_path):
        from pointvit_tpu.train import APFTrainer

        out = str(tmp_path / "apf_ck")
        mc, dc, tc = _tiny_apf_configs(sonn_root)
        tc = {**tc, "epochs": 1}
        trainer = APFTrainer(mc, dc, tc, output_dir=out)
        trainer.train()
        path = os.path.join(out, "model_best.msgpack")
        before = np.asarray(trainer.state.params["head"]["out"]["kernel"]).copy()
        trainer.load_checkpoint(path)
        after = np.asarray(trainer.state.params["head"]["out"]["kernel"])
        np.testing.assert_allclose(before, after)


class TestPix4PointTrainer:
    def test_end_to_end(self, sonn_root, tmp_path):
        from pointvit_tpu.train import Pix4PointTrainer

        out = str(tmp_path / "p4p_out")
        model_config = {
            "model_name": "Pix4Point", "num_classes": 15,
            "pretrained_model": "vit_small_patch16_384", "pretrained": False,
            "frozen": False, "k_neighbors": 4, "embed_dim": 32,
            "depth": 2, "num_heads": 4, "bf16": False,
        }
        dataset_config = {
            "root_dir": sonn_root, "variant": "main_split", "augmentation": "base",
            "num_points": 64, "normalize": True, "sampling_method": "all",
            "use_custom_augmentation": True,
        }
        train_config = {
            "batch_size": 8, "learning_rate": 5e-4, "weight_decay": 5e-2,
            "save_interval": 10, "epochs": 2, "t_max": 2, "warmup_epochs": 1,
            "min_lr": 1e-6, "grad_norm_clip": 10,
        }
        trainer = Pix4PointTrainer(model_config, dataset_config, train_config, output_dir=out)
        best = trainer.train()
        assert 0.0 <= best <= 1.0
        lines = open(os.path.join(out, "training_metrics.csv")).read().strip().split("\n")
        assert lines[0] == "epoch,train_loss,train_accuracy,test_loss,test_accuracy"
        # Reference semantics: the best checkpoint is written only when test
        # accuracy improves over 0 (pix4point_trainer.py:142-144).
        if best > 0:
            assert os.path.exists(os.path.join(out, "best_model.msgpack"))


class TestRendererTrainer:
    @pytest.mark.parametrize("diff", [False, True])
    def test_end_to_end(self, sonn_root, tmp_path, diff):
        from pointvit_tpu.models import renderer as rmod
        from pointvit_tpu.train import RendererTrainer

        rmod.TORCHVISION_VIT_PRESETS["vit_test"] = dict(
            patch_size=8, embed_dim=32, depth=1, num_heads=4
        )
        out = str(tmp_path / f"rend_{diff}")
        model_config = {
            "num_classes": 15, "vit_name": "vit_test", "adapter_dim": 8,
            "num_views": 2, "img_size": 32, "pretrained": False,
            "dropout_rate": 0.1, "diff_renderer": diff,
            "view_transform_hidden": 16, "bf16": False,
        }
        dataset_config = {
            "root_dir": sonn_root, "variant": "main_split", "augmentation": "base",
            "num_points": 64, "normalize": True, "sampling_method": "all",
            "use_custom_augmentation": False,
        }
        train_config = {
            "batch_size": 8, "min_lr": 1e-6, "learning_rate": 5e-4,
            "weight_decay": 5e-2, "save_interval": 5, "epochs": 1,
            "use_lr_scheduler": True, "clip_grad_norm": 0.0,
            "save_views_interval": 1,
        }
        trainer = RendererTrainer(model_config, dataset_config, train_config, output_dir=out)
        best = trainer.train()
        assert 0.0 <= best <= 1.0
        # rendered-view observability PNG
        assert glob.glob(os.path.join(out, "rendered_views", "test_views_epoch_*.png"))
        if diff:
            pts, _ = trainer.test_dataset[0]
            az, el = trainer.get_predicted_views(pts[None])
            assert az.shape == (1, 2)


class TestSharding:
    def test_batch_sharded_over_8_devices(self, sonn_root, tmp_path):
        from pointvit_tpu.train import APFTrainer

        assert jax.device_count() == 8  # conftest virtual CPU mesh
        mc, dc, tc = _tiny_apf_configs(sonn_root)
        tc = {**tc, "epochs": 1, "batch_size": 16}
        trainer = APFTrainer(mc, dc, tc, output_dir=str(tmp_path / "shard"))
        assert trainer.mesh.devices.size == 8
        # Params replicated; batches sharded on axis 0.
        kernel = trainer.state.params["head"]["out"]["kernel"]
        assert kernel.sharding.is_fully_replicated
        pts, lbl = trainer._shard(
            np.zeros((16, 64, 4), np.float32), np.zeros((16,), np.int64)
        )
        assert not pts.sharding.is_fully_replicated
        assert pts.sharding.spec[0] == "data"
        trainer.train()  # one epoch across the mesh

    def test_indivisible_batch_raises(self, sonn_root, tmp_path):
        from pointvit_tpu.train import APFTrainer

        mc, dc, tc = _tiny_apf_configs(sonn_root)
        tc = {**tc, "batch_size": 9}
        with pytest.raises(ValueError):
            APFTrainer(mc, dc, tc, output_dir=str(tmp_path / "bad"))


class TestNativePipeline:
    def test_fastloader_shapes_and_heights(self, sonn_root):
        from pointvit_tpu.data import BatchAugmenter, FastLoader, ScanObjectNN

        ds = ScanObjectNN(sonn_root, num_points=64, sampling_method="fps")
        loader = FastLoader.for_dataset(
            ds, 8, BatchAugmenter(apf_transforms=True), use_height=True,
            shuffle=True, drop_last=True,
        )
        points, labels = next(iter(loader))
        assert points.shape == (8, 64, 4)  # xyz + heights channel
        assert points[..., 3].min() >= 0
        assert labels.shape == (8,)

    def test_apf_trainer_uses_native_loader(self, sonn_root, tmp_path):
        from pointvit_tpu.data import native_available
        from pointvit_tpu.data.loader import FastLoader
        from pointvit_tpu.train import APFTrainer

        if not native_available():
            pytest.skip("no C++ toolchain")
        trainer = APFTrainer(*_tiny_apf_configs(sonn_root), output_dir=str(tmp_path / "n"))
        assert isinstance(trainer.train_loader, FastLoader)
        # and training still runs
        tc = trainer.train_config
        trainer.epochs = 1
        best = trainer.train()
        assert 0.0 <= best <= 1.0

    def test_native_pipeline_disable_flag(self, sonn_root, tmp_path):
        from pointvit_tpu.data.loader import Loader
        from pointvit_tpu.train import APFTrainer

        mc, dc, tc = _tiny_apf_configs(sonn_root)
        tc = {**tc, "native_pipeline": False}
        trainer = APFTrainer(mc, dc, tc, output_dir=str(tmp_path / "p"))
        assert isinstance(trainer.train_loader, Loader)


class TestModelNet40Trainer:
    def test_apf_on_modelnet40(self, tmp_path):
        from pointvit_tpu.data.synthetic import write_modelnet40_h5
        from pointvit_tpu.train import APFTrainer

        root = str(tmp_path / "mn40")
        write_modelnet40_h5(root, num_train=32, num_test=16, num_points=128)
        model_config = {
            "num_classes": 40, "in_channels": 4, "vit_name": "vit_base_patch16_224",
            "pretrained": False, "embedding_dim": 32, "npoint": 16, "nsample": 8,
            "depth": 1, "num_heads": 4, "bf16": False,
        }
        dataset_config = {
            "dataset": "modelnet40", "root_dir": root,
            "train_num_points": 64, "test_num_points": 64,
            "normalize": True, "use_height": True,
        }
        train_config = {
            "batch_size": 8, "epochs": 1, "learning_rate": 5e-4,
            "weight_decay": 5e-2, "warmup_epochs": 1, "warmup_lr_init": 1e-3,
        }
        trainer = APFTrainer(model_config, dataset_config, train_config,
                             output_dir=str(tmp_path / "out"))
        best = trainer.train()
        assert 0.0 <= best <= 1.0
        # item path consistency: heights channel appended
        pts, _ = trainer.train_dataset[0]
        assert pts.shape == (64, 4)


class TestFastCheckpoint:
    def test_frozen_cache_checkpoint_equals_full_fetch(self, sonn_root, tmp_path):
        """Checkpoints written via the trainable-only fetch must contain the
        exact same params a full device_get would produce — including after
        a params replacement (stale-cache regression test)."""
        from pointvit_tpu.train import APFTrainer
        from pointvit_tpu.train.checkpoint import load_checkpoint

        out = str(tmp_path / "fc")
        mc, dc, tc = _tiny_apf_configs(sonn_root)
        tc = {**tc, "epochs": 1}
        trainer = APFTrainer(mc, dc, tc, output_dir=out)
        assert trainer._frozen_host is not None  # mask wired through

        # replace params wholesale (simulating a pretrained load)
        new_params = jax.tree.map(lambda x: x + 0.5, trainer.state.params)
        trainer.replace_params(new_params)
        trainer.train()

        restored = load_checkpoint(
            os.path.join(out, "model_best.msgpack"), trainer.state
        )
        full = jax.device_get(trainer.state.params)
        for a, b in zip(jax.tree.leaves(restored["params"]), jax.tree.leaves(full)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


class TestPrefetch:
    def test_prefetch_matches_synchronous(self, sonn_root, tmp_path):
        """Background-thread prefetch (default) must be bit-equivalent to the
        synchronous path: same batches, same order, same metrics CSV."""
        from pointvit_tpu.train import APFTrainer

        mc, dc, tc = _tiny_apf_configs(sonn_root)
        out_a = str(tmp_path / "sync")
        out_b = str(tmp_path / "pre")
        APFTrainer(mc, dc, {**tc, "prefetch": 0}, output_dir=out_a).train()
        APFTrainer(mc, dc, {**tc, "prefetch": 3}, output_dir=out_b).train()
        csv_a = open(os.path.join(out_a, "training_metrics.csv")).read()
        csv_b = open(os.path.join(out_b, "training_metrics.csv")).read()
        assert csv_a == csv_b

    def test_prefetcher_propagates_errors(self):
        from pointvit_tpu.data.loader import Prefetcher

        def gen():
            yield (np.zeros(2), np.zeros(2))
            raise RuntimeError("boom")

        it = iter(Prefetcher(gen(), lambda p, l: (p, l, len(l))))
        next(it)
        with pytest.raises(RuntimeError, match="boom"):
            next(it)


def test_save_best_false_skips_best_checkpoint(sonn_root, tmp_path):
    """save_best=False trains normally but writes no best checkpoint (used
    by accuracy instruments: each deferred best-ckpt fetch pins a full
    state copy in HBM over the slow tunnel — observed OOM, CLAUDE.md)."""
    from pointvit_tpu.train import APFTrainer

    mc, dc, tc = _tiny_apf_configs(sonn_root)
    tc = {**tc, "epochs": 1, "save_interval": 0, "save_best": False}
    out = str(tmp_path / "nb")
    trainer = APFTrainer(mc, dc, tc, output_dir=out)
    best = trainer.train()
    assert 0.0 <= best <= 1.0
    assert not os.path.exists(os.path.join(out, "model_best.msgpack"))
    # the metrics CSV is still complete
    lines = open(os.path.join(out, "training_metrics.csv")).read().strip().split("\n")
    assert len(lines) == 2


def test_apf_trainer_serving_preset_and_remat_passthrough(sonn_root, tmp_path):
    """model_config['encoder_second_width'] / ['remat_encoder'] must reach
    the model through the trainer wrapper."""
    from pointvit_tpu.train import APFTrainer

    mc, dc, tc = _tiny_apf_configs(sonn_root)
    mc = {**mc, "encoder_second_width": 32, "remat_encoder": True}
    tc = {**tc, "epochs": 1, "save_interval": 0}
    trainer = APFTrainer(mc, dc, tc, output_dir=str(tmp_path / "sp"))
    enc = trainer.state.params["point_encoder"]
    assert enc["second_0_local"]["kernel"].shape == (32, 32)
    assert trainer.model.remat_encoder is True
    best = trainer.train()
    assert 0.0 <= best <= 1.0
