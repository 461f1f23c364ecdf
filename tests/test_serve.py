"""Serving subsystem (pointvit_tpu/serve.py): checkpoint restore, bucket
padding, chunking, mesh data parallelism, and the request micro-batcher.
Also pins the models/factory.py config→model contract the trainers share."""

import os
import threading

import jax
import numpy as np
import pytest

from pointvit_tpu.data.synthetic import write_scanobjectnn_h5
from pointvit_tpu.models.factory import build_model, detect_family
from pointvit_tpu.serve import InferenceSession, MicroBatcher


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
        "batch_size": 8, "save_interval": 100, "epochs": 1, "label_smoothing": 0.3,
        "learning_rate": 5e-4, "weight_decay": 5e-2, "warmup_epochs": 1,
        "warmup_lr_init": 1e-3,
    }
    return model_config, dataset_config, train_config


@pytest.fixture(scope="module")
def apf_checkpoint(tmp_path_factory):
    """Train a tiny APF for one epoch; return (ckpt path, trainer, clouds)."""
    from pointvit_tpu.train import APFTrainer

    tmp = tmp_path_factory.mktemp("serve")
    root = str(tmp / "sonn")
    write_scanobjectnn_h5(
        root, background=False, num_train=16, num_test=8, num_points=128,
        num_classes=15,
    )
    out = str(tmp / "apf_out")
    trainer = APFTrainer(*_tiny_apf_configs(root), output_dir=out)
    trainer.train()
    path = os.path.join(out, "model_best.msgpack")
    assert os.path.exists(path) and os.path.exists(path + ".json")
    rng = np.random.default_rng(3)
    clouds = rng.standard_normal((9, 64, 4)).astype(np.float32)
    return path, trainer, clouds


def test_detect_family():
    assert detect_family({"pretrained_model": "x"}) == "pix4point"
    assert detect_family({"vit_name": "vit_b_16", "num_views": 5}) == "renderer"
    assert detect_family({"in_channels": 4, "vit_name": "t"}) == "apf"
    with pytest.raises(ValueError, match="family"):
        detect_family({"num_classes": 15})


def test_factory_matches_trainer_model(apf_checkpoint):
    """build_model from the sidecar config must be the trainer's exact
    architecture: applying the trainer's params through it reproduces the
    trainer's own logits."""
    path, trainer, clouds = apf_checkpoint
    import json

    cfg = json.load(open(path + ".json"))["model_config"]
    model = build_model(cfg)
    variables = {"params": trainer.state.params}
    if trainer.state.batch_stats:
        variables["batch_stats"] = trainer.state.batch_stats
    got = model.apply(variables, clouds, train=False)
    want = trainer.model.apply(variables, clouds, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_from_checkpoint_matches_trainer_predict(apf_checkpoint):
    path, trainer, clouds = apf_checkpoint
    session = InferenceSession.from_checkpoint(path, buckets=(9,))
    # Compare against the trainer restored from the SAME checkpoint (the
    # live trainer's final-epoch params may differ from the saved best).
    trainer.load_checkpoint(path)
    np.testing.assert_array_equal(session.predict(clouds), trainer.predict(clouds))


def test_bucket_padding_is_invisible(apf_checkpoint):
    """Odd request sizes pad to a bucket without changing any row's logits."""
    path, _, clouds = apf_checkpoint
    session = InferenceSession.from_checkpoint(path, buckets=(4, 16))
    full = session.predict_logits(clouds)  # 9 → bucket 16
    small = session.predict_logits(clouds[:3])  # 3 → bucket 4
    np.testing.assert_allclose(small, full[:3], rtol=1e-5, atol=1e-5)
    assert full.shape == (9, 15)


def test_chunking_beyond_largest_bucket(apf_checkpoint):
    path, _, clouds = apf_checkpoint
    session = InferenceSession.from_checkpoint(path, buckets=(4,))
    got = session.predict_logits(clouds)  # 9 → chunks of 4 (4+4+1→pad)
    ref = InferenceSession.from_checkpoint(path, buckets=(9,)).predict_logits(clouds)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_mesh_data_parallel_matches_single_device(apf_checkpoint):
    path, _, clouds = apf_checkpoint
    from pointvit_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()  # 8 virtual CPU devices (conftest)
    n_dev = int(np.prod(mesh.devices.shape))
    assert n_dev == 8
    sharded = InferenceSession.from_checkpoint(path, mesh=mesh, buckets=(4, 12))
    # buckets round up to mesh multiples
    assert sharded.buckets == (8, 16)
    single = InferenceSession.from_checkpoint(path, buckets=(16,))
    np.testing.assert_allclose(
        sharded.predict_logits(clouds), single.predict_logits(clouds),
        rtol=1e-5, atol=1e-5,
    )


def test_warmup_compiles_every_bucket(apf_checkpoint):
    path, _, clouds = apf_checkpoint
    session = InferenceSession.from_checkpoint(path, buckets=(2, 4))
    session.warmup(clouds[0])
    assert session.predict(clouds[:2]).shape == (2,)


def test_microbatcher_concurrent_submits(apf_checkpoint):
    path, _, clouds = apf_checkpoint
    session = InferenceSession.from_checkpoint(path, buckets=(16,))
    want = session.predict_logits(clouds)
    results = [None] * len(clouds)
    with MicroBatcher(session, max_batch=4, max_delay_ms=20) as mb:
        def worker(i):
            results[i] = mb.submit(clouds[i])

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(clouds))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    for i in range(len(clouds)):
        np.testing.assert_allclose(results[i], want[i], rtol=1e-5, atol=1e-5)


def test_microbatcher_closed_raises(apf_checkpoint):
    path, _, clouds = apf_checkpoint
    session = InferenceSession.from_checkpoint(path, buckets=(4,))
    mb = MicroBatcher(session)
    mb.close()
    with pytest.raises(RuntimeError, match="closed"):
        mb.submit(clouds[0])


def test_from_exported_serves_artifact(apf_checkpoint, tmp_path):
    """InferenceSession.from_exported: the bucket ladder + padding serve a
    StableHLO artifact with no model code, matching the model-backed session."""
    from pointvit_tpu.export import export_forward, save_exported

    path, trainer, clouds = apf_checkpoint
    variables = {"params": trainer.state.params}
    if trainer.state.batch_stats:
        variables["batch_stats"] = trainer.state.batch_stats
    art = str(tmp_path / "apf.stablehlo")
    save_exported(art, export_forward(trainer.model, variables, clouds))

    session = InferenceSession.from_exported(art, buckets=(4, 16))
    ref = InferenceSession.from_checkpoint(path, buckets=(4, 16))
    got = session.predict_logits(clouds)  # 9 clouds: pad to 16
    want = ref.predict_logits(clouds)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert session.predict(clouds).shape == (9,)


def test_export_cli_round_trip(apf_checkpoint, tmp_path):
    """scripts/export_model.py: checkpoint → StableHLO artifact whose logits
    match the live trainer model (no Python model code at load time)."""
    import json
    import subprocess
    import sys

    path, trainer, clouds = apf_checkpoint
    out = str(tmp_path / "apf.stablehlo")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # CPU subprocess (CLAUDE.md)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "export_model.py"),
         "--checkpoint", path, "--out", out, "--points", "64"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=540,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["batch"] == "polymorphic" and info["in_channels"] == 4

    from pointvit_tpu.export import load_exported

    fn = load_exported(out)
    variables = {"params": trainer.state.params}
    if trainer.state.batch_stats:
        variables["batch_stats"] = trainer.state.batch_stats
    ref = trainer.model.apply(variables, clouds, train=False)
    np.testing.assert_allclose(
        np.asarray(fn(clouds)), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
