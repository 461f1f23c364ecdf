"""Serving API tests: family construction, checkpoint restore, padding."""

import numpy as np
import pytest

import jax

from pointvit_tpu.inference import Classifier


def _tiny_apf_config():
    return {
        "num_classes": 15, "in_channels": 3, "embedding_dim": 32,
        "npoint": 8, "nsample": 4, "depth": 1, "num_heads": 4,
    }


def test_apf_classifier_predict_shapes(rng):
    clf = Classifier.for_family(
        "apf", _tiny_apf_config(), example_points=64, batch_size=4, bf16=False
    )
    clouds = rng.standard_normal((6, 64, 3)).astype(np.float32)
    labels = clf.predict(clouds)  # 6 clouds through batch-size-4 program
    assert labels.shape == (6,)
    probs = clf.predict_proba(clouds)
    assert probs.shape == (6, 15)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    # padding must not change results vs one-shot batch
    l2 = clf.predict(clouds[:3])
    np.testing.assert_array_equal(labels[:3], l2)


def test_pix4point_classifier(rng):
    clf = Classifier.for_family(
        "pix4point",
        {"num_classes": 15, "embed_dim": 32, "depth": 1, "num_heads": 4,
         "k_neighbors": 4, "pretrained_model": "vit_small_patch16_384"},
        example_points=64, batch_size=2, bf16=False,
    )
    out = clf.predict(rng.standard_normal((2, 64, 3)).astype(np.float32))
    assert out.shape == (2,)


def test_checkpoint_restore(tmp_path, rng):
    from pointvit_tpu.train.checkpoint import save_checkpoint
    from pointvit_tpu.train.trainer import TrainState
    import optax

    cfg = _tiny_apf_config()
    clf = Classifier.for_family("apf", cfg, example_points=64, batch_size=4, bf16=False)
    # perturb params, save as a trainer-style checkpoint, restore via API
    params = jax.tree.map(lambda x: x + 1.0, clf.variables["params"])
    state = TrainState.create(
        apply_fn=None, params=params, tx=optax.sgd(1e-3),
        batch_stats=clf.variables.get("batch_stats", {}),
    )
    path = save_checkpoint(
        str(tmp_path), "model_best.msgpack", epoch=0, state=state,
        accuracy=0.5, model_config=cfg, dataset_config={},
    )
    clf2 = Classifier.for_family(
        "apf", cfg, checkpoint=path, example_points=64, batch_size=4, bf16=False
    )
    a = np.asarray(jax.tree.leaves(clf2.variables["params"])[0])
    b = np.asarray(jax.tree.leaves(params)[0])
    np.testing.assert_allclose(a, b)


def test_reference_checkpoint_restore(tmp_path):
    torch = pytest.importorskip("torch")

    cfg = _tiny_apf_config()
    sd = {"encoder_norm.weight": torch.full((32,), 3.0)}
    path = str(tmp_path / "ref.pt")
    torch.save({"model_state_dict": sd}, path)
    clf = Classifier.for_family(
        "apf", cfg, reference_checkpoint=path, example_points=64,
        batch_size=4, bf16=False,
    )
    np.testing.assert_allclose(
        np.asarray(clf.variables["params"]["encoder_norm"]["scale"]), 3.0
    )


def test_unknown_family():
    with pytest.raises(ValueError):
        Classifier.for_family("bogus", {})


def test_ema_checkpoint_deploys_average(tmp_path):
    """An EMA-trainer checkpoint restores ema_params as the serving weights
    by default; use_ema=False restores the raw params."""
    from pointvit_tpu.train.checkpoint import save_checkpoint
    from pointvit_tpu.train.trainer import TrainState
    import optax

    cfg = _tiny_apf_config()
    clf = Classifier.for_family("apf", cfg, example_points=64, batch_size=4, bf16=False)
    params = jax.tree.map(lambda x: x + 1.0, clf.variables["params"])
    ema = jax.tree.map(lambda x: x + 2.0, clf.variables["params"])
    state = TrainState.create(
        apply_fn=None, params=params, tx=optax.sgd(1e-3),
        batch_stats=clf.variables.get("batch_stats", {}),
    ).replace(ema_params=ema)
    path = save_checkpoint(
        str(tmp_path), "model_best.msgpack", epoch=0, state=state,
        accuracy=0.5, model_config=cfg, dataset_config={},
        async_write=False,
    )
    got_ema = Classifier.for_family(
        "apf", cfg, checkpoint=path, example_points=64, batch_size=4, bf16=False
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(got_ema.variables["params"])[0]),
        np.asarray(jax.tree.leaves(ema)[0]),
    )
    got_raw = Classifier.for_family(
        "apf", cfg, checkpoint=path, example_points=64, batch_size=4,
        bf16=False, use_ema=False,
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(got_raw.variables["params"])[0]),
        np.asarray(jax.tree.leaves(params)[0]),
    )
