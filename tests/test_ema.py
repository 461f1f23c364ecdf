"""EMA weight averaging (`Trainer(ema_decay=...)`).

Beyond-reference capability (the reference keeps only raw weights,
src/train/apf_trainer.py:329-346): an exponential moving average of params
maintained inside the jit'd step, used for test epochs / predict() when
`ema_eval` (default). Pins the exact fold against a manually replayed
average, the d=0 identity, eval/predict routing, checkpoint round-trip
(incl. pre-EMA-file compatibility), and the nan_guard interaction.
"""

import flax.linen as nn
import jax
import numpy as np
import optax
import pytest

from pointvit_tpu.train import Trainer


class _Toy(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = x.reshape((x.shape[0], -1))
        x = nn.tanh(nn.Dense(16)(x))
        return nn.Dense(4)(x)


def _dataset(n, poison=()):
    rng = np.random.default_rng(0)
    data = []
    for i in range(n):
        pts = rng.normal(size=(8, 3)).astype(np.float32)
        if i in poison:
            pts[0, 0] = np.nan
        data.append((pts, i % 4))
    return data


def _trainer(tmp_path, *, name, n=16, poison=(), epochs=1, **kw):
    return Trainer(
        _Toy(),
        train_dataset=_dataset(n, poison),
        test_dataset=_dataset(8),
        optimizer=optax.adam(1e-2),
        batch_size=16,
        epochs=epochs,
        output_dir=str(tmp_path / name),
        save_best=False,
        save_config_snapshot=False,
        prefetch=0,
        **kw,
    )


def test_ema_matches_manual_replay(tmp_path):
    # dataset == one batch per epoch: capture the raw-param trajectory from
    # a no-EMA twin (EMA never feeds back into training), replay the fold
    # host-side, and compare against the EMA trainer's tree.
    d = 0.8
    with jax.default_matmul_precision("highest"):
        ref = _trainer(tmp_path, name="ref")
        expected = jax.tree.map(
            lambda p: np.asarray(p, np.float64), jax.device_get(ref.state.params)
        )
        for _ in range(4):
            ref.epochs = 1
            ref.start_epoch = 0
            ref.train()
            cur = jax.device_get(ref.state.params)
            expected = jax.tree.map(
                lambda e, p: e * d + (1 - d) * np.asarray(p, np.float64),
                expected,
                cur,
            )
        t = _trainer(tmp_path, name="ema", epochs=4, ema_decay=d)
        t.train()
    assert int(t.state.step) == 4
    got = jax.device_get(t.state.ema_params)
    for e, g in zip(jax.tree.leaves(expected), jax.tree.leaves(got)):
        np.testing.assert_allclose(e, g, rtol=1e-4, atol=1e-6)


def test_ema_decay_zero_tracks_params(tmp_path):
    t = _trainer(tmp_path, name="d0", ema_decay=0.0)
    t.train()
    for p, e in zip(
        jax.tree.leaves(jax.device_get(t.state.params)),
        jax.tree.leaves(jax.device_get(t.state.ema_params)),
    ):
        np.testing.assert_array_equal(p, e)


def test_eval_and_predict_use_ema(tmp_path):
    t = _trainer(tmp_path, name="route", ema_decay=0.99)
    t.train()
    # zero out the EMA tree: with ema_eval routing, logits become all-zero
    # and argmax collapses to class 0 regardless of the (trained) params
    t.state = t.state.replace(
        ema_params=jax.tree.map(np.zeros_like, jax.device_get(t.state.params))
    )
    pts = np.stack([x for x, _ in _dataset(16)])
    assert np.all(t.predict(pts) == 0)
    t2 = _trainer(tmp_path, name="noroute", ema_decay=0.99, ema_eval=False)
    t2.train()
    t2.state = t2.state.replace(
        ema_params=jax.tree.map(np.zeros_like, jax.device_get(t2.state.params))
    )
    assert not np.all(t2.predict(pts) == 0)


def test_ema_checkpoint_round_trip(tmp_path):
    t = _trainer(tmp_path, name="save", ema_decay=0.9, save_interval=1)
    t.train()
    import os

    path = os.path.join(t.output_dir, "model_epoch_1.msgpack")
    assert os.path.exists(path)
    t2 = _trainer(tmp_path, name="load", ema_decay=0.9)
    t2.load_checkpoint(path)
    for a, b in zip(
        jax.tree.leaves(jax.device_get(t.state.ema_params)),
        jax.tree.leaves(jax.device_get(t2.state.ema_params)),
    ):
        np.testing.assert_array_equal(a, b)
    # EMA and raw params genuinely differ after training (decay 0.9)
    diff = any(
        not np.array_equal(a, b)
        for a, b in zip(
            jax.tree.leaves(jax.device_get(t.state.params)),
            jax.tree.leaves(jax.device_get(t.state.ema_params)),
        )
    )
    assert diff


def test_pre_ema_checkpoint_seeds_from_params(tmp_path):
    # a checkpoint written WITHOUT ema loads into an EMA trainer: the
    # average seeds from the restored params
    t = _trainer(tmp_path, name="plain", save_interval=1)
    t.train()
    import os

    path = os.path.join(t.output_dir, "model_epoch_1.msgpack")
    t2 = _trainer(tmp_path, name="ema_resume", ema_decay=0.9)
    t2.load_checkpoint(path)
    for a, b in zip(
        jax.tree.leaves(jax.device_get(t2.state.params)),
        jax.tree.leaves(jax.device_get(t2.state.ema_params)),
    ):
        np.testing.assert_array_equal(a, b)
    # and the reverse: an EMA checkpoint loads into a plain trainer
    t3 = _trainer(tmp_path, name="ema_save", ema_decay=0.9, save_interval=1)
    t3.train()
    p3 = os.path.join(t3.output_dir, "model_epoch_1.msgpack")
    t4 = _trainer(tmp_path, name="plain_resume")
    t4.load_checkpoint(p3)
    assert t4.state.ema_params is None


def test_ema_skipped_step_leaves_average(tmp_path):
    t = _trainer(
        tmp_path, name="guard", n=32, poison=(0,), ema_decay=0.9,
        nan_guard="skip",
    )
    before = jax.device_get(t.state.ema_params)
    t.train()
    assert t.nan_skipped_total == 1
    after = jax.device_get(t.state.ema_params)
    assert all(
        np.all(np.isfinite(x)) for x in jax.tree.leaves(after)
    )
    # one of two batches applied: the average moved exactly once
    moved = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after))
    )
    assert moved


def test_invalid_decay_rejected(tmp_path):
    with pytest.raises(ValueError, match="ema_decay"):
        _trainer(tmp_path, name="bad", ema_decay=1.0)


class _ToyBN(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(16)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.Dense(4)(x)


def test_replace_params_reseeds_ema(tmp_path):
    # pretrained loads go through replace_params; the EMA (and its stats)
    # must re-seed from the new weights, not stay on the random init
    t = _trainer(tmp_path, name="reseed", ema_decay=0.999)
    new = jax.tree.map(lambda x: np.asarray(x) + 5.0, jax.device_get(t.state.params))
    t.replace_params(new)
    for p, e in zip(
        jax.tree.leaves(new), jax.tree.leaves(jax.device_get(t.state.ema_params))
    ):
        np.testing.assert_allclose(p, e)


def test_ema_averages_batch_stats_and_eval_uses_them(tmp_path):
    d = 0.9
    t = Trainer(
        _ToyBN(),
        train_dataset=_dataset(32), test_dataset=_dataset(8),
        optimizer=optax.adam(1e-2), batch_size=16, epochs=2,
        output_dir=str(tmp_path / "bn"), save_best=False,
        save_config_snapshot=False, prefetch=0, ema_decay=d,
    )
    t.train()
    raw_bs = jax.device_get(t.state.batch_stats)
    ema_bs = jax.device_get(t.state.ema_batch_stats)
    # the averaged stats lag the raw running stats (both moved, not equal)
    leaves_raw = jax.tree.leaves(raw_bs)
    leaves_ema = jax.tree.leaves(ema_bs)
    assert leaves_ema and any(
        not np.array_equal(a, b) for a, b in zip(leaves_raw, leaves_ema)
    )
    assert all(np.all(np.isfinite(x)) for x in leaves_ema)
    # eval routes the averaged stats: zeroing them changes predictions
    pts = np.stack([x for x, _ in _dataset(16)])
    before = t.predict(pts)
    t.state = t.state.replace(
        ema_batch_stats=jax.tree.map(
            lambda x: np.full_like(x, 7.0), ema_bs
        )
    )
    after = t.predict(pts)
    assert not np.array_equal(before, after)


def test_ema_trees_are_f32(tmp_path):
    t = _trainer(tmp_path, name="f32", ema_decay=0.9)
    t.train()
    for e in jax.tree.leaves(jax.device_get(t.state.ema_params)):
        assert e.dtype == np.float32
