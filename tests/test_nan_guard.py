"""Failure detection (`Trainer(nan_guard=...)`).

SURVEY.md §5: the reference has NO failure detection — checkpoint/resume is
its only recovery primitive. The rebuild adds a device-side non-finite-step
guard ("skip": poisoned updates leave params/opt_state/batch_stats untouched,
no per-step host read) and an epoch-level divergence error ("raise"). These
tests inject NaN through the data and pin all three policies.
"""

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pointvit_tpu.train import Trainer, TrainingDivergedError


class _Toy(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        return nn.Dense(4)(x.reshape((x.shape[0], -1)))


def _dataset(n, poison=()):
    rng = np.random.default_rng(0)
    data = []
    for i in range(n):
        pts = rng.normal(size=(8, 3)).astype(np.float32)
        if i in poison:
            pts[0, 0] = np.nan
        data.append((pts, i % 4))
    return data


def _trainer(tmp_path, *, poison=(), epochs=1, **kw):
    return Trainer(
        _Toy(),
        train_dataset=_dataset(32, poison),
        test_dataset=_dataset(8),
        optimizer=optax.adam(1e-3),
        batch_size=8,
        epochs=epochs,
        output_dir=str(tmp_path / "out"),
        save_best=False,
        save_config_snapshot=False,
        prefetch=0,
        **kw,
    )


def test_skip_guards_state_and_counts(tmp_path):
    t = _trainer(tmp_path, poison=(3,), nan_guard="skip")
    before = np.asarray(t.state.params["Dense_0"]["kernel"]).copy()
    acc = t.train()
    # exactly one of the 4 train batches carried the NaN sample
    assert t.nan_skipped_total == 1
    # params moved (3 clean batches applied) and stayed finite
    after = np.asarray(t.state.params["Dense_0"]["kernel"])
    assert np.all(np.isfinite(after)) and not np.array_equal(before, after)
    # the step counter only advanced for applied updates
    assert int(t.state.step) == 3
    # epoch metrics are finite (skipped batch excluded from denominators)
    rows = open(t.metrics_csv_path).read().strip().split("\n")
    train_loss = float(rows[1].split(",")[1])
    assert math.isfinite(train_loss)
    assert math.isfinite(acc)


def test_skip_all_batches_poisoned_keeps_params(tmp_path):
    t = _trainer(tmp_path, poison=range(32), nan_guard="skip")
    before = np.asarray(t.state.params["Dense_0"]["kernel"]).copy()
    t.train()
    assert t.nan_skipped_total == 4
    assert int(t.state.step) == 0
    np.testing.assert_array_equal(
        np.asarray(t.state.params["Dense_0"]["kernel"]), before
    )
    # a fully-diverged epoch must NOT masquerade as loss 0.0 in the CSV
    # (advisor r3): with every step skipped the epoch records NaN
    rows = open(t.metrics_csv_path).read().strip().split("\n")
    assert math.isnan(float(rows[1].split(",")[1]))
    assert math.isnan(float(rows[1].split(",")[2]))


def test_raise_on_divergence(tmp_path):
    t = _trainer(tmp_path, poison=(3,), nan_guard="raise")
    with pytest.raises(TrainingDivergedError, match="epoch 1"):
        t.train()


def test_default_propagates_nan(tmp_path):
    # reference behavior: no guard, the poisoned batch propagates
    t = _trainer(tmp_path, poison=(3,))
    t.train()
    rows = open(t.metrics_csv_path).read().strip().split("\n")
    assert math.isnan(float(rows[1].split(",")[1]))


def test_invalid_policy_rejected(tmp_path):
    with pytest.raises(ValueError, match="nan_guard"):
        _trainer(tmp_path, nan_guard="halt")
