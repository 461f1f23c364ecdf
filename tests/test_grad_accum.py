"""Gradient accumulation (`Trainer(grad_accum=N)`).

The reference trains single-GPU with one optimizer step per batch
(src/train/apf_trainer.py:255-268); configs that exceed memory simply use a
smaller batch. The rebuild instead microbatches INSIDE the one jit'd step
(a lax.scan — still a single dispatch over the TPU tunnel) and applies the
averaged gradient once, so peak activation memory is one microbatch's worth
while the optimizer trajectory matches the full-batch run exactly for
BN-free models. These tests pin that equivalence, the BatchNorm sequential-
stats convention, rng plumbing, the nan_guard interaction, and the
divisibility validation.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
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


class _ToyBN(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(16)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.Dense(4)(x)


class _ToyDrop(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(16)(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
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


def _trainer(tmp_path, model, *, name, poison=(), **kw):
    return Trainer(
        model,
        train_dataset=_dataset(32, poison),
        test_dataset=_dataset(8),
        optimizer=optax.adam(1e-2),
        batch_size=16,
        epochs=1,
        output_dir=str(tmp_path / name),
        save_best=False,
        save_config_snapshot=False,
        prefetch=0,
        **kw,
    )


def test_accum_matches_full_batch(tmp_path):
    # BN-free, dropout-free model: the averaged microbatch gradient equals
    # the full-batch gradient, so the whole training trajectory must match.
    with jax.default_matmul_precision("highest"):
        t1 = _trainer(tmp_path, _Toy(), name="full")
        t2 = _trainer(tmp_path, _Toy(), name="accum", grad_accum=2)
        t1.train()
        t2.train()
    p1 = jax.tree.leaves(jax.device_get(t1.state.params))
    p2 = jax.tree.leaves(jax.device_get(t2.state.params))
    assert int(t1.state.step) == int(t2.state.step) == 2
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_accum_batchnorm_updates_sequentially(tmp_path):
    t = _trainer(tmp_path, _ToyBN(), name="bn", grad_accum=2)
    before = jax.device_get(t.state.batch_stats)
    acc = t.train()
    after = jax.device_get(t.state.batch_stats)
    # running stats moved (2 sequential microbatch updates per step)
    moved = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after))
    )
    assert moved
    assert np.isfinite(acc)


def test_accum_dropout_rngs_plumbed(tmp_path):
    # Each microbatch folds its index into the dropout key; pin that the
    # step runs and produces finite updated params.
    t = _trainer(tmp_path, _ToyDrop(), name="drop", grad_accum=2)
    t.train()
    assert all(
        np.all(np.isfinite(p))
        for p in jax.tree.leaves(jax.device_get(t.state.params))
    )


def test_accum_nan_guard_skips_whole_step(tmp_path):
    # One poisoned sample lands in one microbatch of the first global batch;
    # the accumulated gradient is non-finite so the WHOLE step is skipped
    # (params/opt_state/step untouched), and the second batch still applies.
    t = _trainer(
        tmp_path, _Toy(), name="guard", poison=(0,), grad_accum=2,
        nan_guard="skip",
    )
    t.train()
    assert t.nan_skipped_total == 1
    assert int(t.state.step) == 1


def test_accum_divisibility_validated(tmp_path):
    with pytest.raises(ValueError, match="grad_accum"):
        _trainer(tmp_path, _Toy(), name="bad0", grad_accum=0)
    with pytest.raises(ValueError, match="divide by grad_accum"):
        _trainer(tmp_path, _Toy(), name="bad3", grad_accum=3)
    # microbatch 16/16 = 1 cannot shard across the 8 virtual devices
    with pytest.raises(ValueError, match="microbatch"):
        _trainer(tmp_path, _Toy(), name="bad16", grad_accum=16)
