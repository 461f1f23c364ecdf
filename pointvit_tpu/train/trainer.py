"""One generic jit-compiled trainer for all three model families.

Replaces the reference's three ~90 %-identical trainer classes
(``src/train/{apf,pix4point,renderer}_trainer.py``) with a single engine:

- the *entire* step — tokenization, forward, loss, backward, masked optimizer
  update — is one jit-compiled XLA graph, donated and executed on device;
- data parallelism: a 1-D ``jax.sharding.Mesh`` over all devices, batches
  sharded on axis 0, params replicated; XLA inserts the gradient psum over
  ICI (there is no hand-written collective);
- freezing is an ``optax.multi_transform`` mask (no parameter surgery);
- per-epoch metrics accumulate as device scalars and sync once per epoch
  (the reference syncs per batch via ``.item()``, apf_trainer.py:270);
- CSV metrics, config snapshot, and best/interval checkpoints mirror the
  reference's outputs byte-for-byte in layout (T1–T4 in SURVEY.md §2).

Family-specific wrappers (:mod:`pointvit_tpu.train.apf_trainer` etc.) keep
the reference's config-dict constructor APIs.
"""

from __future__ import annotations

import csv
import json
import math
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from pointvit_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
from pointvit_tpu.train.train_utils import save_configs

__all__ = [
    "TrainState",
    "Trainer",
    "TrainingDivergedError",
    "cross_entropy_loss",
    "build_optimizer",
    "scan_microbatches",
]


class TrainingDivergedError(RuntimeError):
    """Raised by ``Trainer(nan_guard='raise')`` when an epoch's mean train
    loss comes back non-finite. The last written checkpoint is the recovery
    point (SURVEY.md §5: checkpoint/resume is the reference's only recovery
    primitive; the reference itself has no failure detection)."""


class TrainState(train_state.TrainState):
    batch_stats: Any = None
    # Exponential moving averages (None unless Trainer(ema_decay=)). Both
    # trees are stored in f32 regardless of param dtype — a bf16-stored
    # average stagnates (per-step increments below ~2^-9 of the leaf round
    # away at high decay) — and must never alias params' buffers (the
    # donated step wedges the backend on a twice-donated buffer).
    ema_params: Any = None
    ema_batch_stats: Any = None


def _ema_tree(tree):
    """f32, freshly-copied EMA seed of a param/stat tree. Must COPY even
    when the leaf is already f32 (jnp.array copies; jnp.asarray would
    alias and re-create the twice-donated-buffer wedge)."""
    return jax.tree.map(lambda x: jnp.array(x, dtype=jnp.float32), tree)


def scan_microbatches(
    run_micro, batch_stats, points, labels, accum, *, zero_grads, zero_aux
):
    """Shared gradient-accumulation core (Trainer and benchmarks).

    Splits the global (B, ...) batch into ``accum`` microbatches with the
    DP-layout-preserving reshape — (B, ...) → (B/A, A, ...), so row (i, a)
    is global row i·A + a and the shard axis stays axis 0 — and scans
    ``run_micro(stats, pts, lbl, idx) -> (loss, aux, new_stats, grads)``
    over them, summing grads/loss/aux. ``zero_grads``/``zero_aux`` seed the
    accumulators (typically ``tree.map(zeros_like, params)`` and a zero
    scalar). Returns ``(mean_loss, aux_sum, final_stats, mean_grads)``.
    """
    micro = points.shape[0] // accum
    pts_m = jnp.moveaxis(points.reshape(micro, accum, *points.shape[1:]), 1, 0)
    lbl_m = jnp.moveaxis(labels.reshape(micro, accum), 1, 0)

    def body(carry, xs):
        stats, grad_sum, loss_sum, aux_sum = carry
        idx, pts, lbl = xs
        loss, aux, stats, grads = run_micro(stats, pts, lbl, idx)
        grad_sum = jax.tree.map(jnp.add, grad_sum, grads)
        return (stats, grad_sum, loss_sum + loss, aux_sum + aux), None

    (final_stats, grad_sum, loss_sum, aux_sum), _ = jax.lax.scan(
        body,
        (batch_stats, zero_grads, jnp.zeros((), jnp.float32), zero_aux),
        (jnp.arange(accum), pts_m, lbl_m),
    )
    inv = jnp.float32(1.0 / accum)
    grads = jax.tree.map(lambda g: g * inv.astype(g.dtype), grad_sum)
    return loss_sum * inv, aux_sum, final_stats, grads


def cross_entropy_loss(
    logits: jax.Array, labels: jax.Array, label_smoothing: float = 0.0
) -> jax.Array:
    """Per-example CE with torch-style label smoothing: target distribution
    (1-s)·onehot + s/K (apf_trainer.py:166-168)."""
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    if label_smoothing > 0:
        onehot = (1.0 - label_smoothing) * onehot + label_smoothing / num_classes
    return optax.softmax_cross_entropy(logits, onehot)


def build_optimizer(
    schedule: Callable,
    *,
    weight_decay: float,
    grad_clip: float | None = None,
    trainable_mask=None,
    weight_decay_mask=None,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """AdamW with optional global-norm clipping, frozen-param masking, and
    per-param weight-decay exclusion (Pix4Point's no-decay groups,
    pix4point.py:386-401)."""
    chain = []
    if grad_clip is not None and grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(
        optax.adamw(
            schedule,
            b1=betas[0],
            b2=betas[1],
            eps=eps,
            weight_decay=weight_decay,
            mask=weight_decay_mask,
        )
    )
    tx = optax.chain(*chain)
    if trainable_mask is not None:
        tx = optax.multi_transform(
            {True: tx, False: optax.set_to_zero()}, param_labels=trainable_mask
        )
    return tx


class Trainer:
    """Generic trainer engine.

    Args:
        model: a Flax module with ``__call__(points, train=...)`` → logits.
        train_dataset / test_dataset: indexable ``(points, label)`` datasets.
        optimizer: an optax transformation (see :func:`build_optimizer`).
        schedule: step → lr function (logged to the CSV).
        batch_size: global batch size (must divide by the mesh size).
        epochs: total epochs.
        label_smoothing: CE smoothing factor.
        output_dir: metrics/checkpoint directory.
        model_config / dataset_config / train_config: snapshot payloads.
        log_lr: include a learning_rate CSV column (APF trainer behaviour).
        best_filename: checkpoint name on test-accuracy improvement
            ('model_best' for APF, 'best_model' for Pix4Point — reference
            naming preserved).
        save_interval: interval-checkpoint cadence in epochs.
        save_best: write the best checkpoint on improvement (default). Off
            for accuracy instruments: each deferred write pins a full state
            copy in HBM until the (tunnel-slow) fetch drains.
        seed: PRNG seed for init, dropout, FPS starts, and shuffling.
        mesh: optional pre-built device mesh (default: all devices).
        loader_cls: batcher class (default :class:`pointvit_tpu.data.Loader`).
        epoch_hooks: callables ``hook(trainer, epoch)`` run after each epoch
            (the renderer's rendered-view PNG dumps plug in here).
    """

    def __init__(
        self,
        model,
        *,
        train_dataset,
        test_dataset,
        optimizer: optax.GradientTransformation,
        schedule: Callable | None = None,
        batch_size: int,
        epochs: int,
        label_smoothing: float = 0.0,
        output_dir: str = "./output",
        model_config: dict | None = None,
        dataset_config: dict | None = None,
        train_config: dict | None = None,
        log_lr: bool = False,
        best_filename: str = "model_best",
        save_interval: int = 0,
        save_best: bool = True,
        seed: int = 0,
        mesh=None,
        loader_cls=None,
        train_loader=None,
        test_loader=None,
        epoch_hooks: tuple = (),
        save_config_snapshot: bool = True,
        profile_dir: str | None = None,
        trainable_mask=None,
        prefetch: int = 2,
        nan_guard: str | None = None,
        grad_accum: int = 1,
        ema_decay: float | None = None,
        ema_eval: bool = True,
        fsdp: bool = False,
    ) -> None:
        from pointvit_tpu.data.loader import Loader

        self.model = model
        self.train_dataset = train_dataset
        self.test_dataset = test_dataset
        self.optimizer = optimizer
        self.schedule = schedule
        self.batch_size = batch_size
        self.epochs = epochs
        self.label_smoothing = label_smoothing
        self.output_dir = output_dir
        self.model_config = model_config or {}
        self.dataset_config = dataset_config or {}
        self.train_config = train_config or {}
        self.log_lr = log_lr
        self.best_filename = best_filename
        self.save_interval = save_interval
        # save_best=False skips the best-checkpoint write entirely — for
        # accuracy instruments that only need the curve. The deferred
        # checkpoint fetch pins a full params/opt_state copy until the
        # async write drains, and over the remote-TPU tunnel (slow
        # device_get) a run whose accuracy improves every epoch can queue
        # enough pinned copies to exhaust HBM (observed: full-size APF
        # bs256 instrument OOM at epoch 7).
        self.save_best = save_best
        self.epoch_hooks = epoch_hooks
        self.prefetch = prefetch
        # Failure detection (the reference has none — SURVEY.md §5):
        #   None    — non-finite losses propagate (reference behavior);
        #   "skip"  — device-side guard: a step whose loss or grads are
        #             non-finite leaves params/opt_state/batch_stats
        #             untouched (lax select over the state tree — no
        #             per-step host read, which would serialize the host
        #             pipeline and pay the remote-tunnel RTT); skipped
        #             steps are counted and reported per epoch;
        #   "raise" — raise TrainingDivergedError when an epoch's mean
        #             train loss is non-finite (checked at the epoch-end
        #             host read that already happens).
        if nan_guard not in (None, "skip", "raise"):
            raise ValueError(f"nan_guard must be None|'skip'|'raise', got {nan_guard!r}")
        self.nan_guard = nan_guard
        self.nan_skipped_total = 0
        # Polyak/EMA weight averaging (beyond-reference; standard for ViT
        # finetuning): ema' = ema + (1-d)·(p - ema) after each applied step,
        # inside the same jit'd graph. d=0.0 tracks params exactly; frozen
        # params are an exact fixed point (ema starts equal and p never
        # moves), so the checkpoint frozen-leaf cache stays valid for the
        # EMA tree too. With ema_eval (default), test epochs and predict()
        # run on the averaged weights; training always uses the raw params.
        if ema_decay is not None and not (0.0 <= ema_decay < 1.0):
            raise ValueError(f"ema_decay must be in [0, 1), got {ema_decay}")
        self.ema_decay = ema_decay
        self._eval_uses_ema = ema_decay is not None and ema_eval
        self._base_key = jax.random.PRNGKey(seed)

        # FSDP/ZeRO (r5): shard params + optimizer state over the data axis
        # instead of replicating (parallel/fsdp.py). Same jitted step —
        # GSPMD compiles it to gather-on-use + reduce-scatter. The win is
        # per-device state memory (the renderer's vit_l_16 trunk carries
        # ~3.6 GB of replicated f32 params+moments under plain DP).
        self.fsdp = bool(fsdp)
        self.mesh = mesh if mesh is not None else make_mesh()
        n_dev = len(self.mesh.devices.flatten())
        if batch_size % n_dev:
            raise ValueError(
                f"batch_size={batch_size} must divide across {n_dev} devices"
            )
        # Gradient accumulation: split each global batch into `grad_accum`
        # microbatches inside the ONE jit'd step (a lax.scan — still a
        # single dispatch, so no extra tunnel round-trips) and apply the
        # averaged gradient once. Peak activation memory drops to one
        # microbatch's worth because each microbatch's backward completes
        # within its scan iteration — the standard alternative to
        # remat_encoder for configs that OOM at full batch (DESIGN.md:
        # exact APF bs256 is +283 MB over HBM without remat). The
        # reference has no equivalent (single-GPU, per-batch step).
        if grad_accum < 1:
            raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
        if batch_size % grad_accum:
            raise ValueError(
                f"batch_size={batch_size} must divide by grad_accum={grad_accum}"
            )
        if (batch_size // grad_accum) % n_dev:
            raise ValueError(
                f"microbatch size {batch_size // grad_accum} "
                f"(batch_size={batch_size} / grad_accum={grad_accum}) "
                f"must divide across {n_dev} devices"
            )
        self.grad_accum = grad_accum
        self._batch_shard = batch_sharding(self.mesh)

        loader_cls = loader_cls or Loader
        self.train_loader = train_loader if train_loader is not None else loader_cls(
            train_dataset, batch_size, shuffle=True, drop_last=True, seed=seed
        )
        self.test_loader = test_loader if test_loader is not None else loader_cls(
            test_dataset, batch_size, shuffle=False, drop_last=False, seed=seed
        )

        os.makedirs(output_dir, exist_ok=True)
        self.metrics_csv_path = os.path.join(output_dir, "training_metrics.csv")
        if save_config_snapshot:
            save_configs(
                self.model_config,
                self.dataset_config,
                self.train_config,
                output_dir,
                device=str(jax.devices()[0]),
            )

        self.state = self._init_state(seed)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=0)
        self._eval_step = jax.jit(self._eval_step_impl)
        # CSV prep is deferred to train(): a resumed run (construct →
        # load_checkpoint → train) must not truncate the existing history
        # at construction time.
        self.start_epoch = 0
        self.best_acc = 0.0

        from pointvit_tpu.utils.profiling import StepTimer, enable_compilation_cache

        enable_compilation_cache()
        self.profile_dir = profile_dir
        self.step_timer = StepTimer()

        # Frozen params never change (optax.set_to_zero branch), so
        # checkpoints only need to fetch the trainable subset from device —
        # for adapter-style models that's ~10% of the bytes. Cache the
        # frozen leaves host-side once.
        self._trainable_mask = trainable_mask
        self._frozen_host = None
        self._refresh_frozen_cache()

    def _refresh_frozen_cache(self) -> None:
        """(Re)snapshot the frozen param leaves host-side. Must be called
        whenever ``state.params`` is replaced wholesale (pretrained load,
        checkpoint restore) — the cache feeds checkpoint writes."""
        if self._trainable_mask is None:
            return
        flat_params = jax.tree.leaves(self.state.params)
        flat_mask = jax.tree.leaves(self._trainable_mask)
        self._frozen_host = [
            None if m else np.asarray(jax.device_get(p))
            for p, m in zip(flat_params, flat_mask)
        ]

    def replace_params(self, params) -> None:
        """Swap in a new param tree (e.g. pretrained/imported weights),
        keeping the checkpoint frozen-leaf cache consistent and re-seeding
        the EMA from the new weights (an average left on the random init
        would contaminate every ema_eval readout for ~1/(1−d) steps)."""
        self.state = self.state.replace(params=params)
        if self.ema_decay is not None:
            self.state = self.state.replace(
                ema_params=_ema_tree(params),
                ema_batch_stats=_ema_tree(self.state.batch_stats),
            )
        self._refresh_frozen_cache()

    def _host_params(self):
        """Host copy of params; fetches only the trainable subset when a
        trainable mask is known (frozen leaves come from the init-time
        cache — they cannot change, their optimizer branch is set_to_zero)."""
        if self._frozen_host is None:
            return jax.device_get(self.state.params)
        flat_params, treedef = jax.tree.flatten(self.state.params)
        flat_mask = jax.tree.leaves(self._trainable_mask)
        fetched = jax.device_get(
            [p for p, m in zip(flat_params, flat_mask) if m]
        )
        it = iter(fetched)
        merged = [
            next(it) if m else cached
            for m, cached in zip(flat_mask, self._frozen_host)
        ]
        return jax.tree.unflatten(treedef, merged)

    def _checkpoint_fetch_thunk(self):
        """Snapshot the state as donation-safe device-side copies and return
        a thunk that fetches them to host (run later, on the checkpoint
        writer thread). The next train step donates ``self.state``'s buffers,
        so the thunk must not touch the live state — only the copies. Device
        copies ride HBM bandwidth (~ms); the device_get rides the (slow)
        host link and now overlaps with further training."""
        flat_params, treedef = jax.tree.flatten(self.state.params)
        if self._frozen_host is None:
            param_copies = [jnp.copy(p) for p in flat_params]
            flat_mask = None
        else:
            flat_mask = jax.tree.leaves(self._trainable_mask)
            param_copies = [
                jnp.copy(p) if m else None
                for p, m in zip(flat_params, flat_mask)
            ]
        # EMA leaves snapshot the same way; frozen EMA leaves equal the
        # frozen params exactly (fixed point of the update — replace_params
        # re-seeds the average whenever params are swapped wholesale), so
        # the host frozen cache serves both trees, cast to the EMA's f32.
        ema_copies = None
        ebs_copy = None
        if self.ema_decay is not None:
            flat_ema = jax.tree.leaves(self.state.ema_params)
            if flat_mask is None:
                ema_copies = [jnp.copy(p) for p in flat_ema]
            else:
                ema_copies = [
                    jnp.copy(p) if m else None
                    for p, m in zip(flat_ema, flat_mask)
                ]
            ebs_copy = jax.tree.map(jnp.copy, self.state.ema_batch_stats)
        bs_copy = jax.tree.map(jnp.copy, self.state.batch_stats)
        opt_copy = jax.tree.map(
            lambda x: jnp.copy(x) if hasattr(x, "shape") else x,
            self.state.opt_state,
        )
        step_copy = jnp.copy(self.state.step)
        frozen = self._frozen_host

        def _merge(copies, cast=None):
            if flat_mask is None:
                return jax.device_get(copies)
            fetched = jax.device_get([c for c in copies if c is not None])
            it = iter(fetched)
            return [
                next(it)
                if m
                else (cached if cast is None else np.asarray(cached, cast))
                for m, cached in zip(flat_mask, frozen)
            ]

        def fetch():
            payload = {
                "params": jax.tree.unflatten(treedef, _merge(param_copies)),
                "batch_stats": jax.device_get(bs_copy),
                "opt_state": jax.device_get(opt_copy),
                "step": int(step_copy),
            }
            if ema_copies is not None:
                payload["ema_params"] = jax.tree.unflatten(
                    treedef, _merge(ema_copies, np.float32)
                )
                payload["ema_batch_stats"] = jax.device_get(ebs_copy)
            return payload

        return fetch

    # -- initialization ---------------------------------------------------

    def _example_batch(self) -> tuple[jax.Array, jax.Array]:
        points, label = self.train_dataset[0]
        points = jnp.asarray(points)[None].repeat(self.batch_size, axis=0)
        labels = jnp.full((self.batch_size,), label, dtype=jnp.int32)
        return points, labels

    def _init_state(self, seed: int) -> TrainState:
        points, _ = self._example_batch()
        init_keys = {"params": jax.random.fold_in(self._base_key, 0)}
        variables = self.model.init(init_keys, points[:1])
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        state = TrainState.create(
            apply_fn=self.model.apply,
            params=params,
            tx=self.optimizer,
            batch_stats=batch_stats,
        )
        if self.ema_decay is not None:
            # f32 copies, NOT aliases of params: the train step donates the
            # whole state, and a twice-donated buffer wedges the backend
            # (observed as a stuck XLA:CPU collective). batch_stats are
            # averaged alongside so EMA eval pairs the averaged weights
            # with matching normalization statistics.
            state = state.replace(
                ema_params=_ema_tree(params),
                ema_batch_stats=_ema_tree(batch_stats),
            )
        return self._place_state(state)

    def _place_state(self, state):
        """Device placement policy: replicate (DP) or shard params + opt
        state over the data axis (FSDP/ZeRO, ``fsdp=True``)."""
        if not self.fsdp:
            return replicate(state, self.mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pointvit_tpu.parallel.fsdp import shard_fsdp

        repl = NamedSharding(self.mesh, P())

        def maybe_shard(tree):
            return shard_fsdp(tree, self.mesh) if tree is not None else None

        return state.replace(
            params=maybe_shard(state.params),
            opt_state=maybe_shard(state.opt_state),
            ema_params=maybe_shard(state.ema_params),
            # the shape rule gives EMA trees their param's exact layout, so
            # the in-step EMA fold stays collective-free
            ema_batch_stats=(
                jax.device_put(state.ema_batch_stats, repl)
                if state.ema_batch_stats is not None else None
            ),
            batch_stats=jax.device_put(state.batch_stats, repl),
            step=jax.device_put(state.step, repl),
        )

    # -- steps ------------------------------------------------------------

    def _apply_train(self, params, batch_stats, points, rngs):
        # MoE trunks (models with moe_experts > 0, e.g. Pix4Point's
        # beyond-reference capacity option) sow their router load-balance
        # losses under intermediates/aux_loss — collect them here so the
        # train step can weight them into the loss (train_config key
        # "moe_aux_weight", default 0.01). Non-MoE models keep the exact
        # pre-existing apply signature.
        moe = bool(getattr(self.model, "moe_experts", 0))
        mutable = (["batch_stats"] if batch_stats else []) + (
            ["intermediates"] if moe else []
        )
        if mutable:
            logits, updated = self.model.apply(
                {"params": params, "batch_stats": batch_stats}
                if batch_stats
                else {"params": params},
                points,
                train=True,
                rngs=rngs,
                mutable=mutable,
            )
            aux = jnp.asarray(0.0, jnp.float32)
            if moe:
                from pointvit_tpu.nn.moe import collect_moe_aux_loss

                aux = collect_moe_aux_loss(updated.get("intermediates", {}))
            return logits, updated.get("batch_stats", batch_stats), aux
        # No BatchNorm anywhere in the model (e.g. fixed-view renderer):
        # plain apply — passing mutable=[] would still return a tuple.
        logits = self.model.apply(
            {"params": params}, points, train=True, rngs=rngs
        )
        return logits, batch_stats, jnp.asarray(0.0, jnp.float32)

    def _microbatch_loss_fn(self, batch_stats, points, labels, rngs):
        def loss_fn(params):
            logits, new_stats, moe_aux = self._apply_train(
                params, batch_stats, points, rngs
            )
            loss = jnp.mean(
                cross_entropy_loss(
                    logits.astype(jnp.float32), labels, self.label_smoothing
                )
            )
            loss = loss + jnp.float32(
                self.train_config.get("moe_aux_weight", 0.01)
            ) * moe_aux
            return loss, (logits, new_stats)

        return loss_fn

    def _accum_grads(self, state: TrainState, points, labels, step_key):
        """Microbatched loss/grad over :func:`scan_microbatches` (the
        shared DP-layout-preserving reshape + scan + average core).
        BatchNorm running stats update sequentially per microbatch
        (torch-convention gradient accumulation); gradients are exact for
        BN-free models and microbatch-normalized otherwise. Each
        microbatch folds its index into the dropout/fps rng streams, so
        rng-consuming models follow a different (equally valid) trajectory
        than the full-batch step — equivalence holds exactly for
        deterministic models (verified on the real chip: worst relative
        param divergence 4e-5 after 4 steps)."""

        def run_micro(stats, pts, lbl, idx):
            rngs = {
                "dropout": jax.random.fold_in(
                    jax.random.fold_in(step_key, 0), idx
                ),
                "fps": jax.random.fold_in(
                    jax.random.fold_in(step_key, 1), idx
                ),
            }
            loss_fn = self._microbatch_loss_fn(stats, pts, lbl, rngs)
            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            correct = jnp.sum(jnp.argmax(logits, -1) == lbl)
            return loss, correct, new_stats, grads

        loss, correct, new_stats, grads = scan_microbatches(
            run_micro,
            state.batch_stats,
            points,
            labels,
            self.grad_accum,
            zero_grads=jax.tree.map(jnp.zeros_like, state.params),
            zero_aux=jnp.zeros((), jnp.int32),
        )
        return loss, correct, grads, new_stats

    def _train_step_impl(self, state: TrainState, points, labels, step_key):
        if self.grad_accum > 1:
            loss, correct, grads, new_stats = self._accum_grads(
                state, points, labels, step_key
            )
        else:
            rngs = {
                "dropout": jax.random.fold_in(step_key, 0),
                "fps": jax.random.fold_in(step_key, 1),
            }
            loss_fn = self._microbatch_loss_fn(
                state.batch_stats, points, labels, rngs
            )
            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            correct = jnp.sum(jnp.argmax(logits, -1) == labels)
        new_state = state.apply_gradients(grads=grads).replace(
            batch_stats=new_stats
        )
        if self.ema_decay is not None:
            decay = jnp.float32(self.ema_decay)
            # e·d + (1−d)·p (not e + (1−d)(p−e)): exact p at d=0. The EMA
            # trees live in f32 (see TrainState) so high-decay averages of
            # bf16 params can't stagnate on round-away increments.
            fold = lambda e, p: e * decay + (1.0 - decay) * p.astype(  # noqa: E731
                jnp.float32
            )
            new_state = new_state.replace(
                ema_params=jax.tree.map(
                    fold, state.ema_params, new_state.params
                ),
                ema_batch_stats=jax.tree.map(
                    fold, state.ema_batch_stats, new_state.batch_stats
                ),
            )
        if self.nan_guard != "skip":
            return new_state, loss, correct, jnp.zeros((), jnp.int32)
        finite = jnp.isfinite(loss)
        for g in jax.tree.leaves(grads):
            finite = finite & jnp.all(jnp.isfinite(g))
        # Poisoned step: keep the entire old state (params, opt_state,
        # step counter, batch_stats) and zero its contribution to the
        # epoch metrics. Elementwise selects fuse into the update.
        state = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new_state, state
        )
        loss = jnp.where(finite, loss, 0.0)
        correct = jnp.where(finite, correct, 0)
        return state, loss, correct, (~finite).astype(jnp.int32)

    def _eval_step_impl(self, state: TrainState, points, labels, weights):
        use_ema = self._eval_uses_ema
        variables = {"params": state.ema_params if use_ema else state.params}
        if state.batch_stats:
            variables["batch_stats"] = (
                state.ema_batch_stats if use_ema else state.batch_stats
            )
        logits = self.model.apply(variables, points, train=False)
        per_example = cross_entropy_loss(
            logits.astype(jnp.float32), labels, self.label_smoothing
        )
        loss_sum = jnp.sum(per_example * weights)
        correct = jnp.sum((jnp.argmax(logits, -1) == labels) * weights)
        return loss_sum, correct

    def _shard(self, points: np.ndarray, labels: np.ndarray):
        return (
            jax.device_put(jnp.asarray(points), self._batch_shard),
            jax.device_put(jnp.asarray(labels, jnp.int32), self._batch_shard),
        )

    # -- epochs -----------------------------------------------------------

    def _batches(self, loader, transfer):
        """Iterate device-ready batches, prefetched on a background thread
        when ``self.prefetch > 0`` (host prep + device_put overlap with the
        in-flight device step)."""
        if self.prefetch > 0:
            from pointvit_tpu.data.loader import Prefetcher

            return iter(Prefetcher(loader, transfer, depth=self.prefetch))
        return (transfer(*batch) for batch in loader)

    def _train_epoch(self, epoch: int) -> tuple[float, float]:
        loss_sum = jnp.zeros(())
        correct_sum = jnp.zeros(())
        skipped_sum = jnp.zeros((), jnp.int32)
        count = 0
        num_batches = 0
        for i, (pts, lbl, n) in enumerate(
            self._batches(self.train_loader, self._train_transfer)
        ):
            step_key = jax.random.fold_in(
                jax.random.fold_in(self._base_key, 1 + epoch), i
            )
            # Sample step timing: forcing a host read every step would
            # serialize the host pipeline against the device (and pay the
            # full round-trip on remote-TPU tunnels); 1-in-16 keeps the
            # stats honest while the other steps overlap host batch prep
            # with device execution.
            timed = (i & 15) == 0
            if timed:
                self.step_timer.start()
            self.state, loss, correct, skipped = self._train_step(
                self.state, pts, lbl, step_key
            )
            if timed:
                self.step_timer.stop(loss)
            loss_sum = loss_sum + loss
            correct_sum = correct_sum + correct
            skipped_sum = skipped_sum + skipped
            count += n
            num_batches += 1
        if num_batches == 0:
            return 0.0, 0.0
        if self.nan_guard == "skip":
            skipped_i = int(skipped_sum)  # one per-epoch host read
            if skipped_i:
                self.nan_skipped_total += skipped_i
                print(
                    f"warning: epoch {epoch + 1}: skipped {skipped_i} "
                    "non-finite train step(s)"
                )
                if skipped_i >= num_batches:
                    # Every step was non-finite: no parameter update
                    # happened and there is no surviving loss to average.
                    # Reporting 0.0 here would disguise a fully-diverged
                    # epoch as a healthy near-zero-loss one in the CSV
                    # (advisor r3) — record NaN and let the caller see it.
                    return float("nan"), float("nan")
                # Skipped batches were zeroed out of the sums; train
                # batches are uniform (drop_last) so the denominators
                # shrink by whole batches.
                num_batches -= skipped_i
                count = max(count - skipped_i * self.batch_size, 1)
        train_loss = float(loss_sum) / num_batches
        train_acc = float(correct_sum) / count
        if self.nan_guard == "raise" and not math.isfinite(train_loss):
            raise TrainingDivergedError(
                f"non-finite mean train loss at epoch {epoch + 1}; "
                "restore the last checkpoint to recover"
            )
        return train_loss, train_acc

    def _train_transfer(self, points, labels):
        pts, lbl = self._shard(points, labels)
        return pts, lbl, len(labels)

    def _eval_transfer(self, points, labels):
        n = len(labels)
        points, labels, weights = self._pad_eval_batch(points, labels)
        pts, lbl = self._shard(points, labels)
        w = jax.device_put(jnp.asarray(weights), self._batch_shard)
        return pts, lbl, w, n

    def _pad_eval_batch(self, points, labels):
        """Pad ragged final batches to the static batch size with zero-weight
        rows — one compiled eval graph, mesh-divisible shapes."""
        n = len(labels)
        weights = np.zeros((self.batch_size,), np.float32)
        weights[:n] = 1.0
        if n < self.batch_size:
            pad = self.batch_size - n
            points = np.concatenate(
                [points, np.repeat(points[:1], pad, axis=0)], axis=0
            )
            labels = np.concatenate([labels, np.repeat(labels[:1], pad)], axis=0)
        return points, labels, weights

    def _test_epoch(self) -> tuple[float, float]:
        loss_sum = jnp.zeros(())
        correct_sum = jnp.zeros(())
        count = 0
        for pts, lbl, w, n in self._batches(self.test_loader, self._eval_transfer):
            count += n
            loss, correct = self._eval_step(self.state, pts, lbl, w)
            loss_sum = loss_sum + loss
            correct_sum = correct_sum + correct
        if count == 0:
            return 0.0, 0.0
        return float(loss_sum) / count, float(correct_sum) / count

    # -- metrics / checkpoints -------------------------------------------

    def _prepare_metrics_csv(self) -> None:
        """Fresh run: (re)write the header. Resumed run (``start_epoch > 0``):
        keep the existing history up to the restored epoch and append from
        there — one continuous CSV across kill-and-resume (the reference
        truncates and silently rewrites history, pix4point_trainer.py:210-217;
        fixed here)."""
        headers = ["epoch", "train_loss", "train_accuracy", "test_loss", "test_accuracy"]
        if self.log_lr:
            headers.append("learning_rate")
        if self.start_epoch > 0 and os.path.exists(self.metrics_csv_path):
            with open(self.metrics_csv_path, newline="") as f:
                rows = list(csv.reader(f))
            kept = [r for r in rows[1:] if r and int(r[0]) <= self.start_epoch]
            with open(self.metrics_csv_path, "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(rows[0] if rows else headers)
                w.writerows(kept)
            return
        with open(self.metrics_csv_path, "w", newline="") as f:
            csv.writer(f).writerow(headers)

    def _current_lr(self) -> float:
        if self.schedule is None:
            return 0.0
        return float(self.schedule(self.state.step))

    def _update_metrics_csv(self, epoch, train_loss, train_acc, test_loss, test_acc):
        row = [epoch + 1, train_loss, train_acc, test_loss, test_acc]
        if self.log_lr:
            row.append(self._current_lr())
        with open(self.metrics_csv_path, "a", newline="") as f:
            csv.writer(f).writerow(row)

    def _save_checkpoint(self, filename: str, epoch: int, accuracy: float) -> None:
        from pointvit_tpu.train.checkpoint import save_checkpoint_deferred

        save_checkpoint_deferred(
            self.output_dir,
            filename,
            epoch=epoch,
            accuracy=accuracy,
            model_config=self.model_config,
            dataset_config=self.dataset_config,
            fetch=self._checkpoint_fetch_thunk(),
        )

    def load_checkpoint(self, path: str) -> None:
        """Restore params/batch_stats/opt_state/step from a checkpoint file."""
        from pointvit_tpu.train.checkpoint import (
            load_checkpoint,
            wait_for_pending_writes,
        )

        wait_for_pending_writes()  # the file may still be flushing

        restored = load_checkpoint(path, self.state)
        self.state = self.state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        if self.ema_decay is not None:
            # Checkpoints written without EMA seed the average from the
            # restored params/stats (the EMA then converges from there).
            # _ema_tree copies — never alias params in a donated state.
            self.state = self.state.replace(
                ema_params=_ema_tree(
                    restored.get("ema_params", restored["params"])
                ),
                ema_batch_stats=_ema_tree(
                    restored.get("ema_batch_stats", restored["batch_stats"])
                ),
            )
        self.state = self._place_state(self.state)
        self._refresh_frozen_cache()
        # Resume bookkeeping: continue the epoch loop after the restored
        # epoch, don't regress the best-checkpoint bar, and append to (not
        # truncate) the metrics CSV.
        self.start_epoch = int(restored["epoch"]) + 1
        self.best_acc = float(restored.get("accuracy") or 0.0)
        # Resuming from a periodic (non-best) model_epoch_N checkpoint must
        # not lower the best bar below the historical best — a later epoch
        # worse than the true best would then overwrite best_model.msgpack.
        # The best checkpoint's sidecar JSON carries its accuracy.
        best_meta = os.path.join(
            self.output_dir, f"{self.best_filename}.msgpack.json"
        )
        if os.path.exists(best_meta):
            try:
                with open(best_meta) as f:
                    self.best_acc = max(
                        self.best_acc, float(json.load(f).get("accuracy") or 0.0)
                    )
            except (ValueError, OSError):
                pass
        print(
            f"Loaded checkpoint from epoch {restored['epoch']} "
            f"with accuracy {restored['accuracy']:.4f}"
        )

    # -- main loop --------------------------------------------------------

    def train(self) -> float:
        """Run the full training loop; returns best test accuracy."""
        self._prepare_metrics_csv()
        best_acc = self.best_acc
        for epoch in range(self.start_epoch, self.epochs):
            t0 = time.time()
            if self.profile_dir and epoch == 0:
                from pointvit_tpu.utils.profiling import profile_trace

                with profile_trace(self.profile_dir):
                    train_loss, train_acc = self._train_epoch(epoch)
            else:
                train_loss, train_acc = self._train_epoch(epoch)
            test_loss, test_acc = self._test_epoch()
            self._update_metrics_csv(epoch, train_loss, train_acc, test_loss, test_acc)

            if test_acc > best_acc:
                best_acc = test_acc
                if self.save_best:
                    self._save_checkpoint(
                        f"{self.best_filename}.msgpack", epoch, test_acc
                    )
            if self.save_interval and (epoch + 1) % self.save_interval == 0:
                self._save_checkpoint(f"model_epoch_{epoch+1}.msgpack", epoch, test_acc)

            for hook in self.epoch_hooks:
                hook(self, epoch)

            dt = time.time() - t0
            msg = (
                f"Epoch {epoch+1}/{self.epochs} [{dt:.1f}s]  "
                f"train loss {train_loss:.4f} acc {train_acc:.4f}  "
                f"test loss {test_loss:.4f} acc {test_acc:.4f}"
            )
            if self.log_lr:
                msg += f"  lr {self._current_lr():.6f}"
            stats = self.step_timer.summary()
            if stats.get("steps"):
                msg += f"  step p50 {stats['p50_ms']:.1f}ms"
            self.step_timer.reset()
            print(msg)
        from pointvit_tpu.train.checkpoint import wait_for_pending_writes

        wait_for_pending_writes()
        self.best_acc = best_acc
        print(f"\nTraining completed. Best test accuracy: {best_acc:.4f}")
        print(f"Training metrics saved to {self.metrics_csv_path}")
        return best_acc

    # -- inference --------------------------------------------------------

    def predict(self, points: np.ndarray) -> np.ndarray:
        """Class predictions for a batch of clouds (renderer_trainer.py:431-445)."""
        use_ema = self._eval_uses_ema
        variables = {
            "params": self.state.ema_params if use_ema else self.state.params
        }
        if self.state.batch_stats:
            variables["batch_stats"] = (
                self.state.ema_batch_stats if use_ema else self.state.batch_stats
            )
        logits = self.model.apply(variables, jnp.asarray(points), train=False)
        return np.asarray(jnp.argmax(logits, -1))
