"""Learning-rate schedules matching the reference's three shapes.

All three reference trainers step their scheduler once per *epoch*
(apf_trainer.py:237, pix4point_trainer.py:173, renderer_trainer.py:257), so
each schedule here is a function of the global step that quantizes to the
epoch index — per-epoch-constant LR, bitwise-matching the reference's
per-epoch values.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "timm_cosine_schedule",
    "warmup_then_cosine_schedule",
    "cosine_annealing_schedule",
    "constant_schedule",
]


def timm_cosine_schedule(
    base_lr: float,
    epochs: int,
    steps_per_epoch: int,
    warmup_epochs: int = 10,
    warmup_lr_init: float = 1e-3,
    min_lr: float = 0.0,
):
    """timm ``CosineLRScheduler(t_initial=epochs, warmup_t, warmup_lr_init)``
    as used by the APF trainer (apf_trainer.py:177-183).

    Warmup is linear from ``warmup_lr_init`` to ``base_lr`` over
    ``warmup_epochs`` (note the reference config warms *down*: 1e-3 → 5e-4);
    then cosine from ``base_lr`` to ``min_lr`` over the full ``epochs``
    horizon (timm's default ``warmup_prefix=False`` counts warmup epochs in
    the cosine progress). ``cycle_decay`` only affects restarts, which never
    occur with ``cycle_limit=1``.
    """

    def schedule(step):
        epoch = jnp.minimum(jnp.asarray(step) // steps_per_epoch, epochs - 1)
        t = epoch.astype(jnp.float32)
        warm = warmup_lr_init + t * (base_lr - warmup_lr_init) / max(warmup_epochs, 1)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (
            1 + jnp.cos(jnp.pi * t / epochs)
        )
        return jnp.where(t < warmup_epochs, warm, cos)

    return schedule


def warmup_then_cosine_schedule(
    base_lr: float,
    steps_per_epoch: int,
    warmup_epochs: int,
    t_max: int,
    min_lr: float = 1e-6,
):
    """torch ``SequentialLR(LambdaLR((e+1)/warmup), CosineAnnealingLR(t_max))``
    as used by the Pix4Point trainer (pix4point_trainer.py:108-122).

    Epoch e < warmup: lr = base·(e+1)/warmup. At the milestone the cosine
    phase starts at ``base_lr`` and anneals to ``min_lr`` over ``t_max``
    epochs (and torch's closed form continues past t_max, rising again —
    we clamp the phase at t_max, which matches within the configured horizon).
    """

    def schedule(step):
        epoch = (jnp.asarray(step) // steps_per_epoch).astype(jnp.float32)
        warm = base_lr * (epoch + 1.0) / max(warmup_epochs, 1)
        t = jnp.clip(epoch - warmup_epochs, 0, t_max)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(jnp.pi * t / t_max))
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule


def cosine_annealing_schedule(
    base_lr: float, epochs: int, steps_per_epoch: int, min_lr: float = 1e-6
):
    """torch ``CosineAnnealingLR(T_max=epochs)`` (renderer_trainer.py:154-161)."""

    def schedule(step):
        epoch = jnp.minimum((jnp.asarray(step) // steps_per_epoch).astype(jnp.float32), epochs)
        return min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(jnp.pi * epoch / epochs))

    return schedule


def constant_schedule(base_lr: float):
    def schedule(step):
        return jnp.asarray(base_lr, jnp.float32)

    return schedule
