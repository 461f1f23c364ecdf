"""Deployment artifacts: a model's forward serialized to StableHLO.

The reference's only deployment format is a pickled ``torch.save`` state
dict (``src/train/train_utils.py``) — loading it requires the Python model
class, the repo, and a matching torch. The TPU-native equivalent is
``jax.export``: the jitted forward (weights baked in as constants) lowers
to versioned StableHLO with compatibility guarantees, so a serving binary
can run the artifact with **no Python model code at all** — the natural
hand-off format to C++/TF-serving-style hosts and across JAX versions.

- Batch-polymorphic by default: one artifact serves any batch size (the
  batch dim exports as a symbolic dimension), so the serving engine's
  bucket ladder (pointvit_tpu/serve.py) needs exactly one artifact instead
  of one per bucket. Point count / channels stay static — XLA-friendly, and
  they're architecture constants here anyway.
- Cross-platform: pass ``platforms=("tpu", "cpu")`` to lower once for both.
  Exports produced on a CPU host bake the XLA (non-Pallas) compute paths —
  the fused-kernel dispatch keys on the *exporting* backend — so artifacts
  exported off-TPU are correct everywhere but leave the Pallas speedups to
  native serving; export on the TPU host for the fused paths.

Round-trip is pinned in tests/test_export.py; the CLI is
``scripts/export_model.py`` (checkpoint → ``.stablehlo`` file).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as _jexport

__all__ = ["export_forward", "load_forward", "save_exported", "load_exported"]


def export_forward(
    model,
    variables: dict,
    example: jax.Array | np.ndarray,
    *,
    batch_polymorphic: bool = True,
    platforms: tuple[str, ...] | None = None,
) -> bytes:
    """Serialize ``model.apply(variables, points, train=False)`` to bytes.

    Args:
        model: a family Flax module (see ``models/factory.py``).
        variables: its full variable dict (params [+ batch_stats]); baked
            into the artifact as constants.
        example: (B, N, C) array or ``jax.ShapeDtypeStruct`` fixing N/C (and
            B when ``batch_polymorphic=False``).
        batch_polymorphic: export the batch dim symbolically so one artifact
            serves every batch size.
        platforms: lowering targets (e.g. ``("tpu", "cpu")``); None = the
            current default backend.

    Returns:
        Serialized, versioned StableHLO bytes (``jax.export`` calling
        convention v9+): load with :func:`load_forward`.
    """

    def fwd(points):
        return model.apply(variables, points, train=False)

    if batch_polymorphic:
        (b,) = _jexport.symbolic_shape("b")
        shape = (b,) + tuple(example.shape[1:])
    else:
        shape = tuple(example.shape)
    arg = jax.ShapeDtypeStruct(shape, jnp.dtype(example.dtype))
    exported = _jexport.export(jax.jit(fwd), platforms=platforms)(arg)
    return bytes(exported.serialize())


def load_forward(blob: bytes):
    """Deserialize :func:`export_forward` bytes → ``fn(points) -> logits``.

    The returned callable is jittable and needs no model code or params —
    everything is in the artifact.
    """
    exported = _jexport.deserialize(blob)

    def fn(points):
        return exported.call(jnp.asarray(points))

    return fn


def save_exported(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_exported(path: str):
    """File-path convenience over :func:`load_forward`."""
    with open(path, "rb") as f:
        return load_forward(f.read())
