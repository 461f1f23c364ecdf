"""Public FPS+kNN sampling API and micro-benchmark harness.

Capability parity with the reference's sampler public surface
(``src/data/sampler.py``): the four exported ``fps_sampling_with_knn*``
variants (sampler.py:199-546 — naive, vectorized, topk/chunked,
"cuda-optimized") collapse here to one implementation with an
``implementation`` switch over the two real execution strategies this
framework has (XLA loop vs fused Pallas kernels), plus
:func:`benchmark_fps_implementations` mirroring the reference's harness
(sampler.py:549-601). Like the reference's variants, this API is not used by
any model — the models call :mod:`pointvit_tpu.ops.group` — it exists as the
standalone sampling surface and benchmark entry.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from pointvit_tpu.ops.fps import farthest_point_sample, fps_gather
from pointvit_tpu.ops.knn import knn_gather, knn_indices

__all__ = ["fps_sampling_with_knn", "benchmark_fps_implementations"]


def fps_sampling_with_knn(
    points: jax.Array,
    num_samples: int,
    k: int,
    *,
    key: jax.Array | None = None,
    implementation: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """FPS-select ``num_samples`` centers and group their k nearest points.

    Reference: ``fps_sampling_with_knn`` (sampler.py:199-226) — returns
    ``(sampled_points (B, S, 3), grouped_points (B, S, k, 3))``.

    Args:
        points: (B, N, 3) clouds.
        num_samples: FPS centre count (static).
        k: neighbour count (static).
        key: optional PRNG key for the FPS start.
        implementation: None (auto), 'xla', or 'pallas' — selects both the
            FPS kernel and (on 'pallas'/auto-TPU) the fused kNN kernel.
    """
    fps_idx = farthest_point_sample(
        points, num_samples, key=key, implementation=implementation
    )
    centers = fps_gather(points, fps_idx)
    use_pallas = implementation == "pallas"
    if implementation is None:
        from pointvit_tpu.ops.group import _use_fused_knn

        use_pallas = _use_fused_knn(points.shape[1])
    if use_pallas:
        from pointvit_tpu.ops.pallas_knn import knn_group_pallas

        _, grouped = knn_group_pallas(points, centers, points, k)
    else:
        idx = knn_indices(centers, points, k)
        grouped = knn_gather(points, idx)
    return centers, grouped


def benchmark_fps_implementations(
    batch_size: int = 32,
    num_points: int = 2048,
    num_samples: int = 512,
    k: int = 16,
    iters: int = 10,
) -> dict[str, float]:
    """Wall-clock the available implementations (reference harness,
    sampler.py:549-601). Returns {name: ms/batch}. A host read terminates
    each timing block (required for correct numbers on remote-TPU tunnels).
    """
    key = jax.random.PRNGKey(0)
    points = jax.random.normal(key, (batch_size, num_points, 3), jnp.float32)
    results: dict[str, float] = {}
    for name in ("xla", "pallas"):
        try:
            fn = jax.jit(
                lambda p, n=name: fps_sampling_with_knn(
                    p, num_samples, k, implementation=n
                )[1]
            )
            out = fn(points)
            float(jnp.ravel(out)[0])  # compile + settle
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(points)
            float(jnp.ravel(out)[0])
            results[name] = (time.perf_counter() - t0) / iters * 1e3
        except Exception as e:  # e.g. pallas on an unsupported backend/shape
            results[name] = float("nan")
            print(f"{name}: unavailable ({type(e).__name__})")
    for name, ms in results.items():
        print(f"fps_sampling_with_knn[{name}]: {ms:.2f} ms/batch{batch_size}")
    return results


if __name__ == "__main__":
    benchmark_fps_implementations()
