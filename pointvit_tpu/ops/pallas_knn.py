"""Pallas TPU kernel: fused kNN grouping (distance + top-k + gather).

Why a kernel: the XLA path pays three separate HBM round-trips — the
(B, S, N) distance tensor, ``lax.top_k`` over it (~16 ms at the APF shape),
and a row-gather of tiny C≤8 rows (~20 ms, gathers are lane-starved at such
widths). This kernel keeps the distance matrix in VMEM and emits the
gathered neighbourhoods directly:

- distances in difference form per coordinate — (S, 1) vs (1, N) broadcasts
  on the VPU, exact f32 (no cancellation, no HIGHEST-precision matmul);
- k-round iterative min-extraction: each round takes the per-row min, masks
  it out, and gathers that neighbour's features via a one-hot (S, N)·(N, C)
  matmul on the MXU — no scatter/gather instructions at all;
- ties resolve to the lowest index (same as ``lax.top_k`` on negated
  distances), and rounds emit in ascending-distance order.

~4× faster than the XLA distance+top_k+gather chain at the APF shape, and
the (B, S, N) distance tensor never touches HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["knn_group_pallas"]


_MAX_LANE_BITS = 11  # supports N ≤ 2048 packed into the mantissa tail


def _lane_bits(n_points: int) -> int:
    """Mantissa tail bits stolen for the lane index: max(10, ⌈log₂N⌉).
    At 11 bits (N=2048) the distance perturbation is ≤2⁻¹² relative —
    still only near-exact ties can reorder."""
    bits = 10
    while (1 << bits) < n_points:
        bits += 1
    return bits


def _knn_kernel(
    k: int, n_points: int, cf: int, n_items: int,
    ctr_ref, pts_ref, feat_ref, idx_ref, out_ref,
):
    S = ctr_ref.shape[1]
    _LANE_MASK = (1 << _lane_bits(n_points)) - 1
    lane = lax.broadcasted_iota(jnp.int32, (S, n_points), 1)
    idx_lane = lax.broadcasted_iota(jnp.int32, (S, k), 1)

    # Packed keys: squared distances are non-negative f32, whose int32 bit
    # patterns are order-isomorphic, so (bits & ~LANE_MASK) | lane is one
    # int32 that sorts by distance with ties going to the LOWEST index —
    # exactly lax.top_k's tie rule. Each extraction round is then a single
    # int-min reduce + one compare pass, instead of the float min / masked
    # index-min / re-mask chain (~3 fewer (S, N) passes per round). Stealing
    # the 10 mantissa tail bits perturbs distances by ≤2⁻¹³ relative — only
    # near-exact ties can reorder.
    #
    # The k rounds are a static Python unroll so each round's gathered
    # features store straight into the (k, S, CF) output block at a static
    # index — the fori_loop variant had to place them with a 32-way
    # concat + masked select per round, which cost more than the gather
    # matmuls themselves (measured 15.2 vs 8.9 ms at the APF shape).
    for i in range(n_items):
        cx = ctr_ref[i, :, 0:1]  # (S, 1)
        cy = ctr_ref[i, :, 1:2]
        cz = ctr_ref[i, :, 2:3]
        x = pts_ref[i, 0:1, :]  # (1, N)
        y = pts_ref[i, 1:2, :]
        z = pts_ref[i, 2:3, :]
        d = (cx - x) ** 2 + (cy - y) ** 2 + (cz - z) ** 2  # (S, N) f32
        key = (lax.bitcast_convert_type(d, jnp.int32) & ~jnp.int32(_LANE_MASK)) | lane
        feats = feat_ref[i]  # (N, 2·CF) packed [hi | lo] bf16
        idx_acc = jnp.zeros((S, k), jnp.int32)
        gs = []
        for j in range(k):
            m = jnp.min(key, axis=1, keepdims=True)  # (S, 1) — winner key
            jidx = m[:, 0] & _LANE_MASK  # (S,) winner lane
            sel = key == m  # exactly one True per row (lane embedded in key)
            # One-hot gather on the MXU over the split-bf16 payload:
            # hi + lo reconstructs the f32 value to ~16 mantissa bits
            # (selection sums exactly one term per row).
            g2 = jnp.dot(
                sel.astype(jnp.bfloat16), feats, preferred_element_type=jnp.float32
            )  # (S, 2·CF) — [hi | lo] planes, summed OUTSIDE the kernel:
            # an in-kernel g2[:, :cf] + g2[:, cf:] gets algebraically folded
            # into dot(sel, hi + lo) with the rhs add performed in bf16 —
            # which rounds hi + lo back to hi and silently drops the lo
            # plane (measured: plain-bf16 2⁻⁹ gather error on device, r3).
            # The pallas_call boundary is opaque to XLA, so summing the two
            # output slices after the call is rewrite-proof.
            gs.append(g2)
            idx_acc = jnp.where(idx_lane == j, jidx[:, None], idx_acc)
            key = jnp.where(sel, jnp.int32(2**31 - 1), key)
        # one lane-concat + one store per item: keeps the output in the
        # (S, k·2·CF) layout — emitting (k, S, CF) and transposing in XLA
        # costs ~7 ms at the bench shape (CF=3 lanes)
        out_ref[i] = jnp.concatenate(gs, axis=1)
        idx_ref[i] = idx_acc


@functools.partial(jax.jit, static_argnames=("k", "items_per_step", "interpret"))
def knn_group_pallas(
    points: jax.Array,
    centers: jax.Array,
    features: jax.Array,
    k: int,
    *,
    items_per_step: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused kNN indices + gathered neighbour features.

    Args:
        points: (B, N, 3) support coordinates (f32).
        centers: (B, S, 3) query centroids.
        features: (B, N, C) per-point features to gather (C ≤ 128).
        k: static neighbour count.
        interpret: Pallas interpreter mode (CPU tests).

    Returns:
        (idx (B, S, k) int32 — ascending distance, ties to lowest index;
         grouped (B, S, k, C) — ``features`` gathered at those indices).
    """
    B, N, _ = points.shape
    if N > (1 << _MAX_LANE_BITS):
        raise ValueError(
            f"packed-key kNN kernel supports N ≤ {1 << _MAX_LANE_BITS}, got {N} "
            "(use the XLA knn_indices/knn_gather path)"
        )
    S = centers.shape[1]
    C = features.shape[-1]
    planes = jnp.swapaxes(points.astype(jnp.float32), 1, 2)  # (B, 3, N)
    # Split-bf16 feature payload for the in-kernel one-hot gather: value =
    # hi + lo reconstructs ~16 mantissa bits (f32 has 24; the consumers run
    # the encoder in bf16 = 8). Distances stay exact f32.
    #
    # hi MUST be built by bit-masking, not by converting to bf16 and back:
    # XLA on TPU elides the f32→bf16→f32 round-trip as a no-op, which turns
    # ``lo = f32 - hi`` into exactly zero at pack time — the r2 kernel
    # silently shipped plain-bf16 gathers because of this (caught by the
    # on-device /verify suite, r3). Masking the low 16 mantissa bits is a
    # bit-exact truncation XLA cannot fold; the hi→bf16 convert below is
    # exact (hi has ≤7 explicit mantissa bits), and lo then carries the
    # next ~8 bits of the residual.
    f32 = features.astype(jnp.float32)
    hi_f32 = lax.bitcast_convert_type(
        lax.bitcast_convert_type(f32, jnp.int32) & jnp.int32(-65536),  # 0xFFFF0000
        jnp.float32,
    )
    hi = hi_f32.astype(jnp.bfloat16)
    lo = (f32 - hi_f32).astype(jnp.bfloat16)
    packed = jnp.concatenate([hi, lo], axis=-1)  # (B, N, 2C) bf16

    # Measured (v5e, B256/S196/N1024/k32): interleaving 2 clouds per grid
    # step SLOWS the kernel 15.5 → 19.1 ms — the extraction rounds are VPU
    # throughput-bound, not reduce-latency-bound, so extra live state only
    # adds pressure. Default stays 1; the parameter remains for experiments.
    if items_per_step is None:
        items_per_step = 1
    n = items_per_step if B % items_per_step == 0 else 1

    # Tile the centre axis so the (S_t, N) key/distance working set stays
    # ≲1 MB f32 — at Pix4Point's (S=512, N=2048) the untiled kernel needs
    # 33.8 MB of scoped VMEM vs Mosaic's 16 MB limit. The points/features
    # blocks are constant across S tiles, so Mosaic keeps them resident.
    s_tile = S
    while s_tile > 128 and s_tile % 2 == 0 and s_tile * N > (1 << 18):
        s_tile //= 2
    kernel = functools.partial(_knn_kernel, k, N, C, n)
    idx, grouped = pl.pallas_call(
        kernel,
        grid=(B // n, S // s_tile),
        in_specs=[
            pl.BlockSpec((n, s_tile, 3), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 3, N), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, N, 2 * C), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n, s_tile, k), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, s_tile, k * 2 * C), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, k), jnp.int32),
            jax.ShapeDtypeStruct((B, S, k * 2 * C), jnp.float32),
        ),
        interpret=interpret,
    )(centers.astype(jnp.float32), planes, packed)
    # hi + lo reconstruction (≈16 mantissa bits) — deliberately outside the
    # kernel; see the fold note in _knn_kernel.
    g = grouped.reshape(B, S, k, 2 * C)
    return idx, (g[..., :C] + g[..., C:]).astype(features.dtype)
