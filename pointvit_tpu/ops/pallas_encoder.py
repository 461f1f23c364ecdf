"""Pallas TPU kernel: the whole APF mini-PointNet group encoder, fused.

Rebuilds the inference path of the reference ``Encoder`` (apf.py:114-181) as
one kernel. Motivation (measured, DESIGN.md performance ledger): at the bench
shape (B=256, G=196, K=32, E=768) the XLA path materializes the second-stack
input ``(B·G, K, 2E)`` — a ~4.9 GB bf16 tensor — in HBM, and every BatchNorm/
ReLU pass over it costs ~12 ms of pure HBM bandwidth. Here a tile of T groups
flows through all five matmuls entirely in VMEM; the only HBM traffic is the
grouped points in (25 MB) and the tokens out (77 MB).

Inference-mode BatchNorm is a pure affine, so each BN folds into the
preceding matmul's weights/bias host-side (f32) before the kernel launch:

    relu(BN(x @ W + b)) = relu(x @ (W·s) + (b·s + t)),  s = γ/√(σ²+ε), t = β − μ·s

The kernel therefore computes (per grid step, T groups of K points):

    h0 = relu(x  @ W0' + c0)          x: (T·K, C)
    h1 = relu(h0 @ W1' + c1)
    loc = h1 @ W2 + b2                 (T·K, E)
    g   = max_K(loc)                   (T, E)
    h2  = relu(loc @ Wl' + (g @ Wg' + c2))     — the concat([g, loc]) matmul
                                                 split exactly as in
                                                 nn/pointnet.py (global half
                                                 per group, K× fewer FLOPs)
    out = max_K(h2 @ W3 + b3)          (T, E)

Training keeps the XLA path (batch-statistics BN can't fold); gradients
through the fused inference path use a custom VJP that recomputes via the
equivalent jnp formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_group_encoder",
    "fold_encoder_params",
    "reference_folded_encoder",
    "fused_p3_embed",
    "fold_p3_stage_params",
    "reference_folded_p3",
]


def _dot(a, b):
    return lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _tile_groups(M: int, K: int, block_groups: int | None) -> int:
    """Groups per grid step. Measured (r4, on-device sweeps at K=16 — APF
    encoder M=50176: T 16/32/64/128 → 17.12/16.66/16.37/16.22 ms; P3 stage
    M=32768: 5.31/5.09/4.95/4.83 ms): larger tiles amortize the per-step
    weight reloads/pipeline better at K=16 and flatten by T=128. At K=32
    the r2 bench-shape sweep measured T=64 *worse* (58.8 vs 52.3 ms — VMEM
    pressure at 2048-row matmuls), so big tiles apply only at K ≤ 16."""
    if block_groups:
        return block_groups
    for T in (128, 64, 32, 16) if K <= 16 else (32, 16):
        if M % T == 0:
            return T
    return 16


def _enc_kernel(T, K, x_ref, w0, c0, w1, c1, w2, b2, wg, wl, c2, w3, b3, o_ref):
    C = x_ref.shape[-1]
    E = w2.shape[-1]
    H = wl.shape[-1]  # second-stack width: 2E exact parity, E serving preset
    dt = x_ref.dtype
    x = x_ref[...].reshape(T * K, C)
    h = jnp.maximum(_dot(x, w0[...]) + c0[...], 0.0).astype(dt)
    h = jnp.maximum(_dot(h, w1[...]) + c1[...], 0.0).astype(dt)
    loc = (_dot(h, w2[...]) + b2[...]).astype(dt)  # (T·K, E)
    g = jnp.max(loc.reshape(T, K, E), axis=1)  # (T, E)
    xg = _dot(g, wg[...]) + c2[...]  # (T, H) f32
    xl = _dot(loc, wl[...])  # (T·K, H) f32
    h2 = jnp.maximum(xl.reshape(T, K, H) + xg[:, None, :], 0.0)
    h2 = h2.reshape(T * K, H).astype(dt)
    out = (_dot(h2, w3[...]) + b3[...]).reshape(T, K, E)
    o_ref[...] = jnp.max(out, axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_groups", "interpret"))
def _encoder_pallas(x, weights, *, block_groups: int | None = None, interpret: bool = False):
    """x: (M, K, C) grouped point features; weights: 11-tuple of folded arrays."""
    M, K, C = x.shape
    E = weights[4].shape[-1]  # w2: (512, E)
    T = _tile_groups(M, K, block_groups)
    assert M % T == 0, (M, T)
    dt = x.dtype
    row = lambda v: v.reshape(1, -1).astype(dt)
    mat = lambda v: v.astype(dt)
    w0, c0, w1, c1, w2, b2, wg, wl, c2, w3, b3 = weights
    wspecs = [
        pl.BlockSpec(w.shape, lambda m: (0, 0), memory_space=pltpu.VMEM)
        for w in (
            mat(w0), row(c0), mat(w1), row(c1), mat(w2), row(b2),
            mat(wg), mat(wl), row(c2), mat(w3), row(b3),
        )
    ]
    return pl.pallas_call(
        functools.partial(_enc_kernel, T, K),
        grid=(M // T,),
        in_specs=[
            pl.BlockSpec((T, K, C), lambda m: (m, 0, 0), memory_space=pltpu.VMEM),
            *wspecs,
        ],
        out_specs=pl.BlockSpec((T, E), lambda m: (m, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, E), dt),
        interpret=interpret,
    )(
        x,
        mat(w0), row(c0), mat(w1), row(c1), mat(w2), row(b2),
        mat(wg), mat(wl), row(c2), mat(w3), row(b3),
    )


def reference_folded_encoder(x, weights):
    """jnp equivalent of the kernel (backward recompute + interpret oracle)."""
    M, K, C = x.shape
    w0, c0, w1, c1, w2, b2, wg, wl, c2, w3, b3 = [w.astype(x.dtype) for w in weights]
    E = w2.shape[-1]
    h = jnp.maximum(x.reshape(M * K, C) @ w0 + c0, 0.0)
    h = jnp.maximum(h @ w1 + c1, 0.0)
    loc = h @ w2 + b2
    g = jnp.max(loc.reshape(M, K, E), axis=1)
    H = wl.shape[-1]
    h2 = jnp.maximum(
        (loc @ wl).reshape(M, K, H) + (g @ wg + c2)[:, None, :], 0.0
    )
    out = (h2.reshape(M * K, H) @ w3 + b3).reshape(M, K, E)
    return jnp.max(out, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_group_encoder(x, weights, interpret: bool = False):
    """Fused inference encoder; x: (M, K, C) → (M, E).

    ``weights`` is the 11-tuple from :func:`fold_encoder_params`. Backward
    recomputes through :func:`reference_folded_encoder`.
    """
    return _encoder_pallas(x, tuple(weights), interpret=interpret)


def _fge_fwd(x, weights, interpret):
    return _encoder_pallas(x, tuple(weights), interpret=interpret), (x, tuple(weights))


def _fge_bwd(interpret, res, g):
    x, weights = res
    _, vjp = jax.vjp(reference_folded_encoder, x, weights)
    return vjp(g)


fused_group_encoder.defvjp(_fge_fwd, _fge_bwd)


def _bn_affine(bn_params, bn_stats, eps=1e-5):
    s = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    return s, bn_params["bias"] - bn_stats["mean"] * s


def fold_encoder_params(params, batch_stats):
    """Fold the three inference BatchNorms of ``GroupFeatureEncoder`` into the
    adjacent matmuls (f32). Returns the kernel's 11 weight arrays.

    ``params`` / ``batch_stats`` are the encoder's own collections (layer
    names as in :class:`pointvit_tpu.nn.pointnet.GroupFeatureEncoder`).
    """
    f32 = lambda t: jax.tree.map(lambda a: a.astype(jnp.float32), t)
    p, bs = f32(params), f32(batch_stats)
    s0, t0 = _bn_affine(p["first_bn0"], bs["first_bn0"])
    s1, t1 = _bn_affine(p["first_bn1"], bs["first_bn1"])
    s2, t2 = _bn_affine(p["second_bn0"], bs["second_bn0"])
    w0 = p["first_0"]["kernel"] * s0
    c0 = p["first_0"]["bias"] * s0 + t0
    w1 = p["first_1"]["kernel"] * s1
    c1 = p["first_1"]["bias"] * s1 + t1
    w2 = p["first_2"]["kernel"]
    b2 = p["first_2"]["bias"]
    wg = p["second_0_global"]["kernel"] * s2
    wl = p["second_0_local"]["kernel"] * s2
    c2 = p["second_0_global"]["bias"] * s2 + t2
    w3 = p["second_1"]["kernel"]
    b3 = p["second_1"]["bias"]
    return (w0, c0, w1, c1, w2, b2, wg, wl, c2, w3, b3)


# ---------------------------------------------------------------------------
# Pix4Point P3Embed stage (pix4point.py:105-191), same fusion treatment.
#
# The XLA inference path at the bench shape (B=64, S=512, K=16, D=384) runs
# ~1.08 TFLOP/batch of narrow matmuls plus BatchNorm/ReLU passes over
# (B·S, K, 2D) HBM tensors — measured as the step's ~9 ms "unattributed"
# remainder (benchmarks/pix4point_anatomy.py, r4). Two exact rewrites:
#
# 1. conv1_0 → conv1_1 are *consecutive linear maps* (the reference applies
#    BN+ReLU only after the second conv, pix4point.py:137-145), so they fold
#    into ONE (C, D) matmul host-side: x@V0@(V1·s1) — deleting the stack's
#    dominant 154 GFLOP (D×D) contraction outright.
# 2. concat([global, local]) @ W2 splits into g@W2[:D] (per-group, K× fewer
#    FLOPs) + h@W2[D:], the same split the APF encoder uses above.
#
# Everything else (BN folds, VMEM-resident tile pipeline, recompute VJP)
# mirrors the APF kernel. ~640 GFLOP/batch remain, all MXU contractions.
# ---------------------------------------------------------------------------


def _p3_kernel(T, K, x_ref, w01, c01, w2g, w2l, c2, w3, c3, o_ref):
    C = x_ref.shape[-1]
    D = w01.shape[-1]
    H = w2l.shape[-1]
    dt = x_ref.dtype
    x = x_ref[...].reshape(T * K, C)
    h = jnp.maximum(_dot(x, w01[...]) + c01[...], 0.0).astype(dt)  # (T·K, D)
    g = jnp.max(h.reshape(T, K, D), axis=1)  # (T, D)
    xg = _dot(g, w2g[...]) + c2[...]  # (T, H) f32
    xl = _dot(h, w2l[...])  # (T·K, H) f32
    h2 = jnp.maximum(xl.reshape(T, K, H) + xg[:, None, :], 0.0)
    h2 = h2.reshape(T * K, H).astype(dt)
    h3 = jnp.maximum(_dot(h2, w3[...]) + c3[...], 0.0).reshape(T, K, D)
    o_ref[...] = jnp.max(h3, axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_groups", "interpret"))
def _p3_pallas(x, weights, *, block_groups: int | None = None, interpret: bool = False):
    """x: (M, K, C) grouped [coords ‖ feats]; weights: 7-tuple from
    :func:`fold_p3_stage_params`."""
    M, K, C = x.shape
    w01, c01, w2g, w2l, c2, w3, c3 = weights
    D = w01.shape[-1]
    T = _tile_groups(M, K, block_groups)
    assert M % T == 0, (M, T)
    dt = x.dtype
    row = lambda v: v.reshape(1, -1).astype(dt)
    mat = lambda v: v.astype(dt)
    ws = (mat(w01), row(c01), mat(w2g), mat(w2l), row(c2), mat(w3), row(c3))
    wspecs = [
        pl.BlockSpec(w.shape, lambda m: (0, 0), memory_space=pltpu.VMEM)
        for w in ws
    ]
    return pl.pallas_call(
        functools.partial(_p3_kernel, T, K),
        grid=(M // T,),
        in_specs=[
            pl.BlockSpec((T, K, C), lambda m: (m, 0, 0), memory_space=pltpu.VMEM),
            *wspecs,
        ],
        out_specs=pl.BlockSpec((T, D), lambda m: (m, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), dt),
        interpret=interpret,
    )(x, *ws)


def reference_folded_p3(x, weights):
    """jnp equivalent of :func:`_p3_pallas` (backward recompute + oracle)."""
    M, K, C = x.shape
    w01, c01, w2g, w2l, c2, w3, c3 = [w.astype(x.dtype) for w in weights]
    D = w01.shape[-1]
    H = w2l.shape[-1]
    h = jnp.maximum(x.reshape(M * K, C) @ w01 + c01, 0.0)
    g = jnp.max(h.reshape(M, K, D), axis=1)
    h2 = jnp.maximum(
        (h @ w2l).reshape(M, K, H) + (g @ w2g + c2)[:, None, :], 0.0
    )
    h3 = jnp.maximum(h2.reshape(M * K, H) @ w3 + c3, 0.0).reshape(M, K, D)
    return jnp.max(h3, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_p3_embed(x, weights, interpret: bool = False):
    """Fused P3Embed stage; x: (M, K, C) → (M, D).

    ``weights`` is the 7-tuple from :func:`fold_p3_stage_params`. Backward
    recomputes through :func:`reference_folded_p3` (training itself keeps
    the XLA path — batch-statistics BN can't fold).
    """
    return _p3_pallas(x, tuple(weights), interpret=interpret)


def _fp3_fwd(x, weights, interpret):
    return _p3_pallas(x, tuple(weights), interpret=interpret), (x, tuple(weights))


def _fp3_bwd(interpret, res, g):
    x, weights = res
    _, vjp = jax.vjp(reference_folded_p3, x, weights)
    return vjp(g)


fused_p3_embed.defvjp(_fp3_fwd, _fp3_bwd)


def fold_p3_stage_params(params, batch_stats, stage: int = 0):
    """Fold one P3Embed stage's BatchNorms + the conv1 linear pair (f32).

    ``params`` / ``batch_stats`` are :class:`pointvit_tpu.nn.pointnet.P3Embed`'s
    own collections; layer names as written by its stage loop (requires the
    default ``layers=4`` structure: conv1 = linear→linear→BN→ReLU, conv2 =
    two of linear→BN→ReLU). Returns the kernel's 7 weight arrays.
    """
    f32 = lambda t: jax.tree.map(lambda a: a.astype(jnp.float32), t)
    p, bs = f32(params), f32(batch_stats)
    s = f"s{stage}"
    s1, t1 = _bn_affine(p[f"{s}_conv1_bn"], bs[f"{s}_conv1_bn"])
    s2, t2 = _bn_affine(p[f"{s}_conv2_bn0"], bs[f"{s}_conv2_bn0"])
    s3, t3 = _bn_affine(p[f"{s}_conv2_bn1"], bs[f"{s}_conv2_bn1"])
    v0 = p[f"{s}_conv1_0"]["kernel"]  # (C, D), no bias
    v1 = p[f"{s}_conv1_1"]["kernel"]  # (D, D)
    b1 = p[f"{s}_conv1_1"]["bias"]
    w01 = v0 @ (v1 * s1)
    c01 = b1 * s1 + t1
    k2 = p[f"{s}_conv2_0"]["kernel"] * s2  # (2D, H), no bias
    D = v0.shape[-1]
    w2g, w2l = k2[:D], k2[D:]  # concat([global, local]) row split
    w3 = p[f"{s}_conv2_1"]["kernel"] * s3  # (H, D), no bias
    return (w01, c01, w2g, w2l, t2, w3, t3)
