"""Pallas TPU kernels: a whole APF ViT block as two fused kernels.

Rebuilds the inference path of the reference ``APFViTLayer``
(apf_utils.py:236-293) — including its double-counted residual — as two
kernels per block:

    attn half:  x1  = x + proj(MHA(qkv(LN1(x))))
    mlp half:   out = fc2(gelu(fc1(LN2(x1)))) + s·up(relu(down(LNa(x1)))) + 2·x1

Why: at the bench shape (B256, S197, E768) the XLA path pays ~6 separate
HBM passes per block for LayerNorms/residuals/adapter glue (~77 MB
activations each), and the attention contraction stalls between the qkv and
proj matmuls. In-kernel, every elementwise op runs on VMEM-resident tiles,
and the attention uses the two-pass schedule (all QK^T → one softmax → all
PV; see ops/pallas_attention.py).

All matmuls accumulate f32 on the MXU; LayerNorm statistics are f32.
Training (dropout/drop-path active, BN-free but stochastic) keeps the XLA
path; gradients through the fused inference path use a custom VJP that
recomputes via the equivalent jnp formulation below.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_apf_block", "apf_block_weights", "reference_apf_block"]

_LN_EPS = 1e-6  # flax.linen.LayerNorm default (the rebuild's LN epsilon)


def _erf(x):
    """Abramowitz–Stegun 7.1.26 rational erf (max abs err 1.5e-7, f32) —
    Mosaic lowers neither ``erf`` nor ``erfc``, so exact-GELU kernels carry
    their own approximation; 1.5e-7 is far below bf16 resolution and below
    the f32 interpret-test tolerances."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * (2.0**-0.5)))


def _ln(x_f32, g, b):
    mu = jnp.mean(x_f32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x_f32 - mu), axis=-1, keepdims=True)
    return (x_f32 - mu) * lax.rsqrt(var + _LN_EPS) * g + b


def _dot(a, b):
    return lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _attn_half_kernel(
    num_heads, head_dim,
    x_ref, g1, b1, wqkv, bqkv, wproj, bproj, o_ref, lg_ref, att_ref,
):
    S = x_ref.shape[1]
    E = num_heads * head_dim
    dt = x_ref.dtype
    scale = head_dim**-0.5
    x = x_ref[0]  # (S, E)
    h = _ln(x.astype(jnp.float32), g1[...], b1[...]).astype(dt)
    qkv = (_dot(h, wqkv[...]) + bqkv[...]).astype(dt)  # (S, 3E)
    for hd in range(num_heads):
        q = qkv[:, hd * head_dim : (hd + 1) * head_dim]
        k = qkv[:, E + hd * head_dim : E + (hd + 1) * head_dim]
        lg_ref[hd] = (
            lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )
    lg = lg_ref[...]
    m = jnp.max(lg, axis=-1, keepdims=True)
    p = jnp.exp(lg - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dt)
    for hd in range(num_heads):
        v = qkv[:, 2 * E + hd * head_dim : 2 * E + (hd + 1) * head_dim]
        att_ref[:, hd * head_dim : (hd + 1) * head_dim] = jnp.dot(
            p[hd], v, preferred_element_type=jnp.float32
        ).astype(dt)
    res = _dot(att_ref[...], wproj[...]) + bproj[...]
    o_ref[0] = (x.astype(jnp.float32) + res).astype(o_ref.dtype)


def _mlp_half_kernel(
    x_ref, g2, b2, wfc1, bfc1, wfc2, bfc2,
    ga, ba, wdn, bdn, wup, bup, o_ref,
):
    dt = x_ref.dtype
    x1 = x_ref[0]  # (S, E)
    x1f = x1.astype(jnp.float32)

    h = _ln(x1f, g2[...], b2[...]).astype(dt)
    h = _dot(h, wfc1[...]) + bfc1[...]  # (S, 4E) f32
    h = _gelu_exact(h).astype(dt)
    mlp = _dot(h, wfc2[...]) + bfc2[...]  # (S, E) f32

    # wup/bup arrive pre-scaled by the adapter's scalar `scale` (Mosaic
    # rejects broadcasting a (1,1) VMEM scalar to the full tile).
    a = _ln(x1f, ga[...], ba[...]).astype(dt)
    a = jnp.maximum(_dot(a, wdn[...]) + bdn[...], 0.0).astype(dt)  # (S, bottleneck)
    a = _dot(a, wup[...]) + bup[...]  # (S, E) f32

    # reference double residual: out = mlp + (x1 + scaled_up) + x1
    o_ref[0] = (mlp + a + 2.0 * x1f).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _apf_block_pallas(x, weights, num_heads: int, *, interpret: bool = False):
    B, S, E = x.shape
    D = E // num_heads
    dt = x.dtype
    (g1, b1, wqkv, bqkv, wproj, bproj,
     g2, b2, wfc1, bfc1, wfc2, bfc2,
     ga, ba, wdn, bdn, wup, bup, ascale) = weights
    row = lambda v: v.reshape(1, -1).astype(dt)
    mat = lambda v: v.astype(dt)

    attn_in = [mat(x), row(g1), row(b1), mat(wqkv), row(bqkv), mat(wproj), row(bproj)]
    attn_specs = [
        pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    ] + [
        pl.BlockSpec(t.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
        for t in attn_in[1:]
    ]
    x1 = pl.pallas_call(
        functools.partial(_attn_half_kernel, num_heads, D),
        grid=(B,),
        in_specs=attn_specs,
        out_specs=pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, E), dt),
        scratch_shapes=[
            pltpu.VMEM((num_heads, S, S), jnp.float32),
            pltpu.VMEM((S, E), dt),
        ],
        interpret=interpret,
    )(*attn_in)

    s = ascale.reshape(()).astype(jnp.float32)
    mlp_in = [
        x1, row(g2), row(b2), mat(wfc1), row(bfc1), mat(wfc2), row(bfc2),
        row(ga), row(ba), mat(wdn), row(bdn),
        mat(wup.astype(jnp.float32) * s), row(bup.astype(jnp.float32) * s),
    ]
    mlp_specs = [
        pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    ] + [
        pl.BlockSpec(t.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
        for t in mlp_in[1:]
    ]
    return pl.pallas_call(
        _mlp_half_kernel,
        grid=(B,),
        in_specs=mlp_specs,
        out_specs=pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, E), dt),
        interpret=interpret,
    )(*mlp_in)


def reference_apf_block(x, weights, num_heads: int):
    """jnp equivalent (bf16 compute, f32 LN stats) — backward recompute and
    interpret oracle. Mirrors APFBlock's XLA inference math exactly."""
    (g1, b1, wqkv, bqkv, wproj, bproj,
     g2, b2, wfc1, bfc1, wfc2, bfc2,
     ga, ba, wdn, bdn, wup, bup, ascale) = weights
    B, S, E = x.shape
    dt = x.dtype
    c = lambda v: v.astype(dt)

    def ln(t, g, b):
        return _ln(t.astype(jnp.float32), g.astype(jnp.float32), b.astype(jnp.float32)).astype(dt)

    h = ln(x, g1, b1)
    qkv = h @ c(wqkv) + c(bqkv)
    r = qkv.reshape(B, S, 3, num_heads, E // num_heads)
    q, k, v = r[:, :, 0], r[:, :, 1], r[:, :, 2]
    logits = jnp.einsum("bshd,bthd->bhst", q, k) * ((E // num_heads) ** -0.5)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dt)
    att = jnp.einsum("bhst,bthd->bshd", w, v).reshape(B, S, E)
    x1 = x + (att @ c(wproj) + c(bproj))

    h = ln(x1, g2, b2)
    h = jax.nn.gelu(h @ c(wfc1) + c(bfc1), approximate=False)
    mlp = h @ c(wfc2) + c(bfc2)

    a = ln(x1, ga, ba)
    a = jnp.maximum(a @ c(wdn) + c(bdn), 0.0)
    a = (a @ c(wup) + c(bup)) * c(ascale)[0]
    return mlp + a + 2.0 * x1


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_apf_block(x, weights, num_heads: int, interpret: bool = False):
    """Whole APF block (inference), fused; x: (B, S, E) → (B, S, E)."""
    return _apf_block_pallas(x, tuple(weights), num_heads, interpret=interpret)


def _fab_fwd(x, weights, num_heads, interpret):
    out = _apf_block_pallas(x, tuple(weights), num_heads, interpret=interpret)
    return out, (x, tuple(weights))


def _fab_bwd(num_heads, interpret, res, g):
    x, weights = res
    _, vjp = jax.vjp(lambda t, w: reference_apf_block(t, w, num_heads), x, weights)
    return vjp(g)


fused_apf_block.defvjp(_fab_fwd, _fab_bwd)


def apf_block_weights(params):
    """Flatten an APFBlock param subtree into the kernel's 19-tuple (f32)."""
    p = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    return (
        p["norm1"]["scale"], p["norm1"]["bias"],
        p["attention"]["qkv"]["kernel"], p["attention"]["qkv"]["bias"],
        p["attention"]["proj"]["kernel"], p["attention"]["proj"]["bias"],
        p["norm2"]["scale"], p["norm2"]["bias"],
        p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
        p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"],
        p["adapter"]["adapter_norm"]["scale"], p["adapter"]["adapter_norm"]["bias"],
        p["adapter"]["down_proj"]["kernel"], p["adapter"]["down_proj"]["bias"],
        p["adapter"]["up_proj"]["kernel"], p["adapter"]["up_proj"]["bias"],
        p["adapter"]["scale"],
    )
