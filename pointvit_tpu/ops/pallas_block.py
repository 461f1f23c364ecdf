"""Pallas TPU kernels: whole ViT blocks as two fused kernels each.

Three block flavours, one file — they share the LN/GELU/two-pass-attention
machinery below. Each rebuilds the inference path of a reference block as an
attention-half kernel and an MLP-half kernel:

- :func:`fused_apf_block` — the reference ``APFViTLayer``
  (apf_utils.py:236-293), including its double-counted residual:
  ``x1 = x + proj(MHA(qkv(LN1(x))))``;
  ``out = fc2(gelu(fc1(LN2(x1)))) + s·up(relu(down(LNa(x1)))) + 2·x1``.
- :func:`fused_vit_block` — the standard pre-norm timm block used by
  Pix4Point's trunk (pix4point.py:254-255), with the per-block positional
  re-add folded into the attention half.
- :func:`fused_serial_block` — the torchvision encoder block with serial
  adapters (apf_utils.py:328-375) used per-view by the renderer classifier.

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

__all__ = [
    "fused_apf_block",
    "apf_block_weights",
    "reference_apf_block",
    "fused_vit_block",
    "vit_block_weights",
    "reference_vit_block",
    "fused_serial_block",
    "serial_block_weights",
    "reference_serial_block",
]

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


_VIT_ATTN_SCRATCH_BUDGET = 4 * 2**20  # f32 logits scratch bytes (per grid step)


def _vit_attn_chunk(S: int, num_heads: int) -> int:
    """Heads per two-pass chunk whose (ch, S, S) f32 scratch fits the budget
    (always ≥ 1: a single head's logits tile is the kernel's working set)."""
    ch = min(num_heads, max(1, _VIT_ATTN_SCRATCH_BUDGET // (S * S * 4)))
    while ch > 1 and num_heads % ch:
        ch -= 1
    return ch


def fused_block_shapes_ok(S: int, E: int, num_heads: int) -> bool:
    """Shapes the fused block kernels support (the auto-dispatch gate).

    ``E % num_heads == 0`` is a correctness requirement: the kernels slice a
    packed (S, 3E) qkv tile at head_dim boundaries, so a non-dividing head
    count would silently mis-slice (the XLA path raises on its reshape
    instead). The S bound keeps even the single-head (1, S, S) f32 logits
    scratch within the per-step VMEM budget; the head_dim alignment keeps the
    lane-dimension qkv slices on boundaries Mosaic handles well (all shipped
    models use D = 64)."""
    if E % num_heads:
        return False
    head_dim = E // num_heads
    return head_dim % 8 == 0 and S * S * 4 <= _VIT_ATTN_SCRATCH_BUDGET


def _attn_two_pass(qkv, num_heads, head_dim, chunk, lg_ref, att_ref, dt):
    """Head-chunked two-pass MHA over a packed VMEM qkv tile: all of a
    chunk's QK^T matmuls into the f32 scratch → one vectorized softmax → the
    chunk's PV matmuls into ``att_ref``. The measured MXU/VPU pipelining win
    (ops/pallas_attention.py)."""
    E = num_heads * head_dim
    scale = head_dim**-0.5
    for c in range(0, num_heads, chunk):
        for j in range(chunk):
            hd = c + j
            q = qkv[:, hd * head_dim : (hd + 1) * head_dim]
            k = qkv[:, E + hd * head_dim : E + (hd + 1) * head_dim]
            lg_ref[j] = (
                lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
                * scale
            )
        lg = lg_ref[...]
        m = jnp.max(lg, axis=-1, keepdims=True)
        p = jnp.exp(lg - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dt)
        for j in range(chunk):
            hd = c + j
            v = qkv[:, 2 * E + hd * head_dim : 2 * E + (hd + 1) * head_dim]
            att_ref[:, hd * head_dim : (hd + 1) * head_dim] = jnp.dot(
                p[j], v, preferred_element_type=jnp.float32
            ).astype(dt)


def _reference_mha(x, wqkv, bqkv, wproj, bproj, num_heads: int):
    """Shared einsum MHA oracle (compute-dtype matmuls, f32 softmax):
    ``proj(MHA(qkv(x)))``. The single source of truth the three
    ``reference_*_block`` functions build on — keep any precision/tolerance
    fix here so the interpret oracles cannot diverge from each other."""
    B, S, E = x.shape
    dt = x.dtype
    c = lambda v: v.astype(dt)
    qkv = x @ c(wqkv) + c(bqkv)
    r = qkv.reshape(B, S, 3, num_heads, E // num_heads)
    q, k, v = r[:, :, 0], r[:, :, 1], r[:, :, 2]
    logits = jnp.einsum("bshd,bthd->bhst", q, k) * ((E // num_heads) ** -0.5)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dt)
    att = jnp.einsum("bhst,bthd->bshd", w, v).reshape(B, S, E)
    return att @ c(wproj) + c(bproj)


def _attn_half_kernel(
    num_heads, head_dim, chunk,
    x_ref, g1, b1, wqkv, bqkv, wproj, bproj, o_ref, lg_ref, att_ref,
):
    dt = x_ref.dtype
    x = x_ref[0]  # (S, E)
    h = _ln(x.astype(jnp.float32), g1[...], b1[...]).astype(dt)
    qkv = (_dot(h, wqkv[...]) + bqkv[...]).astype(dt)  # (S, 3E)
    _attn_two_pass(qkv, num_heads, head_dim, chunk, lg_ref, att_ref, dt)
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
    chunk = _vit_attn_chunk(S, num_heads)

    attn_in = [mat(x), row(g1), row(b1), mat(wqkv), row(bqkv), mat(wproj), row(bproj)]
    attn_specs = [
        pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    ] + [
        pl.BlockSpec(t.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
        for t in attn_in[1:]
    ]
    x1 = pl.pallas_call(
        functools.partial(_attn_half_kernel, num_heads, D, chunk),
        grid=(B,),
        in_specs=attn_specs,
        out_specs=pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, E), dt),
        scratch_shapes=[
            pltpu.VMEM((chunk, S, S), jnp.float32),
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
    dt = x.dtype
    c = lambda v: v.astype(dt)

    def ln(t, g, b):
        return _ln(t.astype(jnp.float32), g.astype(jnp.float32), b.astype(jnp.float32)).astype(dt)

    h = ln(x, g1, b1)
    x1 = x + _reference_mha(h, wqkv, bqkv, wproj, bproj, num_heads)

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


# ---------------------------------------------------------------------------
# Fused standard pre-norm ViT block (Pix4Point trunk, pix4point.py:254-255):
#
#     attn half:  x1  = xp + proj(MHA(qkv(LN1(xp)))),  xp = x + pos
#     mlp half:   out = x1 + fc2(gelu(fc1(LN2(x1))))
#
# Pix4Point re-adds the positional embedding before *every* block, so the
# attn half takes `pos` as an operand and forms xp in VMEM — the (B, S, E)
# x+pos tensor never exists in HBM. At the Pix4Point shape (S=513, H=6) the
# full-head (H, S, S) f32 logits scratch is 6.3 MB, over the scoped-VMEM
# comfort zone next to the double-buffered activation blocks, so the
# attention runs the head-chunked two-pass schedule (all of a chunk's QK^T →
# one softmax → the chunk's PV; see ops/pallas_attention.py for the
# measured MXU/VPU pipelining rationale).
# ---------------------------------------------------------------------------


def _vit_attn_half_kernel(num_heads, head_dim, chunk, has_pos, *refs):
    if has_pos:
        x_ref, pos_ref, g1, b1, wqkv, bqkv, wproj, bproj, o_ref, lg_ref, att_ref = refs
    else:
        x_ref, g1, b1, wqkv, bqkv, wproj, bproj, o_ref, lg_ref, att_ref = refs
    dt = x_ref.dtype
    x = x_ref[0]  # (S, E)
    if has_pos:
        x = x + pos_ref[0]  # compute-dtype add, matching the model's x + pos
    h = _ln(x.astype(jnp.float32), g1[...], b1[...]).astype(dt)
    qkv = (_dot(h, wqkv[...]) + bqkv[...]).astype(dt)  # (S, 3E), VMEM-only
    _attn_two_pass(qkv, num_heads, head_dim, chunk, lg_ref, att_ref, dt)
    res = _dot(att_ref[...], wproj[...]) + bproj[...]
    o_ref[0] = (x.astype(jnp.float32) + res).astype(o_ref.dtype)


def _vit_mlp_half_kernel(x_ref, g2, b2, wfc1, bfc1, wfc2, bfc2, o_ref):
    dt = x_ref.dtype
    x1f = x_ref[0].astype(jnp.float32)  # (S, E)
    h = _ln(x1f, g2[...], b2[...]).astype(dt)
    h = _gelu_exact(_dot(h, wfc1[...]) + bfc1[...]).astype(dt)  # (S, hidden)
    mlp = _dot(h, wfc2[...]) + bfc2[...]  # (S, E) f32
    o_ref[0] = (x1f + mlp).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _vit_block_pallas(x, weights, num_heads: int, pos=None, *, interpret: bool = False):
    B, S, E = x.shape
    D = E // num_heads
    dt = x.dtype
    g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, wfc1, bfc1, wfc2, bfc2 = weights
    row = lambda v: v.reshape(1, -1).astype(dt)
    mat = lambda v: v.astype(dt)
    has_pos = pos is not None
    chunk = _vit_attn_chunk(S, num_heads)

    attn_in = [mat(x)]
    attn_specs = [pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)]
    if has_pos:
        p = pos.astype(dt)
        if p.ndim == 2:
            p = p[None]
        if p.shape[0] == 1:
            # Shared positional embedding: keep ONE (1, S, E) copy in HBM and
            # stream the same tile to every grid step via a constant-index
            # BlockSpec — broadcast_to here would re-read B copies per block.
            attn_in.append(jnp.broadcast_to(p, (1, S, E)))
            attn_specs.append(
                pl.BlockSpec((1, S, E), lambda b: (0, 0, 0), memory_space=pltpu.VMEM)
            )
        else:
            attn_in.append(jnp.broadcast_to(p, (B, S, E)))
            attn_specs.append(
                pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
            )
    attn_in += [row(g1), row(b1), mat(wqkv), row(bqkv), mat(wproj), row(bproj)]
    attn_specs += [
        pl.BlockSpec(t.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
        for t in attn_in[1 + has_pos :]
    ]
    x1 = pl.pallas_call(
        functools.partial(_vit_attn_half_kernel, num_heads, D, chunk, has_pos),
        grid=(B,),
        in_specs=attn_specs,
        out_specs=pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, E), dt),
        scratch_shapes=[
            pltpu.VMEM((chunk, S, S), jnp.float32),
            pltpu.VMEM((S, E), dt),
        ],
        interpret=interpret,
    )(*attn_in)

    mlp_in = [x1, row(g2), row(b2), mat(wfc1), row(bfc1), mat(wfc2), row(bfc2)]
    mlp_specs = [
        pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    ] + [
        pl.BlockSpec(t.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
        for t in mlp_in[1:]
    ]
    return pl.pallas_call(
        _vit_mlp_half_kernel,
        grid=(B,),
        in_specs=mlp_specs,
        out_specs=pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, E), dt),
        interpret=interpret,
    )(*mlp_in)


def reference_vit_block(x, weights, num_heads: int, pos=None):
    """jnp equivalent (compute-dtype matmuls, f32 LN stats) — backward
    recompute and interpret oracle. Mirrors ViTBlock's XLA inference math."""
    g1, b1, wqkv, bqkv, wproj, bproj, g2, b2, wfc1, bfc1, wfc2, bfc2 = weights
    dt = x.dtype
    c = lambda v: v.astype(dt)

    def ln(t, g, b):
        return _ln(
            t.astype(jnp.float32), g.astype(jnp.float32), b.astype(jnp.float32)
        ).astype(dt)

    if pos is not None:
        x = x + pos.astype(dt)
    h = ln(x, g1, b1)
    x1 = x + _reference_mha(h, wqkv, bqkv, wproj, bproj, num_heads)

    h = ln(x1, g2, b2)
    h = jax.nn.gelu(h @ c(wfc1) + c(bfc1), approximate=False)
    return x1 + (h @ c(wfc2) + c(bfc2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 4))
def fused_vit_block(x, weights, num_heads: int, pos=None, interpret: bool = False):
    """Whole standard pre-norm ViT block (inference), fused as two Pallas
    kernels; x: (B, S, E) → (B, S, E). ``pos`` (broadcastable to x) is added
    in-kernel before LN1 and the attention residual — Pix4Point's per-block
    positional re-add (pix4point.py:254-255) without an HBM materialization."""
    return _vit_block_pallas(x, tuple(weights), num_heads, pos, interpret=interpret)


def _fvb_fwd(x, weights, num_heads, pos, interpret):
    out = _vit_block_pallas(x, tuple(weights), num_heads, pos, interpret=interpret)
    return out, (x, tuple(weights), pos)


def _fvb_bwd(num_heads, interpret, res, g):
    x, weights, pos = res
    if pos is None:
        _, vjp = jax.vjp(lambda t, w: reference_vit_block(t, w, num_heads), x, weights)
        return (*vjp(g), None)
    _, vjp = jax.vjp(
        lambda t, w, p: reference_vit_block(t, w, num_heads, p), x, weights, pos
    )
    return vjp(g)


fused_vit_block.defvjp(_fvb_fwd, _fvb_bwd)


def vit_block_weights(params):
    """Flatten a ViTBlock param subtree into the kernel's 12-tuple (f32)."""
    p = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    return (
        p["norm1"]["scale"], p["norm1"]["bias"],
        p["attn"]["qkv"]["kernel"], p["attn"]["qkv"]["bias"],
        p["attn"]["proj"]["kernel"], p["attn"]["proj"]["bias"],
        p["norm2"]["scale"], p["norm2"]["bias"],
        p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
        p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"],
    )


# ---------------------------------------------------------------------------
# Fused serial-adapter ViT block (renderer classifier path,
# apf_utils.py:328-375 / nn/vit.py::SerialAdapterBlock):
#
#     attn half:  y  = proj(MHA(qkv(LN1(x))));  x1  = x  + y + up1(gelu(dn1(y)))
#     mlp half:   m  = fc2(gelu(fc1(LN2(x1)))); out = x1 + m + up2(gelu(dn2(m)))
#
# (each SimpleAdapter is residual: a(y) = y + up(gelu(down(y))).) At the
# renderer shape (B·V, S=197, E=768, H=12) the full-head (12, S, S) f32
# logits scratch is 1.86 MB — the two-pass schedule runs un-chunked.
# ---------------------------------------------------------------------------


def _serial_attn_half_kernel(
    num_heads, head_dim, chunk,
    x_ref, g1, b1, wqkv, bqkv, wproj, bproj, wd1, bd1, wu1, bu1,
    o_ref, lg_ref, att_ref,
):
    dt = x_ref.dtype
    x = x_ref[0]  # (S, E)
    h = _ln(x.astype(jnp.float32), g1[...], b1[...]).astype(dt)
    qkv = (_dot(h, wqkv[...]) + bqkv[...]).astype(dt)  # (S, 3E), VMEM-only
    _attn_two_pass(qkv, num_heads, head_dim, chunk, lg_ref, att_ref, dt)
    y = _dot(att_ref[...], wproj[...]) + bproj[...]  # (S, E) f32
    ydt = y.astype(dt)
    a = _dot(_gelu_exact(_dot(ydt, wd1[...]) + bd1[...]).astype(dt), wu1[...]) + bu1[...]
    o_ref[0] = (x.astype(jnp.float32) + y + a).astype(o_ref.dtype)


def _serial_mlp_half_kernel(
    x_ref, g2, b2, wfc1, bfc1, wfc2, bfc2, wd2, bd2, wu2, bu2, o_ref
):
    dt = x_ref.dtype
    x1f = x_ref[0].astype(jnp.float32)  # (S, E)
    h = _ln(x1f, g2[...], b2[...]).astype(dt)
    h = _gelu_exact(_dot(h, wfc1[...]) + bfc1[...]).astype(dt)  # (S, hidden)
    m = _dot(h, wfc2[...]) + bfc2[...]  # (S, E) f32
    mdt = m.astype(dt)
    a = _dot(_gelu_exact(_dot(mdt, wd2[...]) + bd2[...]).astype(dt), wu2[...]) + bu2[...]
    o_ref[0] = (x1f + m + a).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _serial_block_pallas(x, weights, num_heads: int, *, interpret: bool = False):
    B, S, E = x.shape
    D = E // num_heads
    dt = x.dtype
    (g1, b1, wqkv, bqkv, wproj, bproj, wd1, bd1, wu1, bu1,
     g2, b2, wfc1, bfc1, wfc2, bfc2, wd2, bd2, wu2, bu2) = weights
    row = lambda v: v.reshape(1, -1).astype(dt)
    mat = lambda v: v.astype(dt)
    chunk = _vit_attn_chunk(S, num_heads)

    attn_in = [
        mat(x), row(g1), row(b1), mat(wqkv), row(bqkv), mat(wproj), row(bproj),
        mat(wd1), row(bd1), mat(wu1), row(bu1),
    ]
    attn_specs = [
        pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    ] + [
        pl.BlockSpec(t.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
        for t in attn_in[1:]
    ]
    x1 = pl.pallas_call(
        functools.partial(_serial_attn_half_kernel, num_heads, D, chunk),
        grid=(B,),
        in_specs=attn_specs,
        out_specs=pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, E), dt),
        scratch_shapes=[
            pltpu.VMEM((chunk, S, S), jnp.float32),
            pltpu.VMEM((S, E), dt),
        ],
        interpret=interpret,
    )(*attn_in)

    mlp_in = [
        x1, row(g2), row(b2), mat(wfc1), row(bfc1), mat(wfc2), row(bfc2),
        mat(wd2), row(bd2), mat(wu2), row(bu2),
    ]
    mlp_specs = [
        pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    ] + [
        pl.BlockSpec(t.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
        for t in mlp_in[1:]
    ]
    return pl.pallas_call(
        _serial_mlp_half_kernel,
        grid=(B,),
        in_specs=mlp_specs,
        out_specs=pl.BlockSpec((1, S, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, E), dt),
        interpret=interpret,
    )(*mlp_in)


def reference_serial_block(x, weights, num_heads: int):
    """jnp equivalent — backward recompute and interpret oracle. Mirrors
    SerialAdapterBlock's XLA inference math exactly."""
    (g1, b1, wqkv, bqkv, wproj, bproj, wd1, bd1, wu1, bu1,
     g2, b2, wfc1, bfc1, wfc2, bfc2, wd2, bd2, wu2, bu2) = weights
    dt = x.dtype
    c = lambda v: v.astype(dt)

    def ln(t, g, b):
        return _ln(
            t.astype(jnp.float32), g.astype(jnp.float32), b.astype(jnp.float32)
        ).astype(dt)

    def adapter(y, wd, bd, wu, bu):
        h = jax.nn.gelu(y @ c(wd) + c(bd), approximate=False)
        return y + (h @ c(wu) + c(bu))

    h = ln(x, g1, b1)
    y = _reference_mha(h, wqkv, bqkv, wproj, bproj, num_heads)
    x1 = x + adapter(y, wd1, bd1, wu1, bu1)

    h = ln(x1, g2, b2)
    h = jax.nn.gelu(h @ c(wfc1) + c(bfc1), approximate=False)
    m = h @ c(wfc2) + c(bfc2)
    return x1 + adapter(m, wd2, bd2, wu2, bu2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_serial_block(x, weights, num_heads: int, interpret: bool = False):
    """Whole serial-adapter ViT block (inference), fused as two Pallas
    kernels; x: (B, S, E) → (B, S, E)."""
    return _serial_block_pallas(x, tuple(weights), num_heads, interpret=interpret)


def _fsb_fwd(x, weights, num_heads, interpret):
    out = _serial_block_pallas(x, tuple(weights), num_heads, interpret=interpret)
    return out, (x, tuple(weights))


def _fsb_bwd(num_heads, interpret, res, g):
    x, weights = res
    _, vjp = jax.vjp(lambda t, w: reference_serial_block(t, w, num_heads), x, weights)
    return vjp(g)


fused_serial_block.defvjp(_fsb_fwd, _fsb_bwd)


def serial_block_weights(params):
    """Flatten a SerialAdapterBlock param subtree into the kernel 20-tuple."""
    p = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    return (
        p["ln_1"]["scale"], p["ln_1"]["bias"],
        p["self_attention"]["qkv"]["kernel"], p["self_attention"]["qkv"]["bias"],
        p["self_attention"]["proj"]["kernel"], p["self_attention"]["proj"]["bias"],
        p["adapter1"]["down_proj"]["kernel"], p["adapter1"]["down_proj"]["bias"],
        p["adapter1"]["up_proj"]["kernel"], p["adapter1"]["up_proj"]["bias"],
        p["ln_2"]["scale"], p["ln_2"]["bias"],
        p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
        p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"],
        p["adapter2"]["down_proj"]["kernel"], p["adapter2"]["down_proj"]["bias"],
        p["adapter2"]["up_proj"]["kernel"], p["adapter2"]["up_proj"]["bias"],
    )


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
