"""Block-fused transformer attention half: LN1 + qkv GEMM + attention +
out-proj + residual in ONE Pallas call per layer (forward only).

This is the round-3 verdict's requested structural experiment: instead of
the shipped boundary (XLA LN+GEMMs around a Pallas attention kernel, ref
layout study in docs/experiments.md), the whole pre-MLP half of a
transformer block runs inside one kernel, keeping the LN-normalized
activations and qkv VMEM-resident — which would delete the LN-stat
convert_reduce reads, the qkv relayout copies, and one custom-call
boundary per layer IF the in-kernel GEMMs can match XLA's MXU scheduling.
Prior per-layer fusions (LN->GEMM +22 ms, fused-MLP +17 ms) say they
can't; this kernel exists to measure the question at the block
granularity the round-2 ledger proposed ("ONE big kernel per family").

Measured on chip by scripts/bench_block_kernel.py; see docs/experiments.md
for the verdict. Reference model structure: ResidualAttentionBlock
(/root/reference/src/open_clip/transformer.py pre-LN ordering
x + attn(ln_1(x))).

Forward-only by design: the A/B question (in-kernel GEMM vs XLA GEMM +
boundary tax) is settled by the inference path; the backward (3x the GEMM
work) only multiplies whichever side wins.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spatial_clip_tpu.ops.fused_attention import (
    VMEM_LIMIT_BYTES,
    _one_head_fwd,
    _pack_ok,
    _packed_mask,
    _pair_fwd,
    _pick_block_b,
)

BLOCK_CAP = 32


def _block_kernel(x_ref, lng_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref,
                  bout_ref, mask_ref, o_ref, *, heads, eps, packed):
    bb, L, D = x_ref.shape
    hd = D // heads
    scale = hd ** -0.5
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    # one-pass LN stats (the model's ln_impl='onepass' math)
    mean = xf.mean(axis=-1, keepdims=True)
    m2 = (xf * xf).mean(axis=-1, keepdims=True)
    var = jnp.maximum(m2 - mean * mean, 0.0)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * lng_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)
    h = h.astype(x.dtype).reshape(bb * L, D)
    # qkv projection on the MXU; f32 accumulate, bf16 activations out
    qkv = jax.lax.dot_general(
        h, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
    qkv = qkv.reshape(bb, L, 3 * D)
    mask = mask_ref[...]
    half = bb // 2
    outs = [None] * heads
    for s in range(heads):  # static sub-head loop, lane slices stay in VMEM
        q = qkv[:, :, s * hd:(s + 1) * hd]
        k = qkv[:, :, D + s * hd:D + (s + 1) * hd]
        v = qkv[:, :, 2 * D + s * hd:2 * D + (s + 1) * hd]
        if packed:  # mask is the (2Lp,2Lp) block-diagonal packed mask
            oa, ob = _pair_fwd(
                (q[:half], q[half:]), (k[:half], k[half:]),
                (v[:half], v[half:]), mask, scale,
            )
            outs[s] = jnp.concatenate([oa, ob], axis=0).astype(x.dtype)
        else:
            outs[s] = _one_head_fwd(q, k, v, mask, scale).astype(x.dtype)
    att = jnp.concatenate(outs, axis=-1).reshape(bb * L, D)
    o = jax.lax.dot_general(
        att, wout_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o = o + bout_ref[...].astype(jnp.float32)
    o_ref[...] = (xf + o.reshape(bb, L, D)).astype(x.dtype)


def fused_block_attn(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w_qkv: jnp.ndarray,
    b_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    b_out: jnp.ndarray,
    mask: jnp.ndarray | None,
    heads: int,
    eps: float = 1e-5,
    interpret: bool = False,
    block_cap: int | None = None,
) -> jnp.ndarray:
    """x + out_proj(attention(qkv_proj(LN(x)))) as one Pallas call.

    x (B,L,D) bf16; weights in the model's natural layouts (w_qkv (D,3D),
    w_out (D,D)). Weights use constant-index BlockSpecs so Mosaic keeps
    them resident across the batch-block grid. Forward only.
    """
    B, L, D = x.shape
    assert D % heads == 0
    bb = _pick_block_b(B, block_cap or BLOCK_CAP)
    grid = (B // bb,)
    m = (jnp.zeros((L, L), jnp.float32) if mask is None
         else mask.astype(jnp.float32))
    packed = _pack_ok(bb, L)
    if packed:
        m = _packed_mask(m, L)
    kern = functools.partial(_block_kernel, heads=heads, eps=eps, packed=packed)
    const = lambda i: (0, 0)  # noqa: E731 — weights: same block every step
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, L, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((D, 3 * D), const),
            pl.BlockSpec((1, 3 * D), const),
            pl.BlockSpec((D, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec(m.shape, const),
        ],
        out_specs=pl.BlockSpec((bb, L, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
        ),
        interpret=interpret,
    )(
        x, ln_scale.reshape(1, D), ln_bias.reshape(1, D), w_qkv,
        b_qkv.reshape(1, 3 * D), w_out, b_out.reshape(1, D), m,
    )
    return out


def reference_block_attn(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                         mask, heads, eps: float = 1e-5):
    """The shipped-stack formulation of the same block half (one-pass LN,
    XLA GEMMs, per-head fp32-softmax attention) for parity checks and as
    the XLA-side A/B arm on CPU."""
    B, L, D = x.shape
    hd = D // heads
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    m2 = (xf * xf).mean(axis=-1, keepdims=True)
    var = jnp.maximum(m2 - mean * mean, 0.0)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = (h * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)).astype(x.dtype)
    qkv = (h.reshape(B * L, D) @ w_qkv + b_qkv).astype(x.dtype)
    q, k, v = jnp.split(qkv.reshape(B, L, 3 * D), 3, axis=-1)
    q = q.reshape(B, L, heads, hd)
    k = k.reshape(B, L, heads, hd)
    v = v.reshape(B, L, heads, hd)
    s = jnp.einsum("blhd,bmhd->bhlm", q, k).astype(jnp.float32) * hd ** -0.5
    if mask is not None:
        s = s + mask.astype(jnp.float32)[None, None]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhlm,bmhd->blhd", p.astype(v.dtype), v).reshape(B, L, D)
    o = o.reshape(B * L, D) @ w_out + b_out
    return (xf + o.reshape(B, L, D).astype(jnp.float32)).astype(x.dtype)
