"""Fused multi-head attention as a Pallas TPU kernel (fwd + custom VJP).

Why this exists (round-2 headline optimization): the optimized-HLO inventory
(scripts/analyze_hlo.py) shows the dominant copy overhead of the train step —
~15% of device time — is the q/k/v ``(B,L,D) -> (B,L,H,hd)`` head-split
reshapes: with head_dim 64 < the 128-lane TPU tile every 4D head-split array
is physically padded (2.2x, per the B=1024 OOM dump), so XLA materializes a
relayout per reshape (3 fwd + 3 bwd per block, both towers). Re-expressing
the reshape as an einsum projection just moves the relayout into the dot
(measured slower, docs/experiments.md).

This kernel removes the 4D head-split arrays from HBM entirely: it consumes
the *raw fused-qkv GEMM output* ``(B, L, 3*D)`` exactly as XLA produced it.
Mosaic requires block lane counts divisible by 128, so each grid step
(batch-block i, head-group j) DMAs a 128-lane group of ``heads_per_block =
128 // head_dim`` adjacent heads for q/k/v, splits the sub-heads inside VMEM
(a vector-register operation, not an HBM relayout), runs scores -> fp32
softmax -> weighted sum per sub-head, and writes its lane group of the
output. No intermediate ever round-trips HBM, and the softmax's
dtype-converting reductions (another profiled family) fuse in too.

The backward pass is the standard attention VJP, recomputed per block in a
second Pallas kernel; dq/dk/dv are emitted as three ``(B, L, D)`` arrays and
concatenated into the qkv cotangent.

Semantics match the ``einsum`` path (fp32 softmax statistics): parity is
enforced by tests/test_fused_attention.py.

Ref analogue: src/open_clip/transformer.py:92-213 (torch F.scaled_dot_product
attention path); this is the TPU-native replacement.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Fast-softmax (default): keep the real per-row max subtraction (exact,
# overflow-proof softmax — never produces inf/NaN for any score magnitude)
# but fold the 1/sum normalization into the (smaller) output tile AFTER the
# PV dot — that post-dot fold, not the shift, was most of the original
# fixed-shift win (it saves a (bB,L,L)-wide elementwise pass per sub-head;
# the max reduce itself hides under the kernel's DMA-bound profile).
#
# The original FIXED-shift formulation (exp(s - 20), no row reduce) ships
# as the FIXED_SHIFT=True knob (arm suffix '~shift') for A/B evidence, but
# is retired as the default: scores beyond +108 overflow exp to inf and the
# whole row NaNs. That is NOT a diverged-training-only regime — a
# repeated-batch ViT-B run with HEALTHY loss (~5.45) crossed the cliff at
# step ~192 while the running-max formulation sailed on (loss 5.37 at 288;
# reports/nan_check_r3s6, docs/experiments.md round-3 session 6). The
# reference's softmax (torch SDPA running max) tolerates arbitrary score
# scales, so the default must too. Underflow: with a real row max the
# exp-sum is always >= 1, so the 1e-30 denominator clamps below can never
# engage in fast mode (they remain for the fixed-shift knob).
# FAST_SOFTMAX=False restores the textbook pre-dot normalization
# (arm suffix '~safe').
FAST_SOFTMAX = True
FIXED_SHIFT = False
_FAST_SHIFT = 20.0


def _spmd():
    from spatial_clip_tpu.ops import attention_spmd

    return attention_spmd


def _fast_shift(s):
    """Shift for the fast-softmax exp: the per-row max (exact, safe) or the
    retired fixed constant when FIXED_SHIFT is pinned."""
    if FIXED_SHIFT:
        return _FAST_SHIFT
    return jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))

# Packed batch-pairs: when L <= 64, each sub-head's dots cover a PAIR of
# batch rows block-diagonally — ONE scores dot ((2Lp,hd)x(hd,2Lp)) and ONE
# PV dot ((2Lp,2Lp)x(2Lp,hd)) per row pair — by stacking the two rows along
# the sequence axis (at the sublane-tile-aligned offset Lp = roundup(L,16),
# free: the MXU pads every dim to 128 anyway) and masking the off-blocks to
# -1e30 (exp underflows to exactly 0, so the math is exact). At ViT
# geometry (L=50, hd=64) the unpacked per-row dots waste ~94% of each
# 128x128 MXU pass to padding (M=N=50, K=64); packing halves the pass
# count. Text towers with L=77 keep the unpacked path automatically.
# Batch-pairing (not sub-head-pairing) keeps every Mosaic operand at lane
# offset 0 — sub-head pairs would need a bf16 lane rotate, unimplemented.
# Model-level: -0.3 ms (reports/ab_pack3_r2.json) — the kernel is DMA-bound,
# so the MXU saving mostly hides; exact math, so the small win ships on.
PACK_PAIRS = True
_PACK_MASK_NEG = -1e30


def _roundup16(n: int) -> int:
    return -(-n // 16) * 16


def _pack_ok(block_b: int, L: int) -> bool:
    # 2L >= Lp lets the zero gap rows be built as a (layout-inheriting)
    # slice of the operand itself — see _pack2
    Lp = _roundup16(L)
    return PACK_PAIRS and block_b % 2 == 0 and 2 * Lp <= 128 and 2 * L >= Lp


def _packed_mask(mask, L):
    """(L,L) additive mask -> (2Lp,2Lp) block-diagonal mask. Off-blocks and
    pad rows/columns get -1e30 (their probabilities underflow to exactly 0);
    the pad-row DIAGONAL stays 0 so those (discarded) softmax rows normalize
    to a finite one-hot instead of 0/0 = NaN, which would poison dv through
    the packed backward dots."""
    Lp = _roundup16(L)
    m = jnp.full((2 * Lp, 2 * Lp), _PACK_MASK_NEG, jnp.float32)
    m = m.at[:L, :L].set(mask)
    m = m.at[Lp:Lp + L, Lp:Lp + L].set(mask)
    idx = jnp.arange(2 * Lp)
    pad = ((idx >= L) & (idx < Lp)) | (idx >= Lp + L)
    return jnp.where(jnp.diag(pad), 0.0, m)


def _pack2(x0, x1, L, Lp):
    """Stack a batch-row pair along the sequence axis at offsets 0 and Lp.
    The zero gap rows are built as ``x0-slice * 0`` rather than a fresh
    jnp.zeros so they inherit the operand's exact vector layout — Mosaic
    refuses to concatenate vectors whose (sublane, lane) offsets differ on
    non-concat dimensions, and constants get assigned arbitrary layouts."""
    if Lp == L:
        return jnp.concatenate([x0, x1], axis=1)
    pad = x0[:, :Lp - L] * jnp.zeros((), x0.dtype)
    return jnp.concatenate([x0, pad, x1, pad], axis=1)  # (bB/2, 2Lp, hd)


def _one_head_fwd(q, k, v, mask, scale, want_lse=False):
    """(bB, L, hd) sub-head attention; fp32 softmax; returns (bB, L, hd),
    or ``(o, lse)`` with the per-row logsumexp of the masked+scaled scores
    when ``want_lse`` (saved as a VJP residual so the backward reconstructs
    p = exp(s - lse) with no max/sum reduce at all)."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    s = s * scale + mask[None]
    if FAST_SOFTMAX:
        shift = _fast_shift(s)
        e = jnp.exp(s - shift)
        sigma = jnp.maximum(e.sum(axis=-1, keepdims=True), 1e-30)
        o = jax.lax.dot_general(
            e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o = o * (1.0 / sigma)
        if want_lse:
            return o, (jnp.log(sigma) + shift)[..., 0]
        return o
    m = s.max(axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    sigma = jnp.maximum(e.sum(axis=-1, keepdims=True), 1e-30)
    p = e / sigma
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if want_lse:
        return o, (jnp.log(sigma) + m)[..., 0]
    return o


def _p_from_scores(s):
    """Normalized attention probs from masked+scaled fp32 scores; honors
    FAST_SOFTMAX (fixed shift instead of the per-row max reduction)."""
    if FAST_SOFTMAX:
        e = jnp.exp(s - _fast_shift(s))
        return e / jnp.maximum(e.sum(axis=-1, keepdims=True), 1e-30)
    s = s - s.max(axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.maximum(e.sum(axis=-1, keepdims=True), 1e-30)


def _pair_fwd(qs, ks, vs, mask2, scale, want_lse=False):
    """Two batch rows packed along the sequence axis into one scores dot and
    one PV dot (mask2 is the (2Lp,2Lp) block-diagonal mask); exact math —
    off-block probabilities are exp(-1e30) == 0. With ``want_lse``, also
    returns the per-row logsumexp for each of the two unpacked row blocks."""
    L = qs[0].shape[1]
    Lp = _roundup16(L)
    qp = _pack2(qs[0], qs[1], L, Lp)  # (bB, 2Lp, hd)
    kp = _pack2(ks[0], ks[1], L, Lp)
    vp = _pack2(vs[0], vs[1], L, Lp)
    s = jax.lax.dot_general(
        qp, kp, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    s = s * scale + mask2[None]
    if FAST_SOFTMAX:
        shift = _fast_shift(s)
        e = jnp.exp(s - shift)
        sigma = jnp.maximum(e.sum(axis=-1, keepdims=True), 1e-30)
        o = jax.lax.dot_general(
            e.astype(vp.dtype), vp, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o = o * (1.0 / sigma)
        lse = jnp.log(sigma) + shift
    else:
        m = s.max(axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        sigma = jnp.maximum(e.sum(axis=-1, keepdims=True), 1e-30)
        p = e / sigma
        o = jax.lax.dot_general(
            p.astype(vp.dtype), vp, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        lse = jnp.log(sigma) + m
    if want_lse:
        lse = lse[..., 0]  # (bB, 2Lp)
        return (o[:, :L], o[:, Lp:Lp + L]), (lse[:, :L], lse[:, Lp:Lp + L])
    return o[:, :L], o[:, Lp:Lp + L]


def _pair_bwd(qs, ks, vs, dos, mask2, scale, lses=None):
    """Packed-pair attention VJP: every (.,L,.) dot of the standard backward
    runs once at (.,2Lp,.) instead of twice; off-block entries of p (and
    hence ds) are exactly zero, so cross terms vanish. With ``lses`` (the
    forward's saved per-row logsumexp for the two row blocks) the
    probabilities come from one exp pass — no max/sum reduce; the _pack2
    zero-padding gives pad rows lse=0, reproducing the legacy one-hot pad
    semantics exactly (diagonal score 0 -> p=1, off-block exp(-1e30)=0)."""
    L = qs[0].shape[1]
    Lp = _roundup16(L)
    qp = _pack2(qs[0], qs[1], L, Lp)
    kp = _pack2(ks[0], ks[1], L, Lp)
    vp = _pack2(vs[0], vs[1], L, Lp)
    dop = _pack2(dos[0], dos[1], L, Lp)
    s = jax.lax.dot_general(
        qp, kp, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    s = s * scale + mask2[None]
    if lses is not None:
        lse2 = _pack2(lses[0][:, :, None], lses[1][:, :, None], L, Lp)[..., 0]
        p = jnp.exp(s - lse2[:, :, None])
    else:
        p = _p_from_scores(s)
    pb = p.astype(dop.dtype)
    dv = jax.lax.dot_general(
        pb, dop, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        dop, vp, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - (dp * p).sum(axis=-1, keepdims=True)) * scale).astype(
        dop.dtype
    )
    dq = jax.lax.dot_general(
        ds, kp, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        ds, qp, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    return (
        (dq[:, :L], dq[:, Lp:Lp + L]),
        (dk[:, :L], dk[:, Lp:Lp + L]),
        (dv[:, :L], dv[:, Lp:Lp + L]),
    )


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, hd, hpb,
                packed=False):
    mask = mask_ref[:]
    outs = [None] * hpb
    half = q_ref.shape[0] // 2
    for s in range(hpb):  # static sub-head loop; lane slices stay in VMEM
        q = q_ref[:, :, s * hd:(s + 1) * hd]
        k = k_ref[:, :, s * hd:(s + 1) * hd]
        v = v_ref[:, :, s * hd:(s + 1) * hd]
        if packed:  # mask is the (2Lp,2Lp) packed mask here
            oa, ob = _pair_fwd(
                (q[:half], q[half:]), (k[:half], k[half:]),
                (v[:half], v[half:]), mask, scale,
            )
            outs[s] = jnp.concatenate([oa, ob], axis=0).astype(o_ref.dtype)
        else:
            outs[s] = _one_head_fwd(q, k, v, mask, scale).astype(o_ref.dtype)
    o_ref[:] = outs[0] if hpb == 1 else jnp.concatenate(outs, axis=-1)


def _bwd_compute(q_ref, k_ref, v_ref, mask, do_ref, *, scale, hd, hpb,
                 packed, out_dtype, lse=None):
    """Shared backward body: returns per-sub-head dq/dk/dv lists. With
    ``lse`` (the forward's saved (hpb, bB, L) logsumexp block) the softmax
    reconstruction is a single exp pass — no max or sum reduce."""
    dqs = [None] * hpb
    dks = [None] * hpb
    dvs = [None] * hpb
    half = q_ref.shape[0] // 2
    for sub in range(hpb):
        q = q_ref[:, :, sub * hd:(sub + 1) * hd]
        k = k_ref[:, :, sub * hd:(sub + 1) * hd]
        v = v_ref[:, :, sub * hd:(sub + 1) * hd]
        do = do_ref[:, :, sub * hd:(sub + 1) * hd]
        if packed:
            lses = None
            if lse is not None:
                lses = (lse[sub, :half, :], lse[sub, half:, :])
            dq2, dk2, dv2 = _pair_bwd(
                (q[:half], q[half:]), (k[:half], k[half:]),
                (v[:half], v[half:]), (do[:half], do[half:]), mask, scale,
                lses=lses,
            )
            dqs[sub] = jnp.concatenate(dq2, axis=0).astype(out_dtype)
            dks[sub] = jnp.concatenate(dk2, axis=0).astype(out_dtype)
            dvs[sub] = jnp.concatenate(dv2, axis=0).astype(out_dtype)
            continue
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s * scale + mask[None]
        if lse is not None:
            p = jnp.exp(s - lse[sub][:, :, None])  # (bB, Lq, Lk) fp32
        else:
            p = _p_from_scores(s)  # (bB, Lq, Lk) fp32

        pb = p.astype(do.dtype)
        dv = jax.lax.dot_general(
            pb, do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - (dp * p).sum(axis=-1, keepdims=True)) * scale).astype(
            do.dtype
        )
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqs[sub] = dq.astype(out_dtype)
        dks[sub] = dk.astype(out_dtype)
        dvs[sub] = dv.astype(out_dtype)
    return dqs, dks, dvs


def _fwd_kernel_lse(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *,
                    scale, hd, hpb, packed=False):
    """_fwd_kernel + per-row logsumexp emitted as a second (tiny) output
    ((hpb, block_b, L) f32 block of the (heads, B, L) array — heads leads
    so the Mosaic-constrained last two block dims are (block_b %8, L==full);
    a (B, heads, L) layout would put hpb on the sublane dim, which is
    neither %8 nor the full heads) — the saved residual that lets the
    backward skip its max AND sum reduces."""
    mask = mask_ref[:]
    outs = [None] * hpb
    half = q_ref.shape[0] // 2
    for s in range(hpb):
        q = q_ref[:, :, s * hd:(s + 1) * hd]
        k = k_ref[:, :, s * hd:(s + 1) * hd]
        v = v_ref[:, :, s * hd:(s + 1) * hd]
        if packed:
            (oa, ob), (la, lb) = _pair_fwd(
                (q[:half], q[half:]), (k[:half], k[half:]),
                (v[:half], v[half:]), mask, scale, want_lse=True,
            )
            outs[s] = jnp.concatenate([oa, ob], axis=0).astype(o_ref.dtype)
            lse_ref[s] = jnp.concatenate([la, lb], axis=0)
        else:
            o, l = _one_head_fwd(q, k, v, mask, scale, want_lse=True)
            outs[s] = o.astype(o_ref.dtype)
            lse_ref[s] = l
    o_ref[:] = outs[0] if hpb == 1 else jnp.concatenate(outs, axis=-1)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale, hd, hpb, packed=False):
    dqs, dks, dvs = _bwd_compute(
        q_ref, k_ref, v_ref, mask_ref[:], do_ref,
        scale=scale, hd=hd, hpb=hpb, packed=packed, out_dtype=dq_ref.dtype,
    )
    dq_ref[:] = dqs[0] if hpb == 1 else jnp.concatenate(dqs, axis=-1)
    dk_ref[:] = dks[0] if hpb == 1 else jnp.concatenate(dks, axis=-1)
    dv_ref[:] = dvs[0] if hpb == 1 else jnp.concatenate(dvs, axis=-1)


def _bwd_kernel3(q_ref, k_ref, v_ref, mask_ref, do_ref, d3_ref,
                 *, scale, hd, hpb, packed=False):
    """Backward emitting the cotangent as one (3, bB, L, lanes) block —
    dq/dk/dv stack along a leading part axis, so the consumer-side
    (B,L,3D) concatenate never exists (see qkv_attention)."""
    dqs, dks, dvs = _bwd_compute(
        q_ref, k_ref, v_ref, mask_ref[:], do_ref,
        scale=scale, hd=hd, hpb=hpb, packed=packed, out_dtype=d3_ref.dtype,
    )
    d3_ref[0] = dqs[0] if hpb == 1 else jnp.concatenate(dqs, axis=-1)
    d3_ref[1] = dks[0] if hpb == 1 else jnp.concatenate(dks, axis=-1)
    d3_ref[2] = dvs[0] if hpb == 1 else jnp.concatenate(dvs, axis=-1)


def _bwd_kernel3_db(q_ref, k_ref, v_ref, mask_ref, do_ref, d3_ref, db_ref,
                    *, scale, hd, hpb, packed=False):
    """_bwd_kernel3 + ONLY the bias-grad reduce fused in (a cheap VPU sum of
    vectors already in VMEM). Unlike DX_IN_KERNEL (which pulls the dx GEMM
    out of XLA and loses ~13 ms/step -- tiny-M dots serialize with the
    attention dots), this removes the separate %convert_reduce_fusion pass
    (59 MB/layer read of d3) at no MXU cost."""
    dqs, dks, dvs = _bwd_compute(
        q_ref, k_ref, v_ref, mask_ref[:], do_ref,
        scale=scale, hd=hd, hpb=hpb, packed=packed, out_dtype=d3_ref.dtype,
    )
    dq = dqs[0] if hpb == 1 else jnp.concatenate(dqs, axis=-1)
    dk = dks[0] if hpb == 1 else jnp.concatenate(dks, axis=-1)
    dv = dvs[0] if hpb == 1 else jnp.concatenate(dvs, axis=-1)
    d3_ref[0] = dq
    d3_ref[1] = dk
    d3_ref[2] = dv

    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _db_init():
        db_ref[:] = jnp.zeros_like(db_ref)

    bsum = jnp.concatenate(
        [jnp.sum(t.astype(jnp.float32), axis=(0, 1))[None, :]
         for t in (dq, dk, dv)], axis=0,
    )  # (3, lanes)
    db_ref[j] = db_ref[j] + bsum


def _bwd_kernel3_db_lse(q_ref, k_ref, v_ref, mask_ref, lse_ref, do_ref,
                        d3_ref, db_ref, *, scale, hd, hpb, packed=False):
    """_bwd_kernel3_db with the forward's saved logsumexp as an input —
    p = exp(s - lse) directly, so this backward runs NO max/sum reduce
    over the score tiles (cheaper than even the retired fixed-shift
    backward, which still summed) while staying exact for any score
    magnitude."""
    dqs, dks, dvs = _bwd_compute(
        q_ref, k_ref, v_ref, mask_ref[:], do_ref,
        scale=scale, hd=hd, hpb=hpb, packed=packed, out_dtype=d3_ref.dtype,
        lse=lse_ref[:],
    )
    dq = dqs[0] if hpb == 1 else jnp.concatenate(dqs, axis=-1)
    dk = dks[0] if hpb == 1 else jnp.concatenate(dks, axis=-1)
    dv = dvs[0] if hpb == 1 else jnp.concatenate(dvs, axis=-1)
    d3_ref[0] = dq
    d3_ref[1] = dk
    d3_ref[2] = dv

    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _db_init():
        db_ref[:] = jnp.zeros_like(db_ref)

    bsum = jnp.concatenate(
        [jnp.sum(t.astype(jnp.float32), axis=(0, 1))[None, :]
         for t in (dq, dk, dv)], axis=0,
    )  # (3, lanes)
    db_ref[j] = db_ref[j] + bsum




# Tunable batch-block caps (scripts/bench_attn_kernel.py): the fwd working
# set fits 16MB VMEM at 32 rows with double buffering; the bwd kernel holds
# ~2.5x the intermediates so it defaults lower.
FWD_BLOCK_CAP = 32
# Backward batch-block cap. None = shape-aware default: 64 rows for short
# sequences (L <= 128; -0.34 ms/step on the parity config,
# reports/ab_micro_r3.json) and the proven 32 for long ones (64-row blocks
# at ViT-L's L=257 would blow the per-kernel VMEM budget below). Set an
# int to override everywhere (A/B arm '^bwdN').
BWD_BLOCK_CAP = None
# Head-group lane width (multiple of 128). None = shape-aware default:
# 256 lanes (fatter groups, half the grid steps; -0.23 ms/step,
# reports/ab_micro_r3.json) for L <= 128, 128 for long sequences. Set an
# int to override (A/B arm '^lanesN'). supported() always checks with the
# conservative 128 — any geometry it accepts is feasible at either width
# (heads_per_block halves hpb until it divides heads).
GROUP_LANES = None
# Forward-only lane-width override (A/B arm '^flanesN'). The fwd kernel's
# VMEM footprint is ~3x smaller than the backward's, so it can afford
# full-width groups (ONE head group per batch block = fewest grid steps —
# the zip study showed the boundary tax is per-GRID-STEP) while the
# backward keeps the shape-aware width. None = follow GROUP_LANES/_lanes_for.
# Env override SPATIAL_CLIP_FWD_LANES pins it process-wide (bench/serve
# pickup without code edits; same degradation rules as '^flanesN').
def _parse_fwd_lanes(raw: str | None) -> int | None:
    """Validate the SPATIAL_CLIP_FWD_LANES env override at import time.

    Must be a positive multiple of 128 (the Mosaic lane width); anything
    else would surface later as a ZeroDivisionError in heads_per_block or
    a geometry assert deep in tracing. Fail here with a clear message.
    """
    if not raw:
        return None
    try:
        val = int(raw)
    except ValueError:
        raise ValueError(
            f"bad SPATIAL_CLIP_FWD_LANES={raw!r}: must be an integer "
            "multiple of 128 (e.g. 128, 256, 512)") from None
    if val <= 0 or val % 128:
        raise ValueError(
            f"bad SPATIAL_CLIP_FWD_LANES={val}: must be a positive "
            "multiple of 128 (e.g. 128, 256, 512)")
    return val


FWD_LANES = _parse_fwd_lanes(os.environ.get("SPATIAL_CLIP_FWD_LANES"))
_SHORT_SEQ = 128


def _bwd_cap(L: int) -> int:
    if BWD_BLOCK_CAP:
        return BWD_BLOCK_CAP
    return 64 if L <= _SHORT_SEQ else 32


def _lanes_for(L: int) -> int:
    if GROUP_LANES:
        return GROUP_LANES
    return 256 if L <= _SHORT_SEQ else 128


# Scoped-VMEM budget handed to Mosaic per kernel. The platform default
# (16 MB) rejects batch blocks >32 rows by ~0.8 MB; v5e has 128 MB of VMEM,
# so a larger scoped budget unlocks bigger blocks (fewer grid steps, less
# per-step overhead) — tuned via scripts/bench_attn_kernel.py. 100 MB:
# the 64-row x 256-lane backward blocks need 73 MB on the parity text
# tower (reports/ab_combo2_r3.json campaign).
VMEM_LIMIT_BYTES = 100 * 2 ** 20

# Mark the default fwd/bwd kernels' grid dims (batch block x head group) as
# "parallel" for Mosaic — every grid step reads/writes disjoint blocks, so
# the scheduler may reorder/pipeline freely. A/B knob (arm suffix '^par');
# off by default until measured on chip.
PARALLEL_SEMANTICS = False


def _default_cparams(grid):
    kw = dict(vmem_limit_bytes=VMEM_LIMIT_BYTES)
    if PARALLEL_SEMANTICS:
        kw["dimension_semantics"] = ("parallel",) * len(grid)
    return pltpu.CompilerParams(**kw)
# 'group' (default): grid (batch, head-group) with 128-lane strided blocks —
# measured 103.7 ms/step at model level vs 106.8 for 'slab'. 'slab': grid
# over batch blocks only; each step DMAs the contiguous (bB, L, 3D) qkv slab,
# slices heads in VMEM, and the bwd writes dqkv directly (no XLA concat) —
# kept for shapes where in-VMEM slicing beats strided DMA.
KERNEL_VARIANT = "group"

def _pick_block_b(B: int, cap: int = 32) -> int:
    for bb in (64, 32, 16, 8, 4, 2, 1):
        if bb <= cap and B % bb == 0:
            return bb
    return 1


def heads_per_block(heads: int, head_dim: int, lanes: int = None):
    """Lane-group size satisfying Mosaic's 128-divisibility; None if the
    shape can't be grouped (caller should fall back to the XLA path).
    ``lanes=None`` = the conservative 128 (used by supported(); _geometry
    passes the shape-aware width from _lanes_for)."""
    lanes = lanes or 128
    if head_dim >= 128:
        return 1 if head_dim % 128 == 0 else None
    if 128 % head_dim != 0:
        return None
    # largest feasible group <= the requested width: a wider-than-tower
    # request (e.g. flanes768 on an 8-head/512-lane text tower) degrades to
    # the tower's own full width instead of collapsing to an infeasible
    # 1-head group (which would force the XLA fallback)
    hpb = min(lanes // head_dim, heads)
    while hpb > 1 and (heads % hpb != 0 or (hpb * head_dim) % 128 != 0):
        hpb -= 1
    if heads % hpb != 0 or (hpb * head_dim) % 128 != 0:
        return None
    return hpb


def supported(heads: int, dim: int) -> bool:
    hd = dim // heads
    return heads * hd == dim and heads_per_block(heads, hd) is not None


def _specs(block_b, L, lanes, D, n_groups, mask_len=None):
    def q_map(i, j):
        return (i, 0, j)

    def k_map(i, j, off=n_groups):
        return (i, 0, off + j)

    def v_map(i, j, off=2 * n_groups):
        return (i, 0, off + j)

    blk = (block_b, L, lanes)
    ml = mask_len or L
    return [
        pl.BlockSpec(blk, q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, k_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, v_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((ml, ml), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]



@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_attention(qkv, mask, heads: int, interpret: bool = False,
                    interleaved: bool = False):
    """Multi-head self-attention over a fused qkv tensor.

    qkv: (B, L, 3*D) — concatenated q/k/v projections (D = heads * head_dim).
    mask: (L, L) additive fp32 mask or None.
    interleaved: qkv columns are in :func:`interleave_perm` order (per-group
    [q|k|v] contiguous); the cotangent is returned in the same order.
    Returns the pre-output-projection context, (B, L, D).
    """
    if mask is None:
        mask = jnp.zeros((qkv.shape[1], qkv.shape[1]), jnp.float32)
    return _spmd()._get_fwd_cp()(qkv, mask, heads, interpret, interleaved)


def _geometry(qkv, heads, block_cap=32, lanes=None):
    B, L, three_d = qkv.shape
    D = three_d // 3
    hd = D // heads
    assert heads * hd == D and 3 * D == three_d
    # interleaved layouts pin lanes=128: interleave_perm bakes the
    # conservative hpb into the weight permutation
    hpb = heads_per_block(heads, hd, lanes or _lanes_for(L))
    assert hpb is not None, (
        f"unsupported head geometry heads={heads} head_dim={hd}; guard with "
        "fused_attention.supported()"
    )
    lanes = hpb * hd
    n_groups = heads // hpb
    block_b = _pick_block_b(B, block_cap)
    grid = (B // block_b, n_groups)
    return B, L, D, hd, hpb, lanes, n_groups, block_b, grid


def _attn_fwd_impl(qkv, mask, heads, interpret, interleaved=False):
    if KERNEL_VARIANT == "slab" and not interleaved:
        from spatial_clip_tpu.ops import attention_variants as _av

        return _av._fwd_pallas_slab(qkv, mask, heads, interpret)
    B, L, D, hd, hpb, lanes, n_groups, block_b, grid = _geometry(
        qkv, heads, FWD_BLOCK_CAP, lanes=128 if interleaved else FWD_LANES)
    scale = hd ** -0.5
    if mask is None:
        mask = jnp.zeros((L, L), jnp.float32)
    cost = pl.CostEstimate(
        flops=4 * B * heads * L * L * hd,
        bytes_accessed=(qkv.size + B * L * D) * qkv.dtype.itemsize,
        transcendentals=B * heads * L * L,
    )
    out_spec = pl.BlockSpec(
        (block_b, L, lanes), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    if interleaved:
        from spatial_clip_tpu.ops import attention_variants as _av

        return pl.pallas_call(
            functools.partial(_fwd_kernel, scale=scale, hd=hd, hpb=hpb),
            grid=grid,
            in_specs=_av._specs_inter(block_b, L, lanes),
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, L, D), qkv.dtype),
            interpret=interpret,
            cost_estimate=cost,
        )(qkv, qkv, qkv, mask.astype(jnp.float32))
    pack = _pack_ok(block_b, L)
    kmask = mask.astype(jnp.float32)
    if pack:
        kmask = _packed_mask(kmask, L)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, hd=hd, hpb=hpb,
                          packed=pack),
        grid=grid,
        in_specs=_specs(block_b, L, lanes, D, n_groups,
                        mask_len=kmask.shape[0]),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, L, D), qkv.dtype),
        interpret=interpret,
        cost_estimate=cost,
        compiler_params=None if interpret else _default_cparams(grid),
    )(qkv, qkv, qkv, kmask)
    return out



def _attn_fwd(qkv, mask, heads, interpret, interleaved):
    had_mask = mask is not None
    if mask is None:
        mask = jnp.zeros((qkv.shape[1], qkv.shape[1]), jnp.float32)
    out = _spmd()._get_fwd_cp()(qkv, mask, heads, interpret, interleaved)
    return out, (qkv, mask, had_mask)


def _attn_bwd(heads, interpret, interleaved, res, g):
    qkv, mask, had_mask = res
    dqkv = _spmd()._get_bwd_cp()(qkv, mask, g, heads, interpret, interleaved)
    dmask = jnp.zeros_like(mask) if had_mask else None
    return dqkv, dmask


def _bwd_pallas(qkv, mask, g, heads, interpret, interleaved=False):
    if KERNEL_VARIANT == "slab" and not interleaved:
        from spatial_clip_tpu.ops import attention_variants as _av

        return _av._bwd_pallas_slab(qkv, mask, g, heads, interpret)
    B, L, D, hd, hpb, lanes, n_groups, block_b, grid = _geometry(
        qkv, heads, _bwd_cap(qkv.shape[1]),
        lanes=128 if interleaved else None)
    scale = hd ** -0.5
    blk = (block_b, L, lanes)
    cost = pl.CostEstimate(
        flops=11 * B * heads * L * L * hd,
        bytes_accessed=2 * (qkv.size + B * L * D) * qkv.dtype.itemsize,
        transcendentals=B * heads * L * L,
    )
    if interleaved:
        from spatial_clip_tpu.ops import attention_variants as _av

        return pl.pallas_call(
            functools.partial(_av._bwd_kernel_inter, scale=scale, hd=hd,
                              hpb=hpb),
            grid=grid,
            in_specs=_av._specs_inter(block_b, L, lanes)
            + [pl.BlockSpec(blk, lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (block_b, L, 3 * lanes), lambda i, j: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, L, 3 * D), qkv.dtype),
            interpret=interpret,
            cost_estimate=cost,
        )(qkv, qkv, qkv, mask.astype(jnp.float32), g.astype(qkv.dtype))
    pack = _pack_ok(block_b, L)
    kmask = mask.astype(jnp.float32)
    if pack:
        kmask = _packed_mask(kmask, L)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, hd=hd, hpb=hpb,
                          packed=pack),
        grid=grid,
        in_specs=_specs(block_b, L, lanes, D, n_groups,
                        mask_len=kmask.shape[0])
        + [pl.BlockSpec(blk, lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(blk, lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_shape=[jax.ShapeDtypeStruct((B, L, D), qkv.dtype) for _ in range(3)],
        interpret=interpret,
        cost_estimate=cost,
        compiler_params=None if interpret else _default_cparams(grid),
    )(qkv, qkv, qkv, kmask, g.astype(qkv.dtype))
    return jnp.concatenate([dq, dk, dv], axis=-1)


def _bwd_pallas3(qkv, mask, g, heads, interpret):
    """Backward whose cotangent comes out as ONE (3, B, L, D) array — each
    grid step writes its dq/dk/dv lane group as a single contiguous
    (3, bB, L, lanes) block. Consumed by :func:`qkv_attention`'s projection
    backward, which contracts this layout directly (no (B,L,3D) concat)."""
    B, L, D, hd, hpb, lanes, n_groups, block_b, grid = _geometry(
        qkv, heads, _bwd_cap(qkv.shape[1])
    )
    scale = hd ** -0.5
    blk = (block_b, L, lanes)
    cost = pl.CostEstimate(
        flops=11 * B * heads * L * L * hd,
        bytes_accessed=2 * (qkv.size + B * L * D) * qkv.dtype.itemsize,
        transcendentals=B * heads * L * L,
    )
    pack = _pack_ok(block_b, L)
    kmask = (jnp.zeros((L, L), jnp.float32) if mask is None
             else mask.astype(jnp.float32))
    if pack:
        kmask = _packed_mask(kmask, L)
    return pl.pallas_call(
        functools.partial(_bwd_kernel3, scale=scale, hd=hd, hpb=hpb,
                          packed=pack),
        grid=grid,
        in_specs=_specs(block_b, L, lanes, D, n_groups,
                        mask_len=kmask.shape[0])
        + [pl.BlockSpec(blk, lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (3, block_b, L, lanes), lambda i, j: (0, i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, B, L, D), qkv.dtype),
        interpret=interpret,
        cost_estimate=cost,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(qkv, qkv, qkv, kmask, g.astype(qkv.dtype))



fused_attention.defvjp(_attn_fwd, _attn_bwd)



# ---------------------------------------------------------------------------
# Projection-fused attention (attn_impl='pallas3'): the fused qkv GEMM and
# the attention kernel live inside ONE custom_vjp, so the backward can use
# the kernel's native cotangent layout. Forward is byte-identical to the
# standard path (one (B,L,3D) GEMM -> group kernel). Backward: the Pallas
# kernel emits (3, B, L, D) — one contiguous write per grid step — and
# dW/dx/db contract that layout directly:
#   dx[b,l,i]    = sum_{p,o} d3[p,b,l,o] * W[i, p*D+o]      (one dot)
#   dW[i,p*D+o]  = sum_{b,l} x[b,l,i]   * d3[p,b,l,o]       (one dot)
#   db           = sum_{b,l} d3                              (one reduce)
# so the profiled (B,L,3D) dqkv concatenate (dynamic-update-slice family)
# never materializes, at zero extra HBM traffic — unlike weight-permutation
# (pallas_inter) or split-GEMM alternatives, both measured slower.
# ---------------------------------------------------------------------------


# dx-in-kernel backward (DX_IN_KERNEL): fuse the input-gradient GEMM into
# the attention backward kernel. XLA's standalone dx GEMM must first relay
# the (3,B,L,D) cotangent out into (B*L, 3D) form — a full-activation copy
# per layer (observed in the optimized HLO) costing the same bytes as the
# dqkv concatenate it replaced. Contracting each lane group against its
# weight slice inside the kernel (f32 VMEM accumulator over head-group
# steps) eliminates that relayout entirely; dw/db still contract the d3
# monolith in XLA, which needs only a free bitcast.
# BWD_FUSE: 'none' -> plain d3 kernel; 'db' -> d3 + in-kernel bias grad
# (DEFAULT: removes the separate per-layer db read; f32 accumulation, at
# least as precise as XLA's bf16 reduce. Model-level A/B on the parity
# config: pallas3^db 92.66 vs auto/pallas 93.16 ms/step — the -0.51 that
# ships 'pallas3' as the TPU default; d3 WITHOUT db measures +2.5 because
# XLA's standalone db reduce + dx relayout of (3,B,L,D) give back the DUS
# savings. reports/ab_pallas3_r3s6.json);
# 'dxdb' -> also fuse the input-grad GEMM (measured LOSS, +13 ms/step --
# tiny-M dx dots serialize with the attention dots; ships for evidence).
BWD_FUSE = "db"

def _bwd_pallas3_db(qkv, mask, g, heads, interpret):
    """(d3, db_raw) backward: d3 plus the in-kernel bias-grad reduce."""
    B, L, D, hd, hpb, lanes, n_groups, block_b, grid = _geometry(
        qkv, heads, _bwd_cap(qkv.shape[1])
    )
    scale = hd ** -0.5
    blk = (block_b, L, lanes)
    cost = pl.CostEstimate(
        flops=11 * B * heads * L * L * hd,
        bytes_accessed=2 * (qkv.size + B * L * D) * qkv.dtype.itemsize,
        transcendentals=B * heads * L * L,
    )
    pack = _pack_ok(block_b, L)
    kmask = (jnp.zeros((L, L), jnp.float32) if mask is None
             else mask.astype(jnp.float32))
    if pack:
        kmask = _packed_mask(kmask, L)
    return pl.pallas_call(
        functools.partial(_bwd_kernel3_db, scale=scale, hd=hd, hpb=hpb,
                          packed=pack),
        grid=grid,
        in_specs=_specs(block_b, L, lanes, D, n_groups,
                        mask_len=kmask.shape[0])
        + [pl.BlockSpec(blk, lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((3, block_b, L, lanes), lambda i, j: (0, i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, 3, lanes), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, B, L, D), qkv.dtype),
            jax.ShapeDtypeStruct((n_groups, 3, lanes), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=cost,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(qkv, qkv, qkv, kmask, g.astype(qkv.dtype))


# ---------------------------------------------------------------------------
# Saved-logsumexp variant (SAVE_LSE, DEFAULT for the pallas3+db path): the
# forward emits the per-row logsumexp of the masked+scaled scores as a tiny
# second output ((B, heads, L) f32 — ~600 KB/layer at ViT-B, block last dim
# == full L so Mosaic accepts the (block_b, hpb, L) spec), saved as a VJP
# residual. The backward reconstructs p = exp(s - lse) in ONE exp pass: no
# per-row max reduce (the overflow-safety cost) and no sum reduce (which
# even the retired fixed-shift backward paid). Exact softmax for any score
# magnitude in fwd AND bwd.
# ---------------------------------------------------------------------------
SAVE_LSE = True


def _lse_ok(qkv, heads):
    """The (hpb, block_b, L) lse block needs block_b %8 (or == B) for BOTH
    the fwd and bwd grids — true for every production batch; tiny odd
    batches fall back to the recompute backward."""
    try:
        B = qkv.shape[0]
        for cap in (FWD_BLOCK_CAP, _bwd_cap(qkv.shape[1])):
            bb = _pick_block_b(B, cap)
            if bb % 8 != 0 and bb != B:
                return False
        return True
    except Exception:  # noqa: BLE001 — unsupported geometry resolves later
        return False


def _fwd_pallas_lse(qkv, mask, heads, interpret):
    """(out, lse) forward: the default group kernel + the logsumexp rows."""
    B, L, D, hd, hpb, lanes, n_groups, block_b, grid = _geometry(
        qkv, heads, FWD_BLOCK_CAP, lanes=FWD_LANES)
    scale = hd ** -0.5
    if mask is None:
        mask = jnp.zeros((L, L), jnp.float32)
    cost = pl.CostEstimate(
        flops=4 * B * heads * L * L * hd,
        bytes_accessed=(qkv.size + B * L * D) * qkv.dtype.itemsize,
        transcendentals=B * heads * L * L,
    )
    pack = _pack_ok(block_b, L)
    kmask = mask.astype(jnp.float32)
    if pack:
        kmask = _packed_mask(kmask, L)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_lse, scale=scale, hd=hd, hpb=hpb,
                          packed=pack),
        grid=grid,
        in_specs=_specs(block_b, L, lanes, D, n_groups,
                        mask_len=kmask.shape[0]),
        out_specs=[
            pl.BlockSpec((block_b, L, lanes), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hpb, block_b, L), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, D), qkv.dtype),
            jax.ShapeDtypeStruct((heads, B, L), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=cost,
        compiler_params=None if interpret else _default_cparams(grid),
    )(qkv, qkv, qkv, kmask)


def _bwd_pallas3_db_lse(qkv, mask, lse, g, heads, interpret):
    """(d3, db_raw) backward consuming the saved lse — no score reduces."""
    B, L, D, hd, hpb, lanes, n_groups, block_b, grid = _geometry(
        qkv, heads, _bwd_cap(qkv.shape[1])
    )
    scale = hd ** -0.5
    blk = (block_b, L, lanes)
    cost = pl.CostEstimate(
        flops=11 * B * heads * L * L * hd,
        bytes_accessed=2 * (qkv.size + B * L * D) * qkv.dtype.itemsize,
        transcendentals=B * heads * L * L,
    )
    pack = _pack_ok(block_b, L)
    kmask = (jnp.zeros((L, L), jnp.float32) if mask is None
             else mask.astype(jnp.float32))
    if pack:
        kmask = _packed_mask(kmask, L)
    return pl.pallas_call(
        functools.partial(_bwd_kernel3_db_lse, scale=scale, hd=hd, hpb=hpb,
                          packed=pack),
        grid=grid,
        in_specs=_specs(block_b, L, lanes, D, n_groups,
                        mask_len=kmask.shape[0])
        + [pl.BlockSpec((hpb, block_b, L), lambda i, j: (j, i, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec(blk, lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((3, block_b, L, lanes), lambda i, j: (0, i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, 3, lanes), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, B, L, D), qkv.dtype),
            jax.ShapeDtypeStruct((n_groups, 3, lanes), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=cost,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(qkv, qkv, qkv, kmask, lse, g.astype(qkv.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def qkv_attention(x, w, b, mask, heads: int, interpret: bool = False):
    """Fused qkv projection + multi-head attention with a concat-free VJP.

    x: (B, L, Din) residual-stream input (post-LN), w: (Din, 3*D) fused qkv
    weight, b: (3*D,) bias — the identical parameters the standard path uses
    (checkpoints unaffected). Returns the pre-output-projection context
    (B, L, D). See the block comment above for the backward formulation.
    """
    qkv = x @ w.astype(x.dtype) + b.astype(x.dtype)
    return fused_attention(qkv, mask, heads, interpret)


def _qkv_attn_fwd(x, w, b, mask, heads, interpret):
    qkv = x @ w.astype(x.dtype) + b.astype(x.dtype)
    had_mask = mask is not None
    m = (mask if had_mask
         else jnp.zeros((x.shape[1], x.shape[1]), jnp.float32))
    if SAVE_LSE and _lse_ok(qkv, heads):
        out, lse = _spmd()._get_fwd_lse_cp()(qkv, m, heads, interpret, False)
    else:
        out = _spmd()._get_fwd_cp()(qkv, m, heads, interpret, False)
        lse = None
    return out, (x, w, qkv, m, lse, had_mask)


def _qkv_attn_bwd(heads, interpret, res, g):
    x, w, qkv, m, lse, had_mask = res
    din = w.shape[0]
    db_raw = None
    if BWD_FUSE == "dxdb":
        from spatial_clip_tpu.ops import attention_variants as _av

        d3, dx, db_raw = _av._get_bwd3dx_cp()(
            qkv, m, g, w.astype(qkv.dtype), heads, interpret, False
        )
        dx = dx.astype(x.dtype)
    else:
        if BWD_FUSE == "db" and lse is not None:
            d3, db_raw = _spmd()._get_bwd3db_lse_cp()(
                qkv, m, lse, g, heads, interpret, False
            )
        elif BWD_FUSE == "db":
            d3, db_raw = _spmd()._get_bwd3db_cp()(qkv, m, g, heads, interpret, False)
        else:
            d3 = _spmd()._get_bwd3_cp()(qkv, m, g, heads, interpret, False)
        w3 = w.astype(d3.dtype).reshape(din, 3, -1)
        dx = jax.lax.dot_general(
            d3, w3, (((0, 3), (1, 2)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    dw = jax.lax.dot_general(
        x, d3, (((0, 1), (1, 2)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(din, -1).astype(w.dtype)
    if db_raw is not None:
        # (n_groups, 3, lanes) -> [dbq | dbk | dbv]
        db = db_raw.transpose(1, 0, 2).reshape(-1).astype(w.dtype)
    else:
        db = jnp.sum(d3, axis=(1, 2), dtype=jnp.float32).reshape(-1).astype(
            w.dtype
        )
    dmask = jnp.zeros_like(m) if had_mask else None
    return dx, dw, db, dmask


qkv_attention.defvjp(_qkv_attn_fwd, _qkv_attn_bwd)





def reference_attention(qkv, mask, heads):
    """Plain-XLA reference (einsum formulation) for parity tests."""
    B, L, three_d = qkv.shape
    D = three_d // 3
    hd = D // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, L, heads, hd)
    k = k.reshape(B, L, heads, hd)
    v = v.reshape(B, L, heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k).astype(jnp.float32)
    if mask is not None:
        s = s + mask.astype(jnp.float32)[None, None]
    p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    return o.reshape(B, L, D)






# Measured-negative kernel variants (slab / interleaved / dxdb / transposed /
# split) live in ops/attention_variants.py; forward their public names so
# existing imports and the `fa.<knob>`-style A/B arms keep working. The
# variants module is only imported when one of these names is touched.
# Shipped pair family (ops/attention_pair.py) — forwarded like the variants
_PAIR_EXPORTS = frozenset({
    "fused_attention_pair", "pair_supported", "_pair_fwd_impl",
    "_pair_bwd_impl", "_pair_masks", "_pair_geoms", "_get_pair_fwd_cp",
    "_get_pair_bwd_cp",
})

_VARIANT_EXPORTS = frozenset({
    "fused_attention_t", "fused_attention_split",
    "interleave_perm", "inverse_perm", "permute_columns",
    # NOTE: SLAB_FWD_CAP/SLAB_BWD_CAP deliberately NOT forwarded — a
    # forwarded read would make `fa.SLAB_FWD_CAP = x` a silent shadow
    # no-op; tune them on attention_variants directly.
    "_fwd_pallas_slab", "_bwd_pallas_slab", "_bwd_kernel_inter",
    "_specs_inter", "_bwd_pallas3_dx", "_get_bwd3dx_cp", "_bwd_kernel3_dx",
})


def __getattr__(name):
    if name in _PAIR_EXPORTS:
        from spatial_clip_tpu.ops import attention_pair as _ap

        return getattr(_ap, name)
    if name in _VARIANT_EXPORTS:
        from spatial_clip_tpu.ops import attention_variants as _av

        return getattr(_av, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
