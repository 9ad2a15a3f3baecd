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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Fast-softmax (default): replace the per-row running-max subtraction with a
# FIXED shift (exactly equal softmax for any shift — not an approximation),
# and fold the 1/sum normalization into the (smaller) output tile after the
# PV dot — saves a reduce + a (bB,L,L)-wide elementwise pass per sub-head.
# Measured 99.1 vs 101.0 ms/step on the parity config
# (reports/ab_fastsm_r2.json). fp32 exp overflows only if a score exceeds
# ~88 + SHIFT = 108; CLIP attention logits are O(30). Set False to restore
# the running-max formulation (arm suffix '~fast' toggles it per A/B arm).
FAST_SOFTMAX = True
_FAST_SHIFT = 20.0


def _one_head_fwd(q, k, v, mask, scale):
    """(bB, L, hd) sub-head attention; fp32 softmax; returns (bB, L, hd)."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    s = s * scale + mask[None]
    if FAST_SOFTMAX:
        e = jnp.exp(s - _FAST_SHIFT)
        o = jax.lax.dot_general(
            e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return o * (1.0 / e.sum(axis=-1, keepdims=True))
    s = s - s.max(axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / p.sum(axis=-1, keepdims=True)
    return jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _p_from_scores(s):
    """Normalized attention probs from masked+scaled fp32 scores; honors
    FAST_SOFTMAX (fixed shift instead of the per-row max reduction)."""
    if FAST_SOFTMAX:
        e = jnp.exp(s - _FAST_SHIFT)
        return e / e.sum(axis=-1, keepdims=True)
    s = s - s.max(axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / e.sum(axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, hd, hpb):
    mask = mask_ref[:]
    outs = []
    for s in range(hpb):  # static sub-head loop; lane slices stay in VMEM
        q = q_ref[:, :, s * hd:(s + 1) * hd]
        k = k_ref[:, :, s * hd:(s + 1) * hd]
        v = v_ref[:, :, s * hd:(s + 1) * hd]
        outs.append(_one_head_fwd(q, k, v, mask, scale).astype(o_ref.dtype))
    o_ref[:] = outs[0] if hpb == 1 else jnp.concatenate(outs, axis=-1)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale, hd, hpb):
    mask = mask_ref[:]
    dqs, dks, dvs = [], [], []
    for sub in range(hpb):
        q = q_ref[:, :, sub * hd:(sub + 1) * hd]
        k = k_ref[:, :, sub * hd:(sub + 1) * hd]
        v = v_ref[:, :, sub * hd:(sub + 1) * hd]
        do = do_ref[:, :, sub * hd:(sub + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s * scale + mask[None]
        p = _p_from_scores(s)  # (bB, Lq, Lk) fp32

        pb = p.astype(do.dtype)
        # dv[b,k,d] = sum_q p[b,q,k] do[b,q,d]
        dv = jax.lax.dot_general(
            pb, do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dp[b,q,k] = sum_d do[b,q,d] v[b,k,d]
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - (dp * p).sum(axis=-1, keepdims=True)) * scale).astype(
            do.dtype
        )
        # dq[b,q,d] = sum_k ds[b,q,k] k[b,k,d]
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dk[b,k,d] = sum_q ds[b,q,k] q[b,q,d]
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqs.append(dq.astype(dq_ref.dtype))
        dks.append(dk.astype(dk_ref.dtype))
        dvs.append(dv.astype(dv_ref.dtype))
    dq_ref[:] = dqs[0] if hpb == 1 else jnp.concatenate(dqs, axis=-1)
    dk_ref[:] = dks[0] if hpb == 1 else jnp.concatenate(dks, axis=-1)
    dv_ref[:] = dvs[0] if hpb == 1 else jnp.concatenate(dvs, axis=-1)


# Tunable batch-block caps (scripts/bench_attn_kernel.py): the fwd working
# set fits 16MB VMEM at 32 rows with double buffering; the bwd kernel holds
# ~2.5x the intermediates so it defaults lower.
FWD_BLOCK_CAP = 32
BWD_BLOCK_CAP = 16
# 'group' (default): grid (batch, head-group) with 128-lane strided blocks —
# measured 103.7 ms/step at model level vs 106.8 for 'slab'. 'slab': grid
# over batch blocks only; each step DMAs the contiguous (bB, L, 3D) qkv slab,
# slices heads in VMEM, and the bwd writes dqkv directly (no XLA concat) —
# kept for shapes where in-VMEM slicing beats strided DMA.
KERNEL_VARIANT = "group"
SLAB_FWD_CAP = 16
SLAB_BWD_CAP = 8


def _fwd_kernel_slab(qkv_ref, mask_ref, o_ref, *, scale, hd, heads):
    mask = mask_ref[:]
    slab = qkv_ref[:]  # (bB, L, 3D) — one contiguous DMA
    D = heads * hd
    outs = []
    for h in range(heads):
        q = slab[:, :, h * hd:(h + 1) * hd]
        k = slab[:, :, D + h * hd:D + (h + 1) * hd]
        v = slab[:, :, 2 * D + h * hd:2 * D + (h + 1) * hd]
        outs.append(_one_head_fwd(q, k, v, mask, scale).astype(o_ref.dtype))
    o_ref[:] = outs[0] if heads == 1 else jnp.concatenate(outs, axis=-1)


def _bwd_kernel_slab(qkv_ref, mask_ref, do_ref, dqkv_ref, *, scale, hd, heads):
    mask = mask_ref[:]
    slab = qkv_ref[:]
    D = heads * hd
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        q = slab[:, :, h * hd:(h + 1) * hd]
        k = slab[:, :, D + h * hd:D + (h + 1) * hd]
        v = slab[:, :, 2 * D + h * hd:2 * D + (h + 1) * hd]
        do = do_ref[:, :, h * hd:(h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s * scale + mask[None]
        p = _p_from_scores(s)
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
        dqs.append(dq.astype(dqkv_ref.dtype))
        dks.append(dk.astype(dqkv_ref.dtype))
        dvs.append(dv.astype(dqkv_ref.dtype))
    dqkv_ref[:] = jnp.concatenate(dqs + dks + dvs, axis=-1)


def _bwd_kernel_inter(q_ref, k_ref, v_ref, mask_ref, do_ref, dqkv_ref,
                      *, scale, hd, hpb):
    """Interleaved-layout backward: q/k/v arrive as the same three strided
    DMAs the forward 'group' kernel uses (the measured-fast pattern; the
    contiguous-slab read lost, docs/experiments.md), but dq/dk/dv for the
    whole head group are emitted as ONE (bB, L, 3*lanes) write — no XLA
    concatenate (the profiled 2ms dynamic-update-slice family) ever
    materializes dqkv."""
    mask = mask_ref[:]
    dqs, dks, dvs = [], [], []
    for sub in range(hpb):
        q = q_ref[:, :, sub * hd:(sub + 1) * hd]
        k = k_ref[:, :, sub * hd:(sub + 1) * hd]
        v = v_ref[:, :, sub * hd:(sub + 1) * hd]
        do = do_ref[:, :, sub * hd:(sub + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s * scale + mask[None]
        p = _p_from_scores(s)
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
        dqs.append(dq.astype(dqkv_ref.dtype))
        dks.append(dk.astype(dqkv_ref.dtype))
        dvs.append(dv.astype(dqkv_ref.dtype))
    dqkv_ref[:] = jnp.concatenate(dqs + dks + dvs, axis=-1)


def interleave_perm(heads: int, head_dim: int) -> "list[int]":
    """Column permutation turning standard fused-qkv order [q|k|v] into
    per-head-group interleaved order [q_g0|k_g0|v_g0|q_g1|...].

    Applied to the qkv projection WEIGHT (cheap (D,3D) gather per step, fused
    by XLA) so the GEMM writes the kernel's preferred layout directly; the
    checkpoint tree keeps the standard order.
    """
    hpb = heads_per_block(heads, head_dim)
    lanes = hpb * head_dim
    D = heads * head_dim
    perm = []
    for j in range(D // lanes):
        for part in range(3):
            base = part * D + j * lanes
            perm.extend(range(base, base + lanes))
    return perm


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def permute_columns(w, perm: tuple, inv_perm: tuple):
    """Column permutation whose VJP is a gather with the inverse permutation
    — XLA lowers the autodiff transpose of ``take`` as a scatter-add, which
    is slow on TPU; this keeps both directions as cheap gathers."""
    return jnp.take(w, jnp.asarray(perm, jnp.int32), axis=1)


def _perm_fwd(w, perm, inv_perm):
    return permute_columns(w, perm, inv_perm), None


def _perm_bwd(perm, inv_perm, _, g):
    return (jnp.take(g, jnp.asarray(inv_perm, jnp.int32), axis=1),)


permute_columns.defvjp(_perm_fwd, _perm_bwd)


def inverse_perm(perm) -> "tuple[int, ...]":
    inv = [0] * len(perm)
    for i, p in enumerate(perm):
        inv[p] = i
    return tuple(inv)


def _pick_block_b(B: int, cap: int = 32) -> int:
    for bb in (64, 32, 16, 8, 4, 2, 1):
        if bb <= cap and B % bb == 0:
            return bb
    return 1


# lanes per head group (multiple of 128). 256 halves the grid steps at 2x
# VMEM per step — tunable via the kernel microbench.
GROUP_LANES = 128


def heads_per_block(heads: int, head_dim: int, lanes: int = None):
    """Lane-group size satisfying Mosaic's 128-divisibility; None if the
    shape can't be grouped (caller should fall back to the XLA path)."""
    lanes = lanes or GROUP_LANES
    if head_dim >= 128:
        return 1 if head_dim % 128 == 0 else None
    if 128 % head_dim != 0:
        return None
    hpb = lanes // head_dim
    while hpb > 1 and heads % hpb != 0:
        hpb //= 2
    if heads % hpb != 0 or (hpb * head_dim) % 128 != 0:
        return None
    return hpb


def supported(heads: int, dim: int) -> bool:
    hd = dim // heads
    return heads * hd == dim and heads_per_block(heads, hd) is not None


def _specs(block_b, L, lanes, D, n_groups):
    def q_map(i, j):
        return (i, 0, j)

    def k_map(i, j, off=n_groups):
        return (i, 0, off + j)

    def v_map(i, j, off=2 * n_groups):
        return (i, 0, off + j)

    blk = (block_b, L, lanes)
    return [
        pl.BlockSpec(blk, q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, k_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, v_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((L, L), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]


def _specs_inter(block_b, L, lanes):
    """Interleaved layout [q_g0|k_g0|v_g0|q_g1|...]: group j's q/k/v live at
    lane blocks 3j / 3j+1 / 3j+2 — same three strided DMAs per grid step as
    the standard layout, different offsets."""
    blk = (block_b, L, lanes)
    return [
        pl.BlockSpec(blk, lambda i, j: (i, 0, 3 * j), memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, lambda i, j: (i, 0, 3 * j + 1), memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, lambda i, j: (i, 0, 3 * j + 2), memory_space=pltpu.VMEM),
        pl.BlockSpec((L, L), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]


# ---------------------------------------------------------------------------
# SPMD partitioning: the kernel is embarrassingly parallel over the batch
# dim, but XLA cannot see inside a tpu_custom_call — without a partitioning
# rule GSPMD/Shardy would all-gather the sharded batch around it. The rules
# below declare batch ('B') as the only partitionable factor; every other
# dim is replicated (the kernel mixes across L and head-splits D itself).
# Ref analogue: the reference relies on torch DDP replicating modules; here
# the single-program multi-chip path must partition the custom call.
# ---------------------------------------------------------------------------


def _batch_spec(arg_shapes):
    from jax.sharding import PartitionSpec as P

    spec = arg_shapes[0].sharding.spec
    b = spec[0] if len(spec) else None
    return b, P


def _fwd_infer(heads, interpret, interleaved, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    return NamedSharding(mesh, P(b, None, None))


def _fwd_partition(heads, interpret, interleaved, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    arg_shardings = (
        NamedSharding(mesh, P(b, None, None)),
        NamedSharding(mesh, P(None, None)),
    )
    result_sharding = NamedSharding(mesh, P(b, None, None))

    def lower_fn(qkv, mask):
        return _attn_fwd_impl(qkv, mask, heads, interpret, interleaved)

    return mesh, lower_fn, result_sharding, arg_shardings


def _bwd_infer(heads, interpret, interleaved, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    return NamedSharding(mesh, P(b, None, None))


def _bwd_partition(heads, interpret, interleaved, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    s = NamedSharding(mesh, P(b, None, None))
    arg_shardings = (s, NamedSharding(mesh, P(None, None)), s)

    def lower_fn(qkv, mask, g):
        return _bwd_pallas(qkv, mask, g, heads, interpret, interleaved)

    return mesh, lower_fn, s, arg_shardings


def _make_cp(fn, infer, partition, rule, n_args):
    from jax.experimental.custom_partitioning import custom_partitioning

    cp = custom_partitioning(
        fn, static_argnums=(n_args, n_args + 1, n_args + 2)
    )
    cp.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        need_replication_factors=tuple(dict.fromkeys(
            f for f in rule.replace(",", " ").replace("->", " ").split()
            if f != "B"
        )),
    )
    return cp


_fwd_cp = None
_bwd_cp = None


def _get_fwd_cp():
    global _fwd_cp
    if _fwd_cp is None:
        _fwd_cp = _make_cp(
            lambda qkv, mask, heads, interpret, interleaved: _attn_fwd_impl(
                qkv, mask, heads, interpret, interleaved
            ),
            _fwd_infer, _fwd_partition,
            "B l d, m n -> B l e", 2,
        )
    return _fwd_cp


def _get_bwd_cp():
    global _bwd_cp
    if _bwd_cp is None:
        _bwd_cp = _make_cp(
            lambda qkv, mask, g, heads, interpret, interleaved: _bwd_pallas(
                qkv, mask, g, heads, interpret, interleaved
            ),
            _bwd_infer, _bwd_partition,
            "B l d, m n, B l e -> B l d2", 3,
        )
    return _bwd_cp


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
    return _get_fwd_cp()(qkv, mask, heads, interpret, interleaved)


def _geometry(qkv, heads, block_cap=32):
    B, L, three_d = qkv.shape
    D = three_d // 3
    hd = D // heads
    assert heads * hd == D and 3 * D == three_d
    hpb = heads_per_block(heads, hd)
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
        return _fwd_pallas_slab(qkv, mask, heads, interpret)
    B, L, D, hd, hpb, lanes, n_groups, block_b, grid = _geometry(qkv, heads, FWD_BLOCK_CAP)
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
        return pl.pallas_call(
            functools.partial(_fwd_kernel, scale=scale, hd=hd, hpb=hpb),
            grid=grid,
            in_specs=_specs_inter(block_b, L, lanes),
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, L, D), qkv.dtype),
            interpret=interpret,
            cost_estimate=cost,
        )(qkv, qkv, qkv, mask.astype(jnp.float32))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, hd=hd, hpb=hpb),
        grid=grid,
        in_specs=_specs(block_b, L, lanes, D, n_groups),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, L, D), qkv.dtype),
        interpret=interpret,
        cost_estimate=cost,
    )(qkv, qkv, qkv, mask.astype(jnp.float32))
    return out


def _fwd_pallas_slab(qkv, mask, heads, interpret):
    B, L, three_d = qkv.shape
    D = three_d // 3
    hd = D // heads
    scale = hd ** -0.5
    if mask is None:
        mask = jnp.zeros((L, L), jnp.float32)
    block_b = _pick_block_b(B, SLAB_FWD_CAP)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_slab, scale=scale, hd=hd, heads=heads),
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, L, 3 * D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D), qkv.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * heads * L * L * hd,
            bytes_accessed=(qkv.size + B * L * D) * qkv.dtype.itemsize,
            transcendentals=B * heads * L * L,
        ),
    )(qkv, mask.astype(jnp.float32))


def _attn_fwd(qkv, mask, heads, interpret, interleaved):
    had_mask = mask is not None
    if mask is None:
        mask = jnp.zeros((qkv.shape[1], qkv.shape[1]), jnp.float32)
    out = _get_fwd_cp()(qkv, mask, heads, interpret, interleaved)
    return out, (qkv, mask, had_mask)


def _attn_bwd(heads, interpret, interleaved, res, g):
    qkv, mask, had_mask = res
    dqkv = _get_bwd_cp()(qkv, mask, g, heads, interpret, interleaved)
    dmask = jnp.zeros_like(mask) if had_mask else None
    return dqkv, dmask


def _bwd_pallas(qkv, mask, g, heads, interpret, interleaved=False):
    if KERNEL_VARIANT == "slab" and not interleaved:
        return _bwd_pallas_slab(qkv, mask, g, heads, interpret)
    B, L, D, hd, hpb, lanes, n_groups, block_b, grid = _geometry(qkv, heads, BWD_BLOCK_CAP)
    scale = hd ** -0.5
    blk = (block_b, L, lanes)
    cost = pl.CostEstimate(
        flops=11 * B * heads * L * L * hd,
        bytes_accessed=2 * (qkv.size + B * L * D) * qkv.dtype.itemsize,
        transcendentals=B * heads * L * L,
    )
    if interleaved:
        return pl.pallas_call(
            functools.partial(_bwd_kernel_inter, scale=scale, hd=hd, hpb=hpb),
            grid=grid,
            in_specs=_specs_inter(block_b, L, lanes)
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
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, hd=hd, hpb=hpb),
        grid=grid,
        in_specs=_specs(block_b, L, lanes, D, n_groups)
        + [pl.BlockSpec(blk, lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(blk, lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_shape=[jax.ShapeDtypeStruct((B, L, D), qkv.dtype) for _ in range(3)],
        interpret=interpret,
        cost_estimate=cost,
    )(qkv, qkv, qkv, mask.astype(jnp.float32), g.astype(qkv.dtype))
    return jnp.concatenate([dq, dk, dv], axis=-1)


def _bwd_pallas_slab(qkv, mask, g, heads, interpret):
    B, L, three_d = qkv.shape
    D = three_d // 3
    hd = D // heads
    scale = hd ** -0.5
    block_b = _pick_block_b(B, SLAB_BWD_CAP)
    return pl.pallas_call(
        functools.partial(_bwd_kernel_slab, scale=scale, hd=hd, heads=heads),
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, L, 3 * D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, L, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, L, 3 * D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, 3 * D), qkv.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=11 * B * heads * L * L * hd,
            bytes_accessed=2 * (qkv.size + B * L * D) * qkv.dtype.itemsize,
            transcendentals=B * heads * L * L,
        ),
    )(qkv, mask.astype(jnp.float32), g.astype(qkv.dtype))


fused_attention.defvjp(_attn_fwd, _attn_bwd)


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
