"""Measured-NEGATIVE attention kernel variants (knob-reachable, not shipped).

Every family here was implemented, parity-tested, and measured SLOWER than
the shipped group/pair kernels at model level on the parity config — full
A/B tables in docs/experiments.md. They stay because (a) the knobs remain
reachable for other shapes, (b) the negative results are the evidence base
for the shipped design, and (c) the parity tests pin their math. Shipped
code lives in ops/fused_attention.py; this module is imported lazily from
its dispatch points (and via its module __getattr__), so nothing here
loads unless a variant knob is turned.

Families (knob -> entry points):
- KERNEL_VARIANT='slab'      -> _fwd_pallas_slab / _bwd_pallas_slab
  (contiguous (bB,L,3D) slab DMA; +3 ms model-level vs strided groups)
- attn_impl='pallas_inter'   -> interleave_perm / _specs_inter /
  _bwd_kernel_inter (statically permuted qkv columns; weight-permutation
  cost dominates, +2-3.7 ms)
- BWD_FUSE='dxdb'            -> _bwd_kernel3_dx / _bwd_pallas3_dx /
  _get_bwd3dx_cp (input-grad GEMM inside the kernel; +13 ms — tiny-M dx
  dots serialize with attention dots)
- attn_impl='pallas_t'       -> fused_attention_t (transposed-input
  no-relayout interface; +37 ms)
- attn_impl='pallas_split'   -> fused_attention_split (separate q/k/v
  arrays, concat-free VJP; +0.74 ms)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spatial_clip_tpu.ops import fused_attention as _fa
from spatial_clip_tpu.ops.attention_spmd import _batch_spec, _make_cp
from spatial_clip_tpu.ops.fused_attention import (
    _bwd_compute,
    _bwd_kernel,
    _fwd_kernel,
    _lanes_for,
    _bwd_cap,
    _default_cparams,
    _geometry,
    _one_head_fwd,
    _p_from_scores,
    _pack2,
    _pack_ok,
    _packed_mask,
    _pair_bwd,
    _pair_fwd,
    _pick_block_b,
    _roundup16,
    _specs,
    heads_per_block,
    supported,
)


_bwd3dx_cp = None
_fwd_t_cp = None
_bwd_t_cp = None
_split_fwd_cp = None
_split_bwd_cp = None


def _bwd_kernel3_dx(q_ref, k_ref, v_ref, mask_ref, do_ref, wq_ref, wk_ref,
                    wv_ref, d3_ref, dx_ref, db_ref, acc_ref,
                    *, scale, hd, hpb, packed=False):
    """_bwd_kernel3 + the input-gradient GEMM and bias-gradient reduce fused
    in. Each head-group step j accumulates dq@Wq_j^T + dk@Wk_j^T + dv@Wv_j^T
    into an f32 VMEM scratch (last j writes dx) and its (3, lanes) bias-grad
    partial into a grid-resident db block. XLA's own dx GEMM needs the
    (3,B,L,D) cotangent relaid out into (B·L, 3D) form — a full-activation
    copy (the very bytes the dqkv concatenate used to cost) — and its db
    reduce is another full read (observed: %convert_reduce_fusion over d3);
    in-kernel, both consume vectors already resident in VMEM. d3's only XLA
    consumer left is the dW GEMM, which reads the monolith via a free
    bitcast."""
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
    dims = (((2,), (1,)), ((), ()))  # (bB,L,lanes) x (Din,lanes) -> (bB,L,Din)
    contrib = (
        jax.lax.dot_general(dq, wq_ref[:], dims,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(dk, wk_ref[:], dims,
                              preferred_element_type=jnp.float32)
        + jax.lax.dot_general(dv, wv_ref[:], dims,
                              preferred_element_type=jnp.float32)
    )

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = contrib

    @pl.when(j > 0)
    def _accum():
        acc_ref[:] = acc_ref[:] + contrib

    @pl.when(j == pl.num_programs(1) - 1)
    def _emit():
        dx_ref[:] = acc_ref[:].astype(dx_ref.dtype)

    # bias grad: db block (n_groups, 3, lanes) has a constant index map, so
    # it stays VMEM-resident across the whole grid and flushes once
    @pl.when((i == 0) & (j == 0))
    def _db_init():
        db_ref[:] = jnp.zeros_like(db_ref)

    bsum = jnp.concatenate(
        [jnp.sum(t.astype(jnp.float32), axis=(0, 1))[None, :]
         for t in (dq, dk, dv)], axis=0,
    )  # (3, lanes)
    db_ref[j] = db_ref[j] + bsum

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

def _bwd_pallas3_dx(qkv, mask, g, w, heads, interpret):
    """(d3, dx, db_raw) backward: d3 as in _bwd_pallas3 plus the fused
    input-grad GEMM and bias-grad reduce (see _bwd_kernel3_dx). w must be
    pre-cast to the activation dtype; dx comes back in qkv.dtype
    (accumulated in f32); db_raw is (n_groups, 3, lanes) f32 — reassemble
    with ``db_raw.transpose(1, 0, 2).reshape(3*D)``."""
    B, L, D, hd, hpb, lanes, n_groups, block_b, grid = _geometry(
        qkv, heads, _bwd_cap(qkv.shape[1])
    )
    din = w.shape[0]
    scale = hd ** -0.5
    blk = (block_b, L, lanes)
    cost = pl.CostEstimate(
        flops=(11 * B * heads * L * L * hd) + 6 * B * L * D * din,
        bytes_accessed=3 * (qkv.size + B * L * D) * qkv.dtype.itemsize,
        transcendentals=B * heads * L * L,
    )
    pack = _pack_ok(block_b, L)
    kmask = (jnp.zeros((L, L), jnp.float32) if mask is None
             else mask.astype(jnp.float32))
    if pack:
        kmask = _packed_mask(kmask, L)
    wblk = (din, lanes)
    w_specs = [
        pl.BlockSpec(wblk, functools.partial(
            lambda i, j, off: (0, off + j), off=p * n_groups),
            memory_space=pltpu.VMEM)
        for p in range(3)
    ]
    return pl.pallas_call(
        functools.partial(_bwd_kernel3_dx, scale=scale, hd=hd, hpb=hpb,
                          packed=pack),
        grid=grid,
        in_specs=_specs(block_b, L, lanes, D, n_groups,
                        mask_len=kmask.shape[0])
        + [pl.BlockSpec(blk, lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)]
        + w_specs,
        out_specs=[
            pl.BlockSpec((3, block_b, L, lanes), lambda i, j: (0, i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, L, din), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, 3, lanes), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, B, L, D), qkv.dtype),
            jax.ShapeDtypeStruct((B, L, din), qkv.dtype),
            jax.ShapeDtypeStruct((n_groups, 3, lanes), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((block_b, L, din), jnp.float32)],
        interpret=interpret,
        cost_estimate=cost,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_fa.VMEM_LIMIT_BYTES),
    )(qkv, qkv, qkv, kmask, g.astype(qkv.dtype), w, w, w)

def _bwd3dx_infer(heads, interpret, interleaved, mesh, arg_shapes,
                  result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    return (NamedSharding(mesh, P(None, b, None, None)),
            NamedSharding(mesh, P(b, None, None)),
            NamedSharding(mesh, P(None, None, None)))


def _bwd3dx_partition(heads, interpret, interleaved, mesh, arg_shapes,
                      result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    s = NamedSharding(mesh, P(b, None, None))
    rep2 = NamedSharding(mesh, P(None, None))
    arg_shardings = (s, rep2, s, rep2)
    result_sharding = (NamedSharding(mesh, P(None, b, None, None)), s,
                       NamedSharding(mesh, P(None, None, None)))

    def lower_fn(qkv, mask, g, w):
        d3, dx, db = _bwd_pallas3_dx(qkv, mask, g, w, heads, interpret)
        if b is not None:
            # db is a partial sum over this shard's batch rows; the result
            # is declared replicated, so reduce across the batch axis here
            db = jax.lax.psum(db, b)
        return d3, dx, db

    return mesh, lower_fn, result_sharding, arg_shardings


def _get_bwd3dx_cp():
    global _bwd3dx_cp
    if _bwd3dx_cp is None:
        _bwd3dx_cp = _make_cp(
            lambda qkv, mask, g, w, heads, interpret, interleaved:
            _bwd_pallas3_dx(qkv, mask, g, w, heads, interpret),
            _bwd3dx_infer, _bwd3dx_partition,
            "B l d, m n, B l e, w v -> t B l f, B l w, p q r", 4,
        )
    return _bwd3dx_cp

# ---------------------------------------------------------------------------
# Transposed-input attention (attn_impl='pallas_t'): the optimized HLO shows
# XLA's qkv GEMM naturally emits its (B,L,3D) output in {2,0,1} layout
# (L-major) on TPU, while a Pallas custom call pins operands to the default
# {2,1,0} — costing a 59 MB relayout + bias-add pass per layer per tower
# (the profiled copy/copy_add families, ~4.8 ms/step). This variant consumes
# the LOGICALLY TRANSPOSED (L, B, 3D) no-bias GEMM output — for which the
# {2,1,0} requirement is exactly the GEMM's preferred physical bytes, so the
# jnp.transpose at the call site folds to a bitcast — adds the qkv bias
# inside the kernel (its XLA add pass disappears with the relayout), and
# accumulates the bias grad in-kernel. Backward outputs stay standard
# (B,L,D); the returned cotangent is re-transposed logically, which cancels
# against autodiff's own transpose of the call-site transpose.
# ---------------------------------------------------------------------------


def _specs_t(block_b, L, lanes, n_groups, mask_len):
    blk = (L, block_b, lanes)

    def q_map(i, j):
        return (0, i, j)

    def k_map(i, j, off=n_groups):
        return (0, i, off + j)

    def v_map(i, j, off=2 * n_groups):
        return (0, i, off + j)

    bias_blk = (1, lanes)
    return [
        pl.BlockSpec(blk, q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, k_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, v_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(bias_blk, lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec(bias_blk, lambda i, j, off=n_groups: (0, off + j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(bias_blk, lambda i, j, off=2 * n_groups: (0, off + j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((mask_len, mask_len), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _fwd_kernel_t(q_ref, k_ref, v_ref, bq_ref, bk_ref, bv_ref, mask_ref,
                  o_ref, *, scale, hd, hpb):
    # Mosaic batched matmuls need the batch dim at position 0, so the
    # seq-major (L, bB, hd) slices are transposed in VMEM (a vector
    # shuffle, ~free next to the HBM relayout this variant removes) and
    # the standard per-sub-head math runs unchanged.
    mask = mask_ref[:]
    outs = [None] * hpb
    for s_i in range(hpb):
        sl = slice(s_i * hd, (s_i + 1) * hd)
        q = jnp.swapaxes(q_ref[:, :, sl] + bq_ref[:, sl][None], 0, 1)
        k = jnp.swapaxes(k_ref[:, :, sl] + bk_ref[:, sl][None], 0, 1)
        v = jnp.swapaxes(v_ref[:, :, sl] + bv_ref[:, sl][None], 0, 1)
        outs[s_i] = _one_head_fwd(q, k, v, mask, scale).astype(o_ref.dtype)
    o_ref[:] = outs[0] if hpb == 1 else jnp.concatenate(outs, axis=-1)


def _bwd_kernel_t(q_ref, k_ref, v_ref, bq_ref, bk_ref, bv_ref, mask_ref,
                  do_ref, dq_ref, dk_ref, dv_ref, db_ref,
                  *, scale, hd, hpb):
    """Seq-major-input backward; cotangents come out standard (bB, L, hd)
    per part, plus the in-kernel bias-grad block (n_groups, 3, lanes)."""
    mask = mask_ref[:]
    i = pl.program_id(0)
    j = pl.program_id(1)
    dqs = [None] * hpb
    dks = [None] * hpb
    dvs = [None] * hpb
    for s_i in range(hpb):
        sl = slice(s_i * hd, (s_i + 1) * hd)
        q = jnp.swapaxes(q_ref[:, :, sl] + bq_ref[:, sl][None], 0, 1)
        k = jnp.swapaxes(k_ref[:, :, sl] + bk_ref[:, sl][None], 0, 1)
        v = jnp.swapaxes(v_ref[:, :, sl] + bv_ref[:, sl][None], 0, 1)
        do = do_ref[:, :, sl]                        # (bB, L, hd) standard
        sc = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        sc = sc * scale + mask[None]
        p = _p_from_scores(sc)                       # (bB, Lq, Lk)
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
        dqs[s_i] = dq.astype(dq_ref.dtype)
        dks[s_i] = dk.astype(dk_ref.dtype)
        dvs[s_i] = dv.astype(dv_ref.dtype)
    dq_ref[:] = dqs[0] if hpb == 1 else jnp.concatenate(dqs, axis=-1)
    dk_ref[:] = dks[0] if hpb == 1 else jnp.concatenate(dks, axis=-1)
    dv_ref[:] = dvs[0] if hpb == 1 else jnp.concatenate(dvs, axis=-1)

    @pl.when((i == 0) & (j == 0))
    def _db_init():
        db_ref[:] = jnp.zeros_like(db_ref)

    bsum = jnp.concatenate(
        [jnp.sum(t.astype(jnp.float32), axis=(0, 1))[None, :]
         for t in (dq_ref[:], dk_ref[:], dv_ref[:])], axis=0,
    )
    db_ref[j] = db_ref[j] + bsum


def _geometry_t(qkv_t, heads, block_cap):
    L, B, three_d = qkv_t.shape
    D = three_d // 3
    hd = D // heads
    assert heads * hd == D and 3 * D == three_d
    hpb = heads_per_block(heads, hd)
    assert hpb is not None
    lanes = hpb * hd
    n_groups = heads // hpb
    block_b = _pick_block_b(B, block_cap)
    return B, L, D, hd, hpb, lanes, n_groups, block_b, (B // block_b, n_groups)


def _fwd_pallas_t(qkv_t, bias, mask, heads, interpret):
    B, L, D, hd, hpb, lanes, n_groups, block_b, grid = _geometry_t(
        qkv_t, heads, _fa.FWD_BLOCK_CAP
    )
    scale = hd ** -0.5
    kmask = (jnp.zeros((L, L), jnp.float32) if mask is None
             else mask.astype(jnp.float32))
    cost = pl.CostEstimate(
        flops=4 * B * heads * L * L * hd,
        bytes_accessed=(qkv_t.size + B * L * D) * qkv_t.dtype.itemsize,
        transcendentals=B * heads * L * L,
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel_t, scale=scale, hd=hd, hpb=hpb),
        grid=grid,
        in_specs=_specs_t(block_b, L, lanes, n_groups, L),
        out_specs=pl.BlockSpec((block_b, L, lanes), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D), qkv_t.dtype),
        interpret=interpret,
        cost_estimate=cost,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_fa.VMEM_LIMIT_BYTES),
    )(qkv_t, qkv_t, qkv_t, bias, bias, bias, kmask)


def _bwd_pallas_t(qkv_t, bias, mask, g, heads, interpret):
    B, L, D, hd, hpb, lanes, n_groups, block_b, grid = _geometry_t(
        qkv_t, heads, _bwd_cap(qkv_t.shape[0])
    )
    scale = hd ** -0.5
    kmask = (jnp.zeros((L, L), jnp.float32) if mask is None
             else mask.astype(jnp.float32))
    blk_std = (block_b, L, lanes)
    cost = pl.CostEstimate(
        flops=11 * B * heads * L * L * hd,
        bytes_accessed=2 * (qkv_t.size + B * L * D) * qkv_t.dtype.itemsize,
        transcendentals=B * heads * L * L,
    )
    dq, dk, dv, db_raw = pl.pallas_call(
        functools.partial(_bwd_kernel_t, scale=scale, hd=hd, hpb=hpb),
        grid=grid,
        in_specs=_specs_t(block_b, L, lanes, n_groups, L)
        + [pl.BlockSpec(blk_std, lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(blk_std, lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ] + [pl.BlockSpec((n_groups, 3, lanes), lambda i, j: (0, 0, 0),
                          memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, L, D), qkv_t.dtype)
                   for _ in range(3)]
        + [jax.ShapeDtypeStruct((n_groups, 3, lanes), jnp.float32)],
        interpret=interpret,
        cost_estimate=cost,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_fa.VMEM_LIMIT_BYTES),
    )(qkv_t, qkv_t, qkv_t, bias, bias, bias, kmask, g.astype(qkv_t.dtype))
    return dq, dk, dv, db_raw


_fwd_t_cp = None
_bwd_t_cp = None


def _batch_spec_t(arg_shapes):
    from jax.sharding import PartitionSpec as P

    spec = arg_shapes[0].sharding.spec
    b = spec[1] if len(spec) > 1 else None
    return b, P


def _fwd_t_infer(heads, interpret, interleaved, mesh, arg_shapes,
                 result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec_t(arg_shapes)
    return NamedSharding(mesh, P(b, None, None))


def _fwd_t_partition(heads, interpret, interleaved, mesh, arg_shapes,
                     result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec_t(arg_shapes)
    arg_shardings = (
        NamedSharding(mesh, P(None, b, None)),
        NamedSharding(mesh, P(None, None)),
        NamedSharding(mesh, P(None, None)),
    )
    result_sharding = NamedSharding(mesh, P(b, None, None))

    def lower_fn(qkv_t, bias, mask):
        return _fwd_pallas_t(qkv_t, bias, mask, heads, interpret)

    return mesh, lower_fn, result_sharding, arg_shardings


def _bwd_t_infer(heads, interpret, interleaved, mesh, arg_shapes,
                 result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec_t(arg_shapes)
    s = NamedSharding(mesh, P(b, None, None))
    return (s, s, s, NamedSharding(mesh, P(None, None, None)))


def _bwd_t_partition(heads, interpret, interleaved, mesh, arg_shapes,
                     result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec_t(arg_shapes)
    s = NamedSharding(mesh, P(b, None, None))
    rep = NamedSharding(mesh, P(None, None))
    arg_shardings = (NamedSharding(mesh, P(None, b, None)), rep, rep, s)
    result_sharding = (s, s, s, NamedSharding(mesh, P(None, None, None)))

    def lower_fn(qkv_t, bias, mask, g):
        dq, dk, dv, db = _bwd_pallas_t(qkv_t, bias, mask, g, heads, interpret)
        if b is not None:
            db = jax.lax.psum(db, b)
        return dq, dk, dv, db

    return mesh, lower_fn, result_sharding, arg_shardings


def _get_fwd_t_cp():
    global _fwd_t_cp
    if _fwd_t_cp is None:
        _fwd_t_cp = _make_cp(
            lambda qkv_t, bias, mask, heads, interpret, interleaved:
            _fwd_pallas_t(qkv_t, bias, mask, heads, interpret),
            _fwd_t_infer, _fwd_t_partition,
            "l B d, c1 c2, m n -> B l2 e", 3,
        )
    return _fwd_t_cp


def _get_bwd_t_cp():
    global _bwd_t_cp
    if _bwd_t_cp is None:
        _bwd_t_cp = _make_cp(
            lambda qkv_t, bias, mask, g, heads, interpret, interleaved:
            _bwd_pallas_t(qkv_t, bias, mask, g, heads, interpret),
            _bwd_t_infer, _bwd_t_partition,
            "l B d, c1 c2, m n, B l2 e -> B l3 f, B l4 h, B l5 k, p q r", 4,
        )
    return _bwd_t_cp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention_t(qkv_nb, bias, mask, heads: int, interpret: bool = False):
    """Multi-head attention over a no-bias fused qkv tensor with a
    seq-major kernel boundary.

    qkv_nb: (B, L, 3*D) — the qkv GEMM output WITHOUT bias. The logical
    transpose to the kernel's (L, B, 3D) input happens INSIDE this
    custom_vjp (autodiff never sees it), so it folds to a bitcast of the
    GEMM's natural {2,0,1} output layout — no relayout copy, and the bias
    add rides inside the kernel. bias: (1, 3*D). Returns (B, L, D); the
    cotangent comes back as a standard layout-flexible concatenate."""
    if mask is None:
        mask = jnp.zeros((qkv_nb.shape[1], qkv_nb.shape[1]), jnp.float32)
    qkv_t = jnp.transpose(qkv_nb, (1, 0, 2))
    return _get_fwd_t_cp()(qkv_t, bias, mask, heads, interpret, False)


def _attn_t_fwd(qkv_nb, bias, mask, heads, interpret):
    had_mask = mask is not None
    m = (mask if had_mask
         else jnp.zeros((qkv_nb.shape[1], qkv_nb.shape[1]), jnp.float32))
    qkv_t = jnp.transpose(qkv_nb, (1, 0, 2))
    out = _get_fwd_t_cp()(qkv_t, bias, m, heads, interpret, False)
    return out, (qkv_t, bias, m, had_mask)


def _attn_t_bwd(heads, interpret, res, g):
    qkv_t, bias, m, had_mask = res
    dq, dk, dv, db_raw = _get_bwd_t_cp()(qkv_t, bias, m, g, heads, interpret, False)
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)  # (B,L,3D), layout-flexible
    db = db_raw.transpose(1, 0, 2).reshape(1, -1).astype(bias.dtype)
    dmask = jnp.zeros_like(m) if had_mask else None
    return dqkv, db, dmask


fused_attention_t.defvjp(_attn_t_fwd, _attn_t_bwd)

# ---------------------------------------------------------------------------
# Split-projection attention: q/k/v arrive as three separate (B, L, D)
# arrays (three slice-GEMMs of the same stored (D, 3D) weight at the model
# level) and the VJP returns (dq, dk, dv) separately.
#
# Motivation (round-3 HLO attribution, scripts/analyze_hlo.py): the fused
# (B, L, 3D) qkv interface forces the backward to reassemble dqkv with
# jnp.concatenate — lowered as a chain of dynamic-update-slice fusions
# (1.6 ms 'constant_dynamic-update-slice' family + part of 'copy_add',
# a full dqkv read+write per layer) because a custom call's outputs cannot
# fuse into the concat. With split arrays every kernel output IS the
# cotangent the per-slice GEMM backward consumes — no concat exists.
# The kernel body, geometry, packing, and grid are IDENTICAL to the fused
# interface; only the BlockSpec offsets differ (each operand indexes its
# own array at lane-block j instead of j / n_groups+j / 2*n_groups+j).
# Ref analogue: open_clip computes one in_proj GEMM (transformer.py:92);
# splitting the projection is TPU-layout-motivated, math-identical.
# ---------------------------------------------------------------------------


def _split_specs(block_b, L, lanes, mask_len):
    blk = (block_b, L, lanes)
    m = lambda i, j: (i, 0, j)
    return [
        pl.BlockSpec(blk, m, memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, m, memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, m, memory_space=pltpu.VMEM),
        pl.BlockSpec((mask_len, mask_len), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _split_geometry(q, heads, cap):
    B, L, D = q.shape
    hd = D // heads
    assert heads * hd == D
    hpb = heads_per_block(heads, hd, _lanes_for(L))
    assert hpb is not None, (
        f"unsupported head geometry heads={heads} head_dim={hd}; guard with "
        "fused_attention.supported()"
    )
    lanes = hpb * hd
    n_groups = heads // hpb
    block_b = _pick_block_b(B, cap)
    return B, L, D, hd, hpb, lanes, n_groups, block_b, (B // block_b, n_groups)


def _split_fwd_impl(q, k, v, mask, heads, interpret, unused=False):
    B, L, D, hd, hpb, lanes, n_groups, block_b, grid = _split_geometry(
        q, heads, _fa.FWD_BLOCK_CAP
    )
    scale = hd ** -0.5
    pack = _pack_ok(block_b, L)
    kmask = mask.astype(jnp.float32)
    if pack:
        kmask = _packed_mask(kmask, L)
    cost = pl.CostEstimate(
        flops=4 * B * heads * L * L * hd,
        bytes_accessed=4 * B * L * D * q.dtype.itemsize,
        transcendentals=B * heads * L * L,
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, hd=hd, hpb=hpb,
                          packed=pack),
        grid=grid,
        in_specs=_split_specs(block_b, L, lanes, kmask.shape[0]),
        out_specs=pl.BlockSpec((block_b, L, lanes), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
        interpret=interpret,
        cost_estimate=cost,
        compiler_params=None if interpret else _default_cparams(grid),
    )(q, k, v, kmask)


def _split_bwd_impl(q, k, v, mask, g, heads, interpret, unused=False):
    B, L, D, hd, hpb, lanes, n_groups, block_b, grid = _split_geometry(
        q, heads, _bwd_cap(q.shape[1])
    )
    scale = hd ** -0.5
    blk = (block_b, L, lanes)
    pack = _pack_ok(block_b, L)
    kmask = mask.astype(jnp.float32)
    if pack:
        kmask = _packed_mask(kmask, L)
    cost = pl.CostEstimate(
        flops=11 * B * heads * L * L * hd,
        bytes_accessed=8 * B * L * D * q.dtype.itemsize,
        transcendentals=B * heads * L * L,
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, hd=hd, hpb=hpb,
                          packed=pack),
        grid=grid,
        in_specs=_split_specs(block_b, L, lanes, kmask.shape[0])
        + [pl.BlockSpec(blk, lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(blk, lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_shape=[jax.ShapeDtypeStruct((B, L, D), q.dtype)
                   for _ in range(3)],
        interpret=interpret,
        cost_estimate=cost,
        compiler_params=None if interpret else _default_cparams(grid),
    )(q, k, v, kmask, g.astype(q.dtype))


def _split_fwd_infer(heads, interpret, unused, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    return NamedSharding(mesh, P(b, None, None))


def _split_fwd_partition(heads, interpret, unused, mesh, arg_shapes,
                         result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    s = NamedSharding(mesh, P(b, None, None))
    m = NamedSharding(mesh, P(None, None))

    def lower_fn(q, k, v, mask):
        return _split_fwd_impl(q, k, v, mask, heads, interpret)

    return mesh, lower_fn, s, (s, s, s, m)


def _split_bwd_infer(heads, interpret, unused, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    s = NamedSharding(mesh, P(b, None, None))
    return (s, s, s)


def _split_bwd_partition(heads, interpret, unused, mesh, arg_shapes,
                         result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    s = NamedSharding(mesh, P(b, None, None))
    m = NamedSharding(mesh, P(None, None))

    def lower_fn(q, k, v, mask, g):
        return _split_bwd_impl(q, k, v, mask, g, heads, interpret)

    return mesh, lower_fn, (s, s, s), (s, s, s, m, s)


def _get_split_fwd_cp():
    global _split_fwd_cp
    if _split_fwd_cp is None:
        _split_fwd_cp = _make_cp(
            lambda q, k, v, mask, heads, interpret, unused:
            _split_fwd_impl(q, k, v, mask, heads, interpret, unused),
            _split_fwd_infer, _split_fwd_partition,
            "B l d, B l e, B l f, m n -> B l g", 4,
        )
    return _split_fwd_cp


def _get_split_bwd_cp():
    global _split_bwd_cp
    if _split_bwd_cp is None:
        _split_bwd_cp = _make_cp(
            lambda q, k, v, mask, g, heads, interpret, unused:
            _split_bwd_impl(q, k, v, mask, g, heads, interpret, unused),
            _split_bwd_infer, _split_bwd_partition,
            "B l d, B l e, B l f, m n, B l g -> B l d2, B l e2, B l f2", 5,
        )
    return _split_bwd_cp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention_split(q, k, v, mask, heads: int, interpret: bool = False):
    """Attention over separate (B, L, D) q/k/v arrays (no fused-qkv buffer;
    the VJP returns dq/dk/dv separately — no dqkv concat is ever built).
    Same math/kernel as :func:`fused_attention`; tests enforce parity."""
    m = (jnp.zeros((q.shape[1],) * 2, jnp.float32) if mask is None else mask)
    return _get_split_fwd_cp()(q, k, v, m, heads, interpret, False)


def _split_vjp_fwd(q, k, v, mask, heads, interpret):
    had = mask is not None
    m = (jnp.zeros((q.shape[1],) * 2, jnp.float32) if mask is None else mask)
    out = _get_split_fwd_cp()(q, k, v, m, heads, interpret, False)
    return out, (q, k, v, m, had)


def _split_vjp_bwd(heads, interpret, res, g):
    q, k, v, m, had = res
    dq, dk, dv = _get_split_bwd_cp()(q, k, v, m, g, heads, interpret, False)
    dm = jnp.zeros_like(m) if had else None
    return dq, dk, dv, dm


fused_attention_split.defvjp(_split_vjp_fwd, _split_vjp_bwd)
