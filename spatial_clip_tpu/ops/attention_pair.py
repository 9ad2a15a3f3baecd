"""Paired dual-tower attention: ONE pallas_call per (image, text) layer.

Shipped path (CLIP.encode_pair zips the two towers' layer-i attentions to
halve the per-step custom-call count, the measured dominant attention-family
cost). Split from ops/fused_attention.py for navigability; the kernel math
(_pair_fwd/_pair_bwd packed dots) lives there and is shared with the single-
tower kernels. Reachable as fused_attention.fused_attention_pair via the
module __getattr__ forwarder, so call sites and tests are unchanged.
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
    _bwd_cap,
    _default_cparams,
    _bwd_compute,
    _bwd_kernel,
    _fwd_kernel,
    _geometry,
    _lanes_for,
    _one_head_fwd,
    _pack_ok,
    _packed_mask,
    _pair_bwd,
    _pair_fwd,
    _pick_block_b,
    heads_per_block,
    supported,
)


# ---------------------------------------------------------------------------
# Paired dual-tower attention: ONE pallas_call for (image layer-i, text
# layer-i).
#
# Motivation (round-3 profile, scripts/profile_step.py): the attention family
# costs 11.6 ms/step against a ~6.4 ms microbenched floor — the difference is
# per-INVOCATION overhead (dispatch + pipeline prologue), confirmed by block
# size sweeps being flat from 16 to 128 rows and lane-group widening
# (GROUP_LANES 256, reports/ab_lanes_r3.json) being flat too: the cost scales
# with the NUMBER of custom calls, not the grid geometry. The two CLIP towers
# are data-independent at equal depth, so their per-layer attention calls can
# share one custom call: grid = (B/bb, Ga + Gb) where steps j < Ga run the
# image head-groups and j >= Ga the text head-groups. Inactive-tower operand
# blocks freeze their index (revisit => no DMA); inactive outputs are simply
# not written during the other tower's steps (their last-written block stays
# resident until the index changes). This halves the invocation count
# (48 -> 24 per step at depth 12) WITHOUT moving any GEMM out of XLA — the
# failure mode of every negative fusion experiment in docs/experiments.md.
#
# Ref analogue: open_clip runs the towers as separate torch modules
# (src/open_clip/model.py:464-479); on GPU the per-launch cost is hidden by
# CUDA stream pipelining, on TPU the custom-call boundary is synchronous —
# hence this TPU-specific formulation.
# ---------------------------------------------------------------------------


def pair_supported(heads_a, dim_a, heads_b, dim_b) -> bool:
    return supported(heads_a, dim_a) and supported(heads_b, dim_b)


def _pair_geoms(qkv_a, heads_a, qkv_b, heads_b, cap):
    Ba, La, Da3 = qkv_a.shape
    Bb, Lb, Db3 = qkv_b.shape
    assert Ba == Bb, f"paired towers need equal batch, got {Ba} vs {Bb}"
    ga = _geometry(qkv_a, heads_a, cap)
    gb = _geometry(qkv_b, heads_b, cap)
    # same B and cap => same block_b for both towers
    assert ga[7] == gb[7]
    return ga, gb


def _pair_in_specs(block_b, La, lanes_a, Ga, Lb, lanes_b, Gb, mla, mlb):
    def a_map(off):
        return lambda i, j: (i, 0, off * Ga + jnp.minimum(j, Ga - 1))

    def b_map(off):
        return lambda i, j: (i, 0, off * Gb + jnp.maximum(j - Ga, 0))

    blk_a = (block_b, La, lanes_a)
    blk_b = (block_b, Lb, lanes_b)
    return (
        [pl.BlockSpec(blk_a, a_map(o), memory_space=pltpu.VMEM)
         for o in (0, 1, 2)]
        + [pl.BlockSpec((mla, mla), lambda i, j: (0, 0),
                        memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(blk_b, b_map(o), memory_space=pltpu.VMEM)
           for o in (0, 1, 2)]
        + [pl.BlockSpec((mlb, mlb), lambda i, j: (0, 0),
                        memory_space=pltpu.VMEM)],
        blk_a,
        blk_b,
        a_map(0),
        b_map(0),
    )


def _pair_fwd_duo_kernel(qa, ka, va, ma, qb, kb, vb, mb, oa, ob, *,
                         Ga, kw_a, kw_b):
    j = pl.program_id(1)

    @pl.when(j < Ga)
    def _():
        _fwd_kernel(qa, ka, va, ma, oa, **kw_a)

    @pl.when(j >= Ga)
    def _():
        _fwd_kernel(qb, kb, vb, mb, ob, **kw_b)


def _pair_bwd_duo_kernel(qa, ka, va, ma, doa, qb, kb, vb, mb, dob,
                         dqa, dka, dva, dqb, dkb, dvb, *, Ga, kw_a, kw_b):
    j = pl.program_id(1)

    @pl.when(j < Ga)
    def _():
        _bwd_kernel(qa, ka, va, ma, doa, dqa, dka, dva, **kw_a)

    @pl.when(j >= Ga)
    def _():
        _bwd_kernel(qb, kb, vb, mb, dob, dqb, dkb, dvb, **kw_b)


def _pair_masks(mask_a, qkv_a, mask_b, qkv_b, block_b):
    """fp32 (possibly pack-expanded) kernel masks + per-tower pack flags."""
    La, Lb = qkv_a.shape[1], qkv_b.shape[1]
    ma = (jnp.zeros((La, La), jnp.float32) if mask_a is None
          else mask_a.astype(jnp.float32))
    mb = (jnp.zeros((Lb, Lb), jnp.float32) if mask_b is None
          else mask_b.astype(jnp.float32))
    pack_a = _pack_ok(block_b, La)
    pack_b = _pack_ok(block_b, Lb)
    if pack_a:
        ma = _packed_mask(ma, La)
    if pack_b:
        mb = _packed_mask(mb, Lb)
    return ma, mb, pack_a, pack_b


def _pair_fwd_impl(qkv_a, mask_a, qkv_b, mask_b, heads_a, heads_b, interpret):
    ga, gb = _pair_geoms(qkv_a, heads_a, qkv_b, heads_b, _fa.FWD_BLOCK_CAP)
    B, La, Da, hd_a, hpb_a, lanes_a, Ga, block_b, _ = ga
    _, Lb, Db, hd_b, hpb_b, lanes_b, Gb, _, _ = gb
    grid = (B // block_b, Ga + Gb)
    ma, mb, pack_a, pack_b = _pair_masks(mask_a, qkv_a, mask_b, qkv_b, block_b)
    in_specs, blk_a, blk_b, oa_map, ob_map = _pair_in_specs(
        block_b, La, lanes_a, Ga, Lb, lanes_b, Gb, ma.shape[0], mb.shape[0])
    kw_a = dict(scale=hd_a ** -0.5, hd=hd_a, hpb=hpb_a, packed=pack_a)
    kw_b = dict(scale=hd_b ** -0.5, hd=hd_b, hpb=hpb_b, packed=pack_b)
    cost = pl.CostEstimate(
        flops=4 * B * (heads_a * La * La * hd_a + heads_b * Lb * Lb * hd_b),
        bytes_accessed=(qkv_a.size + B * La * Da + qkv_b.size + B * Lb * Db)
        * qkv_a.dtype.itemsize,
        transcendentals=B * (heads_a * La * La + heads_b * Lb * Lb),
    )
    return pl.pallas_call(
        functools.partial(_pair_fwd_duo_kernel, Ga=Ga, kw_a=kw_a, kw_b=kw_b),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(blk_a, oa_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_b, ob_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, La, Da), qkv_a.dtype),
            jax.ShapeDtypeStruct((B, Lb, Db), qkv_b.dtype),
        ],
        interpret=interpret,
        cost_estimate=cost,
        compiler_params=None if interpret else _default_cparams(grid),
    )(qkv_a, qkv_a, qkv_a, ma, qkv_b, qkv_b, qkv_b, mb)


def _pair_bwd_impl(qkv_a, mask_a, g_a, qkv_b, mask_b, g_b,
                   heads_a, heads_b, interpret):
    ga, gb = _pair_geoms(qkv_a, heads_a, qkv_b, heads_b,
                        max(_bwd_cap(qkv_a.shape[1]), _bwd_cap(qkv_b.shape[1])))
    B, La, Da, hd_a, hpb_a, lanes_a, Ga, block_b, _ = ga
    _, Lb, Db, hd_b, hpb_b, lanes_b, Gb, _, _ = gb
    grid = (B // block_b, Ga + Gb)
    ma, mb, pack_a, pack_b = _pair_masks(mask_a, qkv_a, mask_b, qkv_b, block_b)
    in_specs, blk_a, blk_b, oa_map, ob_map = _pair_in_specs(
        block_b, La, lanes_a, Ga, Lb, lanes_b, Gb, ma.shape[0], mb.shape[0])
    # gradient inputs ride the same maps as their towers' q blocks
    in_specs = (in_specs[:4]
                + [pl.BlockSpec(blk_a, oa_map, memory_space=pltpu.VMEM)]
                + in_specs[4:]
                + [pl.BlockSpec(blk_b, ob_map, memory_space=pltpu.VMEM)])
    kw_a = dict(scale=hd_a ** -0.5, hd=hd_a, hpb=hpb_a, packed=pack_a)
    kw_b = dict(scale=hd_b ** -0.5, hd=hd_b, hpb=hpb_b, packed=pack_b)
    cost = pl.CostEstimate(
        flops=11 * B * (heads_a * La * La * hd_a + heads_b * Lb * Lb * hd_b),
        bytes_accessed=2 * (qkv_a.size + B * La * Da + qkv_b.size
                            + B * Lb * Db) * qkv_a.dtype.itemsize,
        transcendentals=B * (heads_a * La * La + heads_b * Lb * Lb),
    )
    outs = pl.pallas_call(
        functools.partial(_pair_bwd_duo_kernel, Ga=Ga, kw_a=kw_a, kw_b=kw_b),
        grid=grid,
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(blk_a, oa_map, memory_space=pltpu.VMEM)
                   for _ in range(3)]
        + [pl.BlockSpec(blk_b, ob_map, memory_space=pltpu.VMEM)
           for _ in range(3)],
        out_shape=[jax.ShapeDtypeStruct((B, La, Da), qkv_a.dtype)
                   for _ in range(3)]
        + [jax.ShapeDtypeStruct((B, Lb, Db), qkv_b.dtype) for _ in range(3)],
        interpret=interpret,
        cost_estimate=cost,
        compiler_params=None if interpret else _default_cparams(grid),
    )(qkv_a, qkv_a, qkv_a, ma, g_a.astype(qkv_a.dtype),
      qkv_b, qkv_b, qkv_b, mb, g_b.astype(qkv_b.dtype))
    dqkv_a = jnp.concatenate(outs[:3], axis=-1)
    dqkv_b = jnp.concatenate(outs[3:], axis=-1)
    return dqkv_a, dqkv_b


# --- SPMD partitioning (batch = the only partitionable factor, like the
# single-tower kernels) ---


def _pair_fwd_infer(heads_a, heads_b, interpret, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    s = NamedSharding(mesh, P(b, None, None))
    return (s, s)


def _pair_fwd_partition(heads_a, heads_b, interpret, mesh, arg_shapes,
                        result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    s = NamedSharding(mesh, P(b, None, None))
    m = NamedSharding(mesh, P(None, None))
    arg_shardings = (s, m, s, m)

    def lower_fn(qkv_a, mask_a, qkv_b, mask_b):
        return _pair_fwd_impl(qkv_a, mask_a, qkv_b, mask_b,
                              heads_a, heads_b, interpret)

    return mesh, lower_fn, (s, s), arg_shardings


def _pair_bwd_infer(heads_a, heads_b, interpret, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    s = NamedSharding(mesh, P(b, None, None))
    return (s, s)


def _pair_bwd_partition(heads_a, heads_b, interpret, mesh, arg_shapes,
                        result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    s = NamedSharding(mesh, P(b, None, None))
    m = NamedSharding(mesh, P(None, None))
    arg_shardings = (s, m, s, s, m, s)

    def lower_fn(qkv_a, mask_a, g_a, qkv_b, mask_b, g_b):
        return _pair_bwd_impl(qkv_a, mask_a, g_a, qkv_b, mask_b, g_b,
                              heads_a, heads_b, interpret)

    return mesh, lower_fn, (s, s), arg_shardings


_pair_fwd_cp = None
_pair_bwd_cp = None


def _get_pair_fwd_cp():
    global _pair_fwd_cp
    if _pair_fwd_cp is None:
        _pair_fwd_cp = _make_cp(
            lambda qkv_a, mask_a, qkv_b, mask_b, heads_a, heads_b, interpret:
            _pair_fwd_impl(qkv_a, mask_a, qkv_b, mask_b, heads_a, heads_b,
                           interpret),
            _pair_fwd_infer, _pair_fwd_partition,
            "B l d, m n, B p e, r s -> B l f, B p g", 4,
        )
    return _pair_fwd_cp


def _get_pair_bwd_cp():
    global _pair_bwd_cp
    if _pair_bwd_cp is None:
        _pair_bwd_cp = _make_cp(
            lambda qkv_a, mask_a, g_a, qkv_b, mask_b, g_b, heads_a, heads_b,
            interpret: _pair_bwd_impl(qkv_a, mask_a, g_a, qkv_b, mask_b, g_b,
                                      heads_a, heads_b, interpret),
            _pair_bwd_infer, _pair_bwd_partition,
            "B l d, m n, B l e, B p f, r s, B p g -> B l d2, B p f2", 6,
        )
    return _pair_bwd_cp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_attention_pair(qkv_a, mask_a, qkv_b, mask_b, heads_a: int,
                         heads_b: int, interpret: bool = False):
    """Dual-tower attention: image layer-i and text layer-i in ONE kernel.

    qkv_a: (B, La, 3*Da), qkv_b: (B, Lb, 3*Db); masks (L, L) additive fp32
    or None. Returns (ctx_a, ctx_b) pre-output-projection contexts. Exact
    same math as two :func:`fused_attention` calls (tests enforce parity);
    only the invocation count differs.
    """
    oa, ob = _get_pair_fwd_cp()(
        qkv_a,
        (jnp.zeros((qkv_a.shape[1],) * 2, jnp.float32) if mask_a is None
         else mask_a),
        qkv_b,
        (jnp.zeros((qkv_b.shape[1],) * 2, jnp.float32) if mask_b is None
         else mask_b),
        heads_a, heads_b, interpret)
    return oa, ob


def _pair_vjp_fwd(qkv_a, mask_a, qkv_b, mask_b, heads_a, heads_b, interpret):
    had_a, had_b = mask_a is not None, mask_b is not None
    ma = (jnp.zeros((qkv_a.shape[1],) * 2, jnp.float32) if mask_a is None
          else mask_a)
    mb = (jnp.zeros((qkv_b.shape[1],) * 2, jnp.float32) if mask_b is None
          else mask_b)
    oa, ob = _get_pair_fwd_cp()(qkv_a, ma, qkv_b, mb, heads_a, heads_b,
                                interpret)
    return (oa, ob), (qkv_a, ma, qkv_b, mb, had_a, had_b)


def _pair_vjp_bwd(heads_a, heads_b, interpret, res, g):
    qkv_a, ma, qkv_b, mb, had_a, had_b = res
    g_a, g_b = g
    dqkv_a, dqkv_b = _get_pair_bwd_cp()(
        qkv_a, ma, g_a, qkv_b, mb, g_b, heads_a, heads_b, interpret)
    dma = jnp.zeros_like(ma) if had_a else None
    dmb = jnp.zeros_like(mb) if had_b else None
    return dqkv_a, dma, dqkv_b, dmb


fused_attention_pair.defvjp(_pair_vjp_fwd, _pair_vjp_bwd)
