"""SPMD custom-partitioning glue for the shipped attention kernels.

XLA cannot see inside a tpu_custom_call — without a partitioning rule
GSPMD/Shardy would all-gather the sharded batch around every kernel. The
infer/partition rules here declare batch ('B') as the only partitionable
factor (the kernel mixes across L and head-splits D itself); _make_cp wraps
each kernel impl in jax.experimental.custom_partitioning with a shardy
sharding_rule + GSPMD callbacks. Impl functions live in
ops/fused_attention.py; this module only owns the partitioning wrappers and
their per-family caches. Ref analogue: the reference relies on torch DDP
replicating modules; the single-program multi-chip path must partition the
custom call.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from spatial_clip_tpu.ops import fused_attention as _fa
from spatial_clip_tpu.ops.fused_attention import (
    _attn_fwd_impl,
    _bwd_pallas,
    _bwd_pallas3,
    _bwd_pallas3_db,
    _bwd_pallas3_db_lse,
    _fwd_pallas_lse,
)


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

_bwd3_cp = None


def _bwd3_infer(heads, interpret, interleaved, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    return NamedSharding(mesh, P(None, b, None, None))


def _bwd3_partition(heads, interpret, interleaved, mesh, arg_shapes,
                    result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    s = NamedSharding(mesh, P(b, None, None))
    arg_shardings = (s, NamedSharding(mesh, P(None, None)), s)
    result_sharding = NamedSharding(mesh, P(None, b, None, None))

    def lower_fn(qkv, mask, g):
        return _bwd_pallas3(qkv, mask, g, heads, interpret)

    return mesh, lower_fn, result_sharding, arg_shardings


def _get_bwd3_cp():
    global _bwd3_cp
    if _bwd3_cp is None:
        _bwd3_cp = _make_cp(
            lambda qkv, mask, g, heads, interpret, interleaved: _bwd_pallas3(
                qkv, mask, g, heads, interpret
            ),
            _bwd3_infer, _bwd3_partition,
            "B l d, m n, B l e -> t B l f", 3,
        )
    return _bwd3_cp

_bwd3db_cp = None


def _bwd3db_infer(heads, interpret, interleaved, mesh, arg_shapes,
                  result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    return (NamedSharding(mesh, P(None, b, None, None)),
            NamedSharding(mesh, P(None, None, None)))


def _bwd3db_partition(heads, interpret, interleaved, mesh, arg_shapes,
                      result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    s = NamedSharding(mesh, P(b, None, None))
    arg_shardings = (s, NamedSharding(mesh, P(None, None)), s)
    result_sharding = (NamedSharding(mesh, P(None, b, None, None)),
                       NamedSharding(mesh, P(None, None, None)))

    def lower_fn(qkv, mask, g):
        d3, db = _bwd_pallas3_db(qkv, mask, g, heads, interpret)
        if b is not None:
            db = jax.lax.psum(db, b)
        return d3, db

    return mesh, lower_fn, result_sharding, arg_shardings


def _get_bwd3db_cp():
    global _bwd3db_cp
    if _bwd3db_cp is None:
        _bwd3db_cp = _make_cp(
            lambda qkv, mask, g, heads, interpret, interleaved:
            _bwd_pallas3_db(qkv, mask, g, heads, interpret),
            _bwd3db_infer, _bwd3db_partition,
            "B l d, m n, B l e -> t B l f, p q r", 3,
        )
    return _bwd3db_cp

def _fwd_lse_infer(heads, interpret, interleaved, mesh, arg_shapes,
                   result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    return (NamedSharding(mesh, P(b, None, None)),
            NamedSharding(mesh, P(None, b, None)))


def _fwd_lse_partition(heads, interpret, interleaved, mesh, arg_shapes,
                       result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    s = NamedSharding(mesh, P(b, None, None))
    arg_shardings = (s, NamedSharding(mesh, P(None, None)))
    result_sharding = (s, NamedSharding(mesh, P(None, b, None)))

    def lower_fn(qkv, mask):
        return _fwd_pallas_lse(qkv, mask, heads, interpret)

    return mesh, lower_fn, result_sharding, arg_shardings


def _bwd3db_lse_infer(heads, interpret, interleaved, mesh, arg_shapes,
                      result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    return (NamedSharding(mesh, P(None, b, None, None)),
            NamedSharding(mesh, P(None, None, None)))


def _bwd3db_lse_partition(heads, interpret, interleaved, mesh, arg_shapes,
                          result_shape):
    from jax.sharding import NamedSharding

    b, P = _batch_spec(arg_shapes)
    s = NamedSharding(mesh, P(b, None, None))
    arg_shardings = (s, NamedSharding(mesh, P(None, None)),
                     NamedSharding(mesh, P(None, b, None)), s)
    result_sharding = (NamedSharding(mesh, P(None, b, None, None)),
                       NamedSharding(mesh, P(None, None, None)))

    def lower_fn(qkv, mask, lse, g):
        d3, db = _bwd_pallas3_db_lse(qkv, mask, lse, g, heads, interpret)
        if b is not None:
            db = jax.lax.psum(db, b)
        return d3, db

    return mesh, lower_fn, result_sharding, arg_shardings


_fwd_lse_cp = None
_bwd3db_lse_cp = None


def _get_fwd_lse_cp():
    global _fwd_lse_cp
    if _fwd_lse_cp is None:
        _fwd_lse_cp = _make_cp(
            lambda qkv, mask, heads, interpret, interleaved:
            _fwd_pallas_lse(qkv, mask, heads, interpret),
            _fwd_lse_infer, _fwd_lse_partition,
            "B l d, m n -> B l e, h B q", 2,
        )
    return _fwd_lse_cp


def _get_bwd3db_lse_cp():
    global _bwd3db_lse_cp
    if _bwd3db_lse_cp is None:
        _bwd3db_lse_cp = _make_cp(
            lambda qkv, mask, lse, g, heads, interpret, interleaved:
            _bwd_pallas3_db_lse(qkv, mask, lse, g, heads, interpret),
            _bwd3db_lse_infer, _bwd3db_lse_partition,
            "B l d, m n, h B q, B l e -> t B l f, p r s", 4,
        )
    return _bwd3db_lse_cp
