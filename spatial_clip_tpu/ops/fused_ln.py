"""Fused LayerNorm as a Pallas TPU kernel (fwd + custom VJP).

Why: the optimized-HLO + device-trace attribution (docs/experiments.md,
round-2 cont.) shows XLA's LayerNorm BACKWARD runs far from its bandwidth
floor — the chain microbench measures ~1.9 ms/layer for the backward at a
~0.1 ms floor (lane-dim reductions + multi-fusion structure), and the LN
stat fusions (%convert_reduce_fusion, 51 of them) average 3.7x their read
floor. This kernel does each direction in ONE VMEM pass:

- forward: mean/E[x^2] (fp32, the exact one-pass formulation that is the
  model default), normalize, scale+shift — read x once, write y once.
- backward: recompute the row statistics from x (cheaper than saving padded
  per-row stats), produce dx in the same pass, and ACCUMULATE dgamma/dbeta
  into grid-resident (1, D) f32 blocks (constant index map -> they live in
  VMEM across the whole grid and flush once), so the parameter-grad
  reductions never become separate XLA passes over dy.

Unlike the fused LN->GEMM kernel (ops/fused_ln_dense, measured +22 ms),
this takes NO GEMM away from XLA's scheduler — it only replaces the
elementwise/reduce passes that XLA demonstrably runs inefficiently.

Ref analogue: torch F.layer_norm inside ref transformer.py:60-90; this is
the TPU-native training-path replacement.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_LIMIT_BYTES = 64 * 2 ** 20


def _pick_rows(R: int, cap: int = 1024) -> int:
    for r in range(min(cap, R), 0, -1):
        if R % r == 0:
            return r
    return 1


def supported(D: int) -> bool:
    return D % 128 == 0


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps):
    xa = x_ref[:].astype(jnp.float32)
    mean = xa.mean(axis=-1, keepdims=True)
    m2 = (xa * xa).mean(axis=-1, keepdims=True)
    var = jnp.maximum(m2 - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = (xa - mean) * rstd * g_ref[:].astype(jnp.float32) + b_ref[:].astype(
        jnp.float32
    )
    y_ref[:] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref, *, eps):
    xa = x_ref[:].astype(jnp.float32)
    mean = xa.mean(axis=-1, keepdims=True)
    m2 = (xa * xa).mean(axis=-1, keepdims=True)
    var = jnp.maximum(m2 - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xa - mean) * rstd
    dya = dy_ref[:].astype(jnp.float32)
    w = dya * g_ref[:].astype(jnp.float32)
    c1 = w.mean(axis=-1, keepdims=True)
    c2 = (w * xhat).mean(axis=-1, keepdims=True)
    dx_ref[:] = ((w - c1 - xhat * c2) * rstd).astype(dx_ref.dtype)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dg_ref[:] = jnp.zeros_like(dg_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dg_ref[:] = dg_ref[:] + (dya * xhat).sum(axis=0, keepdims=True)
    db_ref[:] = db_ref[:] + dya.sum(axis=0, keepdims=True)


def _fwd_impl(x, g, b, eps, interpret):
    R, D = x.shape
    rows = _pick_rows(R)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(R // rows,),
        in_specs=[
            pl.BlockSpec((rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, D), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * R * D, bytes_accessed=2 * R * D * x.dtype.itemsize,
            transcendentals=R,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(x, g, b)


def _bwd_impl(x, g, dy, eps, interpret):
    R, D = x.shape
    rows = _pick_rows(R)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(R // rows,),
        in_specs=[
            pl.BlockSpec((rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, D), x.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=14 * R * D, bytes_accessed=3 * R * D * x.dtype.itemsize,
            transcendentals=R,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(x, g, dy)


# --- SPMD partitioning: row dim (flattened batch*seq) is the only
# partitionable factor; dgamma/dbeta partials are psum'd over it. ---

_fwd_cp = None
_bwd_cp = None


def _row_spec(arg_shapes):
    from jax.sharding import PartitionSpec as P

    spec = arg_shapes[0].sharding.spec
    r = spec[0] if len(spec) else None
    return r, P


def _fwd_infer(eps, interpret, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding

    r, P = _row_spec(arg_shapes)
    return NamedSharding(mesh, P(r, None))


def _fwd_partition(eps, interpret, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding

    r, P = _row_spec(arg_shapes)
    rep = NamedSharding(mesh, P(None, None))
    arg_shardings = (NamedSharding(mesh, P(r, None)), rep, rep)
    result_sharding = NamedSharding(mesh, P(r, None))

    def lower_fn(x, g, b):
        return _fwd_impl(x, g, b, eps, interpret)

    return mesh, lower_fn, result_sharding, arg_shardings


def _bwd_infer(eps, interpret, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding

    r, P = _row_spec(arg_shapes)
    rep = NamedSharding(mesh, P(None, None))
    return (NamedSharding(mesh, P(r, None)), rep, rep)


def _bwd_partition(eps, interpret, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding

    r, P = _row_spec(arg_shapes)
    rep = NamedSharding(mesh, P(None, None))
    arg_shardings = (NamedSharding(mesh, P(r, None)), rep,
                     NamedSharding(mesh, P(r, None)))
    result_sharding = (NamedSharding(mesh, P(r, None)), rep, rep)

    def lower_fn(x, g, dy):
        dx, dg, db = _bwd_impl(x, g, dy, eps, interpret)
        if r is not None:
            dg = jax.lax.psum(dg, r)
            db = jax.lax.psum(db, r)
        return dx, dg, db

    return mesh, lower_fn, result_sharding, arg_shardings


def _make(fn, infer, partition, rule, n_args):
    from jax.experimental.custom_partitioning import custom_partitioning

    cp = custom_partitioning(fn, static_argnums=(n_args, n_args + 1))
    cp.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        need_replication_factors=tuple(dict.fromkeys(
            f for f in rule.replace(",", " ").replace("->", " ").split()
            if f != "R"
        )),
    )
    return cp


def _get_fwd_cp():
    global _fwd_cp
    if _fwd_cp is None:
        _fwd_cp = _make(
            lambda x, g, b, eps, interpret: _fwd_impl(x, g, b, eps, interpret),
            _fwd_infer, _fwd_partition, "R d, c1 c2, c3 c4 -> R e", 3,
        )
    return _fwd_cp


def _get_bwd_cp():
    global _bwd_cp
    if _bwd_cp is None:
        _bwd_cp = _make(
            lambda x, g, dy, eps, interpret: _bwd_impl(x, g, dy, eps,
                                                       interpret),
            _bwd_infer, _bwd_partition,
            "R d, c1 c2, R e -> R f, p1 p2, p3 p4", 3,
        )
    return _bwd_cp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layer_norm(x, gamma, beta, eps: float = 1e-5,
                     interpret: bool = False):
    """LayerNorm over the last dim of ``x (R, D)``; gamma/beta are (1, D).

    Exact one-pass fp32 statistics (the model's `ln_impl='onepass'` math);
    returns y in x.dtype. The VJP reproduces dx/dgamma/dbeta in one kernel
    pass with in-kernel parameter-grad accumulation.
    """
    return _get_fwd_cp()(x, gamma, beta, eps, interpret)


def _ln_fwd(x, gamma, beta, eps, interpret):
    y = _get_fwd_cp()(x, gamma, beta, eps, interpret)
    return y, (x, gamma)


def _ln_bwd(eps, interpret, res, dy):
    x, gamma = res
    dx, dg, db = _get_bwd_cp()(x, gamma, dy, eps, interpret)
    return dx, dg, db


fused_layer_norm.defvjp(_ln_fwd, _ln_bwd)
