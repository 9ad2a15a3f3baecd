"""Fused transformer MLP (fc -> gelu -> proj) as a Pallas TPU kernel.

Motivation: the step profile (docs/experiments.md) shows ~15% of device time
in inter-op layout copies, ~5 per transformer block. This kernel computes the
block MLP in one pass — the (BM, hidden) activation lives only in VMEM, the
weights stream in hidden-blocks, and no intermediate ever round-trips HBM:

    out = gelu(x @ fc_w + fc_b) @ proj_w + proj_b        (residual added by caller)

Forward is Pallas (grid rows x hidden-blocks with an output accumulator);
backward recomputes the hidden activation in plain XLA (cheap, keeps the VJP
simple and exact). Experimental: enabled per-model via ``mlp_impl='pallas'``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu(x):
    return jax.nn.gelu(x, approximate=True)


def _fwd_kernel(x_ref, fcw_ref, fcb_ref, pjw_ref, pjb_ref, out_ref, acc_scr):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    h = jax.lax.dot_general(
        x_ref[:], fcw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + fcb_ref[:].astype(jnp.float32)
    h = _gelu(h).astype(x_ref.dtype)
    acc_scr[:] += jax.lax.dot_general(
        h, pjw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_j - 1)
    def _emit():
        out_ref[:] = (acc_scr[:] + pjb_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def _pad_rows(x, bm):
    pad = (-x.shape[0]) % bm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_mlp(x, fc_w, fc_b, proj_w, proj_b, block_m=256, block_h=512, interpret=False):
    """x: (R, W); fc_w: (W, H); proj_w: (H, W). Returns (R, W) (no residual)."""
    return _fwd(x, fc_w, fc_b, proj_w, proj_b, block_m, block_h, interpret)


def _fwd(x, fc_w, fc_b, proj_w, proj_b, block_m, block_h, interpret):
    R, W = x.shape
    H = fc_w.shape[1]
    assert H % block_h == 0, f"hidden {H} must divide block_h {block_h}"
    xp = _pad_rows(x, block_m)
    Rp = xp.shape[0]
    grid = (Rp // block_m, H // block_h)
    dtype = x.dtype
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, W), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, block_h), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, W), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, W), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, W), dtype),
        scratch_shapes=[pltpu.VMEM((block_m, W), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * Rp * W * H, bytes_accessed=2 * (Rp * W + W * H) * 2,
            transcendentals=Rp * H,
        ),
    )(xp, fc_w.astype(dtype), fc_b.reshape(1, -1).astype(dtype),
      proj_w.astype(dtype), proj_b.reshape(1, -1).astype(dtype))
    return out[:R]


def _fused_fwd(x, fc_w, fc_b, proj_w, proj_b, block_m, block_h, interpret):
    out = _fwd(x, fc_w, fc_b, proj_w, proj_b, block_m, block_h, interpret)
    return out, (x, fc_w, fc_b, proj_w, proj_b)


def _fused_bwd(block_m, block_h, interpret, res, g):
    x, fc_w, fc_b, proj_w, proj_b = res
    # recompute hidden pre-activation in XLA (one extra GEMM)
    x32 = x.astype(jnp.float32)
    pre = x32 @ fc_w.astype(jnp.float32) + fc_b.astype(jnp.float32)
    h = _gelu(pre)
    g32 = g.astype(jnp.float32)
    dproj_w = h.T @ g32
    dproj_b = g32.sum(axis=0)
    dh = g32 @ proj_w.astype(jnp.float32).T
    # gelu'(pre) via jvp of the same approximate gelu
    dpre = jax.vjp(_gelu, pre)[1](dh)[0]
    dfc_w = x32.T @ dpre
    dfc_b = dpre.sum(axis=0)
    dx = (dpre @ fc_w.astype(jnp.float32).T).astype(x.dtype)
    return (
        dx,
        dfc_w.astype(fc_w.dtype),
        dfc_b.astype(fc_b.dtype),
        dproj_w.astype(proj_w.dtype),
        dproj_b.astype(proj_b.dtype),
    )


fused_mlp.defvjp(_fused_fwd, _fused_bwd)


def reference_mlp(x, fc_w, fc_b, proj_w, proj_b):
    """Plain-XLA reference for tests."""
    h = _gelu(x.astype(jnp.float32) @ fc_w.astype(jnp.float32) + fc_b)
    return (h @ proj_w.astype(jnp.float32) + proj_b).astype(x.dtype)
