"""Fused LayerNorm -> Dense (pre-LN projection) as a Pallas TPU kernel.

Motivation (round-2 profile, docs/experiments.md): the ``convert_reduce``
fusion family — the fp32 LayerNorm statistics reductions feeding every
block's qkv / mlp-fc projection — costs ~9 ms/step on the parity config
because XLA materializes the normalized activation between the LN and the
GEMM and walks the activation several times (stats pass, normalize pass,
and the backward's three reduction terms). This kernel computes

    y = LN(x) @ W + b        with  LN(x) = x_hat * gamma + beta

reading ``x`` from HBM exactly once per direction:

- **forward**: grid over row tiles; the weight stays VMEM-resident (the
  (768, 3072) fc weight is 4.7 MB bf16). Stats are computed in fp32 in VMEM,
  the normalized tile feeds the MXU dot directly, and ``x_hat`` is emitted as
  a by-product (it is exactly the residual the backward weight-gradient GEMM
  needs — same bytes XLA would have saved for the LN output).
- **backward**: the scale/bias/weight grads are cheap XLA epilogues over the
  saved ``x_hat`` (the fused-qkv analysis: with ``W' = gamma ⊙ W`` the GEMM
  consumes ``x_hat`` directly, so dW' is one ordinary bf16 GEMM); only the
  data gradient — cotangent-through-the-normalization — needs the second
  Pallas kernel, which recomputes the row stats from ``x`` and applies the
  standard LN backward identity without materializing ``g @ W'^T`` in HBM.

All dots run in the compute dtype (bf16) with fp32 accumulation
(``preferred_element_type``) — the per-layer fused-MLP experiment lost
because its backward fell to fp32 GEMMs (1/8 MXU rate); this kernel never
does that.

Ref analogue: src/open_clip/transformer.py:238-301 (ResidualAttentionBlock
ln_1->attn.in_proj / ln_2->mlp.c_fc); this is the TPU-native fusion of those
pairs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-tile size: 256 rows x K<=1024 keeps the working set (x tile, x_hat
# tile, fp32 dot accumulator, resident weight) inside 16 MB VMEM with double
# buffering for every production shape (K in {512, 768}, N in {1536..3072}).
BLOCK_M = 256


def _fwd_kernel(x_ref, w_ref, b_ref, y_ref, xhat_ref, *, eps):
    xa = x_ref[:].astype(jnp.float32)
    mean = xa.mean(axis=1, keepdims=True)
    xc = xa - mean
    var = (xc * xc).mean(axis=1, keepdims=True)
    xhat = xc * jax.lax.rsqrt(var + eps)
    xh = xhat.astype(x_ref.dtype)
    xhat_ref[:] = xh
    acc = jax.lax.dot_general(
        xh, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y_ref[:] = (acc + b_ref[:].astype(jnp.float32)).astype(y_ref.dtype)


def _bwd_dx_kernel(x_ref, g_ref, w_ref, dx_ref, *, eps):
    """dx for y = normalize(x) @ W' (+const): recompute row stats, pull the
    cotangent back through W' and the normalization in one VMEM pass."""
    xa = x_ref[:].astype(jnp.float32)
    mean = xa.mean(axis=1, keepdims=True)
    xc = xa - mean
    var = (xc * xc).mean(axis=1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    xhat = xc * r
    # u = g @ W'^T : cotangent of x_hat (bf16 MXU dot, fp32 accumulate)
    u = jax.lax.dot_general(
        g_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx = r * (
        u
        - u.mean(axis=1, keepdims=True)
        - xhat * (u * xhat).mean(axis=1, keepdims=True)
    )
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _pad_rows(x, bm):
    pad = (-x.shape[0]) % bm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


def _fwd_pallas(x, w1, b1, eps, interpret):
    R, K = x.shape
    N = w1.shape[1]
    xp = _pad_rows(x, BLOCK_M)
    Rp = xp.shape[0]
    y, xhat = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(Rp // BLOCK_M,),
        in_specs=[
            pl.BlockSpec((BLOCK_M, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_M, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_M, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rp, N), x.dtype),
            jax.ShapeDtypeStruct((Rp, K), x.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * K * N,
            bytes_accessed=(2 * Rp * K + Rp * N + K * N) * x.dtype.itemsize,
            transcendentals=Rp,
        ),
    )(xp, w1, b1.reshape(1, -1))
    return y[:R], xhat[:R]


def _bwd_dx_pallas(x, g, w1, eps, interpret):
    R, K = x.shape
    N = w1.shape[1]
    xp = _pad_rows(x, BLOCK_M)
    gp = _pad_rows(g, BLOCK_M)
    Rp = xp.shape[0]
    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, eps=eps),
        grid=(Rp // BLOCK_M,),
        in_specs=[
            pl.BlockSpec((BLOCK_M, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_M, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_M, K), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Rp, K), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * K * N,
            bytes_accessed=(2 * Rp * K + Rp * N + K * N) * x.dtype.itemsize,
            transcendentals=Rp,
        ),
    )(xp, gp, w1)
    return dx[:R]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_ln_dense(x, gamma, beta, kernel, bias, eps: float = 1e-5,
                   interpret: bool = False):
    """``(LN(x; gamma, beta) @ kernel + bias)`` in one HBM pass over ``x``.

    x: (R, K) compute-dtype activations; gamma/beta/kernel/bias: fp32 params
    with the standard LayerNorm/Dense tree layout (checkpoints unaffected).
    Returns (R, N) in x.dtype. Stats are fp32 (LayerNorm parity).
    """
    y, _ = _fwd(x, gamma, beta, kernel, bias, eps, interpret)
    return y


def _fold(gamma, beta, kernel, bias, dtype):
    """Fold the LN affine into the projection: LN(x)@W+b =
    x_hat @ (gamma⊙W) + (beta@W + b)."""
    gamma = jnp.asarray(gamma)
    beta = jnp.asarray(beta)
    kernel = jnp.asarray(kernel)
    w1 = (gamma[:, None] * kernel).astype(dtype)
    b1 = (jnp.dot(beta, kernel) + bias).astype(jnp.float32)
    return w1, b1


def _fwd(x, gamma, beta, kernel, bias, eps, interpret):
    w1, b1 = _fold(gamma, beta, kernel, bias, x.dtype)
    return _fwd_pallas(x, w1, b1, eps, interpret)


def _vjp_fwd(x, gamma, beta, kernel, bias, eps, interpret):
    w1, b1 = _fold(gamma, beta, kernel, bias, x.dtype)
    y, xhat = _fwd_pallas(x, w1, b1, eps, interpret)
    return y, (x, xhat, gamma, beta, kernel, w1)


def _vjp_bwd(eps, interpret, res, g):
    x, xhat, gamma, beta, kernel, w1 = res
    gf = g.astype(x.dtype)
    # dW' = x_hat^T g — one ordinary bf16 GEMM (the same GEMM XLA's autodiff
    # of Dense would run against the saved LN output)
    dw1 = jax.lax.dot_general(
        xhat, gf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db = g.astype(jnp.float32).sum(axis=0)
    # y = x_hat @ (gamma⊙W) + beta@W + b  =>
    dkernel = gamma[:, None] * dw1 + beta[:, None] * db[None, :]
    dgamma = (dw1 * kernel).sum(axis=1)
    dbeta = kernel @ db
    dx = _bwd_dx_pallas(x, gf, w1, eps, interpret)
    return dx, dgamma, dbeta, dkernel, db


fused_ln_dense.defvjp(_vjp_fwd, _vjp_bwd)


def reference_ln_dense(x, gamma, beta, kernel, bias, eps: float = 1e-5):
    """Plain-XLA reference (fp32 stats, compute-dtype GEMM) for parity tests."""
    xa = x.astype(jnp.float32)
    mean = xa.mean(axis=-1, keepdims=True)
    var = jnp.square(xa - mean).mean(axis=-1, keepdims=True)
    y = (xa - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    y = y.astype(x.dtype)
    return y @ kernel.astype(x.dtype) + bias.astype(x.dtype)
