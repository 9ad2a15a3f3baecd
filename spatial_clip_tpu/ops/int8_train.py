"""int8-forward training GEMMs (AQT-style) for the MXU's 2x int8 rate.

The reference's int8 story is inference-only (bitsandbytes ``replace_linear``,
ref: src/open_clip/utils.py:67-92); training GEMMs stay bf16/amp everywhere
(ref: open_clip_train/train.py:244-259 measures that path). On TPU v5e the
MXU executes int8 x int8 -> int32 at ~2x the bf16 FLOP rate, so quantizing
the *forward* projections is a straight step-time lever the reference never
had. This module provides the training-safe formulation:

- forward: dynamic symmetric quantization — per-row activation scales
  (absmax/127 over the contraction axis), per-output-channel weight scales —
  then one int8 ``dot_general`` accumulating in int32, rescaled to the
  compute dtype. Exactly the serving math in models/quantize.int8_dot, but
  differentiable.
- backward: straight-through estimator — gradients flow as if the forward
  had been the exact bf16 product (dx = g W^T, dW = x^T g, both bf16 inputs
  with fp32 accumulation, dW cast to the fp32 param dtype). This is the
  standard AQT/LLM-int8 training recipe: quantization noise is treated as
  zero-mean forward noise, not differentiated through.

Quality is gated the same way as every numerics knob in this repo (2-seed
synthetic training A/B: loss overlay + retrieval delta; see
reports/ab_int8_quality.json) before any default flips.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Contraction/output dims must tile the MXU's int8 path; odd dims fall back
# to the dense bf16 product (callers gate on this too).
_MIN_DIM = 128

# Flatten inputs to 2-D around the quantized dot (measured-negative A/B knob;
# see int8_matmul docstring).
INT8_2D = False


def supported(K: int, N: int) -> bool:
    return K % _MIN_DIM == 0 and N % _MIN_DIM == 0


def _quantize_rows(x: jnp.ndarray):
    """Per-row symmetric int8: x (..., K) -> (q int8, scale (..., 1) f32)."""
    xa = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xa), axis=-1, keepdims=True) * (1.0 / 127.0)
    s = jnp.where(s == 0, 1.0, s)
    q = jnp.clip(jnp.round(xa / s), -127, 127).astype(jnp.int8)
    return q, s


def _quantize_cols(w: jnp.ndarray):
    """Per-output-channel symmetric int8: w (K, N) -> (q int8, scale (1,N))."""
    wa = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wa), axis=0, keepdims=True) * (1.0 / 127.0)
    s = jnp.where(s == 0, 1.0, s)
    q = jnp.clip(jnp.round(wa / s), -127, 127).astype(jnp.int8)
    return q, s


def _int8_product(x: jnp.ndarray, kernel: jnp.ndarray, dtype) -> jnp.ndarray:
    x_q, x_s = _quantize_rows(x)
    w_q, w_s = _quantize_cols(kernel)
    acc = jax.lax.dot_general(
        x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * x_s * w_s).astype(dtype)


@jax.custom_vjp
def _int8_matmul_core(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    return _int8_product(x, kernel, x.dtype)


def _fwd(x, kernel):
    return _int8_product(x, kernel, x.dtype), (x, kernel)


def _bwd(res, g):
    x, kernel = res
    # Straight-through: exact-product gradients in the compute dtype with
    # fp32 accumulation (identical to what AD emits for the bf16 dense path).
    kc = kernel.astype(x.dtype)
    dx = jax.lax.dot_general(
        g, kc, (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    x2 = x.reshape(-1, x.shape[-1])
    g2 = g.reshape(-1, g.shape[-1]).astype(x.dtype)
    dk = jax.lax.dot_general(
        x2, g2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(kernel.dtype)
    return dx, dk


_int8_matmul_core.defvjp(_fwd, _bwd)


def int8_matmul(x: jnp.ndarray, kernel: jnp.ndarray, dtype) -> jnp.ndarray:
    """``x @ kernel`` with an int8 MXU forward and a bf16 STE backward.

    x: (..., K) activations (any float dtype); kernel: (K, N) fp32 param.
    Returns (..., N) in ``dtype``. Falls back to the exact bf16 product for
    geometries the int8 path doesn't tile (K or N not %128).

    Measured negative BOTH ways at model level (reports/ab_int8_r5.json
    +22 ms 3-D, ab_int8b_r5.json +50 ms 2-D-flattened vs the 96 ms bf16
    baseline, parity config): the 2-D flatten repeats the DENSE_2D relayout
    lesson, so the 3-D form ships; see docs/roofline.md "int8 training" for
    the device-time attribution.
    """
    K, N = kernel.shape
    if not supported(K, N):
        return (x.astype(dtype) @ kernel.astype(dtype)).astype(dtype)
    if INT8_2D:
        lead = x.shape[:-1]
        x2 = x.astype(dtype).reshape(-1, K)
        return _int8_matmul_core(x2, kernel).astype(dtype).reshape(lead + (N,))
    return _int8_matmul_core(x.astype(dtype), kernel).astype(dtype)
