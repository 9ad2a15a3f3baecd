#!/usr/bin/env python
"""Micro A/B: bf16 GEMM vs int8 MXU GEMM at the ViT-B MLP shapes.

Chains CHAIN dependent matmuls inside ONE jit (single ops have a ~1 ms
dispatch floor through the tunnel — CLAUDE.md), value-fetch sync. Arms:
  bf16      — x@w in bf16 (the current training forward)
  int8_pre  — pre-quantized int8 x int8 dot + rescale (upper bound)
  int8_dyn  — dynamic per-row/per-channel quantize + dot (the training path)
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np

M = int(sys.argv[1]) if len(sys.argv) > 1 else 12800
K, N = 768, 3072
CHAIN = 24
ROUNDS = 8


def main():
    import jax
    import jax.numpy as jnp

    from spatial_clip_tpu.ops.int8_train import _int8_product, _quantize_cols

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 0.05, (K, N)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.05, (N, K)), jnp.float32)

    @jax.jit
    def bf16(x, w1, w2):
        a, b = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)
        for _ in range(CHAIN):
            x = ((x @ a) @ b).astype(jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    w1q, w1s = _quantize_cols(w1)
    w2q, w2s = _quantize_cols(w2)

    @jax.jit
    def int8_pre(x, w1q, w1s, w2q, w2s):
        def dot(x, wq, ws):
            xs = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                         keepdims=True) / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127,
                          127).astype(jnp.int8)
            acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * xs * ws).astype(jnp.bfloat16)

        for _ in range(CHAIN):
            x = dot(dot(x, w1q, w1s), w2q, w2s)
        return jnp.sum(x.astype(jnp.float32))

    @jax.jit
    def int8_dyn(x, w1, w2):
        for _ in range(CHAIN):
            x = _int8_product(
                _int8_product(x, w1, jnp.bfloat16), w2, jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    arms = {
        "bf16": partial(bf16, x0, w1, w2),
        "int8_pre": partial(int8_pre, x0, w1q, w1s, w2q, w2s),
        "int8_dyn": partial(int8_dyn, x0, w1, w2),
    }
    for name, f in arms.items():
        float(np.asarray(f()))  # compile
    out = {}
    times = {n: [] for n in arms}
    for r in range(ROUNDS):
        for name, f in arms.items():
            t0 = time.perf_counter()
            for _ in range(4):
                v = f()
            float(np.asarray(v))
            times[name].append((time.perf_counter() - t0) / (4 * CHAIN * 2))
    flops = 2.0 * M * K * N
    for name in arms:
        per_gemm = float(np.median(times[name]))
        out[name] = {"us_per_gemm": round(1e6 * per_gemm, 1),
                     "tflops": round(flops / per_gemm / 1e12, 1)}
    print(json.dumps({"M": M, "K": K, "N": N, **out}))


if __name__ == "__main__":
    main()
