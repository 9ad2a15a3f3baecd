"""Block-fusion A/B (round-4 verdict item #1a): is one Pallas call per
transformer block (LN1+qkvGEMM+attention+outproj, ops/fused_block.py)
faster than the shipped boundary (XLA LN/GEMMs + Pallas attention kernel)?

Chains 12 layers of each arm inside one jit (amortizes the ~1 ms dispatch
floor), interleaves arms across rounds to average pool noise, syncs with a
device->host value fetch. Writes reports/ab_block_r4.json.

Usage: python scripts/bench_block_kernel.py [--rounds 6] [--tower image|text|both]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--reps", type=int, default=8, help="chained 12-layer stacks per timed call")
    ap.add_argument("--tower", default="both", choices=["image", "text", "both"])
    ap.add_argument("--out", default="reports/ab_block_r4.json")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import os

    import jax
    if os.environ.get("JAX_PLATFORMS"):
        # sitecustomize pre-imports jax with the axon backend registered;
        # the env var alone is not honored after that (CLAUDE.md)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from spatial_clip_tpu.ops import fused_attention as fa
    from spatial_clip_tpu.ops.fused_block import fused_block_attn

    interp = jax.default_backend() != "tpu"
    towers = {
        "image": dict(L=50, D=768, heads=12, causal=False),
        "text": dict(L=77, D=512, heads=8, causal=True),
    }
    sel = ["image", "text"] if args.tower == "both" else [args.tower]
    results = {}

    for name in sel:
        t = towers[name]
        B, L, D, heads = args.batch, t["L"], t["D"], t["heads"]
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(0, 1, (B, L, D)), jnp.bfloat16)
        n_layers = 12
        params = []
        for i in range(n_layers):
            r = np.random.default_rng(i + 1)
            params.append(dict(
                lng=jnp.asarray(r.normal(1, 0.05, (D,)), jnp.float32),
                lnb=jnp.asarray(r.normal(0, 0.05, (D,)), jnp.float32),
                wqkv=jnp.asarray(r.normal(0, D ** -0.5, (D, 3 * D)), jnp.bfloat16),
                bqkv=jnp.asarray(r.normal(0, 0.02, (3 * D,)), jnp.float32),
                wout=jnp.asarray(r.normal(0, D ** -0.5, (D, D)), jnp.bfloat16),
                bout=jnp.asarray(r.normal(0, 0.02, (D,)), jnp.float32),
            ))
        mask = None
        if t["causal"]:
            mask = jnp.triu(jnp.full((L, L), -1e9, jnp.float32), 1)

        def shipped_layer(x, p):
            # shipped stack: one-pass fp32 LN -> XLA qkv GEMM -> Pallas
            # group attention -> XLA out GEMM -> residual
            xf = x.astype(jnp.float32)
            mean = xf.mean(axis=-1, keepdims=True)
            m2 = (xf * xf).mean(axis=-1, keepdims=True)
            var = jnp.maximum(m2 - mean * mean, 0.0)
            h = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
            h = (h * p["lng"] + p["lnb"]).astype(x.dtype)
            qkv = (h.reshape(B * L, D) @ p["wqkv"]
                   + p["bqkv"].astype(jnp.float32)).astype(x.dtype)
            ctx = fa.fused_attention(
                qkv.reshape(B, L, 3 * D), mask, heads, interp)
            o = ctx.reshape(B * L, D) @ p["wout"] + p["bout"].astype(jnp.float32)
            return (xf + o.reshape(B, L, D)).astype(x.dtype)

        def fused_layer(x, p):
            return fused_block_attn(
                x, p["lng"], p["lnb"], p["wqkv"], p["bqkv"], p["wout"],
                p["bout"], mask, heads, interpret=interp)

        def make_arm(layer_fn):
            # scan over stacked layer params: ONE traced/compiled kernel
            # instance regardless of depth (an unrolled 12x4 chain produced
            # a 57 MB MLIR payload that OOM-killed the remote compiler)
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params)

            def run(x):
                def body(h, p):
                    return layer_fn(h, p), None

                def rep(_, h):
                    return jax.lax.scan(body, h, stacked)[0]

                return jax.lax.fori_loop(0, args.reps, rep, x)

            return jax.jit(run)

        arms = {"shipped": make_arm(shipped_layer), "block": make_arm(fused_layer)}

        # parity check first (bf16 tolerance over 12 layers is loose; the
        # residual stream grows, compare relative)
        ref1 = None
        for arm_name, fn in arms.items():
            y = np.asarray(jax.device_get(fn(x0)), np.float32)
            if ref1 is None:
                ref1 = y
            else:
                rel = np.abs(y - ref1).mean() / (np.abs(ref1).mean() + 1e-9)
                print(f"{name}: block-vs-shipped mean rel diff {rel:.2e}")
                if not np.isfinite(rel) or rel > 0.05:
                    raise SystemExit(f"parity failure: rel={rel}")

        times = {a: [] for a in arms}
        for rnd in range(args.rounds):
            for arm_name, fn in arms.items():
                t0 = time.perf_counter()
                y = fn(x0)
                float(np.asarray(y[0, 0, 0], np.float32))  # value-fetch sync
                dt = time.perf_counter() - t0
                per_layer_ms = 1000 * dt / (args.reps * n_layers)
                times[arm_name].append(per_layer_ms)
                print(f"[{name} r{rnd}] {arm_name}: {per_layer_ms:.3f} ms/layer")

        results[name] = {
            a: {
                "ms_per_layer_median": float(np.median(v[1:] if len(v) > 2 else v)),
                "all": [round(q, 4) for q in v],
            }
            for a, v in times.items()
        }

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
