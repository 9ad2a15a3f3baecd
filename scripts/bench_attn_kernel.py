#!/usr/bin/env python
"""Standalone on-chip microbenchmark of the fused attention kernel.

Times fwd and fwd+bwd for the two tower shapes (ViT-B-32 vision seq 50 and
CLIP text seq 77) across block-size variants, against the XLA einsum
reference. Compiles in seconds (no full model), so kernel tuning iterates
fast.

    python scripts/bench_attn_kernel.py --fwd-cap 32 --bwd-cap 16
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np  # noqa: E402


def bench(fn, args, iters=50):
    import jax

    out = fn(*args)  # compile+warm
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf.reshape(-1)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf.reshape(-1)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fwd-cap", type=int, default=None)
    ap.add_argument("--bwd-cap", type=int, default=None)
    ap.add_argument("--group-lanes", type=int, default=None)
    ap.add_argument("--pack", action="store_true")
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from spatial_clip_tpu.ops import fused_attention as fa

    if args.fwd_cap:
        fa.FWD_BLOCK_CAP = args.fwd_cap
    if args.bwd_cap:
        fa.BWD_BLOCK_CAP = args.bwd_cap
    if args.group_lanes:
        fa.GROUP_LANES = args.group_lanes
    if args.pack:
        fa.PACK_PAIRS = True

    rng = np.random.default_rng(0)
    results = {}
    for tag, (L, D, H, causal) in {
        "vision(B,50,768,12h)": (50, 768, 12, False),
        "text(B,77,512,8h)": (77, 512, 8, True),
    }.items():
        B = args.batch
        qkv = jnp.asarray(
            rng.normal(size=(B, L, 3 * D)).astype(np.float32)
        ).astype(jnp.bfloat16)
        mask = (
            jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
            if causal else None
        )

        LAYERS = 24  # chain to amortize the tunnel's ~1ms dispatch floor

        def chain(attn):
            def f(q):
                x = q
                for _ in range(LAYERS):
                    out = attn(x)
                    # scalar serial dependency, negligible cost
                    x = x + (out.astype(jnp.float32).mean() * 1e-6).astype(x.dtype)
                return out
            return f

        fused = chain(lambda q: fa.fused_attention(q, mask, H, False))
        ref = chain(lambda q: fa.reference_attention(q, mask, H))

        def per_layer(f):
            return bench(jax.jit(f), (qkv,), args.iters) / LAYERS

        def gradf(f):
            return jax.grad(lambda q: (f(q).astype(jnp.float32) ** 2).sum())

        r = {
            "fused_fwd_ms": round(per_layer(fused), 3),
            "fused_fwdbwd_ms": round(per_layer(gradf(fused)), 3),
        }
        if not args.skip_ref:
            r["ref_fwd_ms"] = round(per_layer(ref), 3)
            r["ref_fwdbwd_ms"] = round(per_layer(gradf(ref)), 3)
        results[tag] = r
        print(tag, json.dumps(r), flush=True)
    print(json.dumps({"fwd_cap": fa.FWD_BLOCK_CAP, "bwd_cap": fa.BWD_BLOCK_CAP, "group_lanes": fa.GROUP_LANES,
                      "results": results}))


if __name__ == "__main__":
    main()
