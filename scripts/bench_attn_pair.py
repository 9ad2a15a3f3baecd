#!/usr/bin/env python
"""Microbench: paired dual-tower attention kernel vs two single calls.

Chains DEPTH=12 dependent invocations inside one jit (per CLAUDE.md: single
ops have a ~1 ms dispatch floor through the tunnel; chained calls amortize
it), fwd-only and fwd+bwd, interleaved A/B over rounds.

    python scripts/bench_attn_pair.py --batch 256 --rounds 6
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default="reports/ab_pair_kernel_r3.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from spatial_clip_tpu.ops import fused_attention as fa

    B, D_ = args.batch, args.depth
    La, Da, Ha = 50, 768, 12
    Lb, Db, Hb = 77, 512, 8
    rng = np.random.default_rng(0)
    qa0 = jnp.asarray(rng.standard_normal((B, La, 3 * Da)) * 0.05, jnp.bfloat16)
    qb0 = jnp.asarray(rng.standard_normal((B, Lb, 3 * Db)) * 0.05, jnp.bfloat16)
    mb = jnp.triu(jnp.full((Lb, Lb), -1e30), 1).astype(jnp.float32)

    def _chain_dep(q, o):
        # cheap data dependency: fold one row of the context back into the
        # qkv buffer (in-place DUS) so the calls serialize without adding
        # HBM-bound elementwise traffic that would swamp the signal
        upd = q[:, :1, :] + jnp.tile(o[:, :1, :], (1, 1, 3)) * 0.01
        return jax.lax.dynamic_update_slice(q, upd.astype(q.dtype), (0, 0, 0))

    def chain_single(qa, qb):
        for _ in range(D_):
            oa = fa.fused_attention(qa, None, Ha)
            ob = fa.fused_attention(qb, mb, Hb)
            qa = _chain_dep(qa, oa)
            qb = _chain_dep(qb, ob)
        return qa, qb

    def chain_pair(qa, qb):
        for _ in range(D_):
            oa, ob = fa.fused_attention_pair(qa, None, qb, mb, Ha, Hb)
            qa = _chain_dep(qa, oa)
            qb = _chain_dep(qb, ob)
        return qa, qb

    def mk_loss(chain):
        def loss(qa, qb):
            ra, rb = chain(qa, qb)
            return (ra.astype(jnp.float32) ** 2).mean() + (
                rb.astype(jnp.float32) ** 2).mean()
        return loss

    arms = {
        "single_fwd": jax.jit(chain_single),
        "pair_fwd": jax.jit(chain_pair),
        "single_grad": jax.jit(jax.grad(mk_loss(chain_single), argnums=(0, 1))),
        "pair_grad": jax.jit(jax.grad(mk_loss(chain_pair), argnums=(0, 1))),
    }
    # numerical parity check on chip first
    ra = np.asarray(arms["single_fwd"](qa0, qb0)[0], dtype=np.float32)
    rp = np.asarray(arms["pair_fwd"](qa0, qb0)[0], dtype=np.float32)
    print("fwd max|diff| on chip:", float(np.abs(ra - rp).max()), flush=True)
    ga = np.asarray(arms["single_grad"](qa0, qb0)[0], dtype=np.float32)
    gp = np.asarray(arms["pair_grad"](qa0, qb0)[0], dtype=np.float32)
    print("grad max|diff| on chip:", float(np.abs(ga - gp).max()), flush=True)

    times = {k: [] for k in arms}
    for r in range(args.rounds):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(qa0, qb0)
            leaf = out[0] if isinstance(out, tuple) else out
            float(np.asarray(leaf, dtype=np.float32).reshape(-1)[0])
            dt = (time.perf_counter() - t0) / args.iters
            times[name].append(dt)
            print(f"round {r} {name}: {1e3 * dt:.3f} ms/chain", flush=True)

    result = {}
    for name, ts in times.items():
        ms = 1e3 * float(np.median(ts))
        result[name] = {"ms_per_chain_median": round(ms, 3),
                        "ms_all": [round(1e3 * t, 3) for t in ts]}
    print(json.dumps(result, indent=2))
    Path(args.out).write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
