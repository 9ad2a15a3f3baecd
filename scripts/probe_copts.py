#!/usr/bin/env python
"""Probe which per-jit XLA compiler options the TPU runtime accepts.

Compiles a trivial jit with each candidate flag and reports ok/error.
Cheap (tiny executable) — run before queueing a long flag A/B so unknown
flag names don't kill the session mid-way.

    python scripts/probe_copts.py xla_tpu_foo=true xla_tpu_bar=1
    python scripts/probe_copts.py --defaults   # built-in candidate list
"""
from __future__ import annotations

import argparse
import sys

CANDIDATES = [
    # fusion cost models / vmem policy (bundle measured -0.5 ms r3)
    "xla_tpu_use_bundle_aware_cost_model_for_fusions=true",
    "xla_tpu_scavenge_vmem_for_fusions=true",
    "xla_tpu_reduce_loop_fusion_dup_with_unfusable_user=true",
    "xla_tpu_scoped_vmem_limit_kib=32768",
    # copy/layout related
    "xla_tpu_copy_with_multiple_strides=true",
    "xla_tpu_enable_aggressive_broadcast_priority_update=true",
    "xla_tpu_layout_use_alias_scope=true",
    # scheduling
    "xla_tpu_enable_dot_strength_reduction=false",
    "xla_tpu_licm_size_inflation_ratio=2",
    "xla_tpu_order_dot_after_layout=true",
    # misc perf knobs seen in public JAX/XLA issues
    "xla_tpu_dot_dot_fusion=true",
    "xla_tpu_dot_dot_fusion_duplicated=true",
    "xla_tpu_enable_multi_level_nested_loop_fusion=true",
    "xla_tpu_nd_short_transfer_max_chunks=4096",
    "xla_tpu_use_repeated_instance_for_preferred_prefetch_time=true",
    "xla_tpu_vector_load_fusion_window=2048",
    "xla_tpu_vector_store_fusion_window=512",
    "xla_tpu_assume_all_gathers_are_deterministic=true",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("flags", nargs="*")
    ap.add_argument("--defaults", action="store_true")
    args = ap.parse_args()
    flags = list(args.flags)
    if args.defaults or not flags:
        flags += CANDIDATES

    import jax
    import jax.numpy as jnp

    x = jnp.arange(8.0)
    for spec in flags:
        k, v = spec.split("=", 1)
        try:
            f = jax.jit(lambda a: a * 2 + 1, compiler_options={k: v})
            f(x).block_until_ready()
            print(f"OK    {spec}")
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:120]
            print(f"FAIL  {spec}  -> {msg}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
