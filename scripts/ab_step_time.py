#!/usr/bin/env python
"""Interleaved A/B step-time benchmark for train-step variants.

    python scripts/ab_step_time.py --arms einsum fold --batch 256 \
        --rounds 6 --chunk 10

Arms are attn_impl names (optionally `name@B` to override batch, or
`name#mlp` to set mlp_impl). All arms run in ONE process, interleaved in
rounds, with device->host value-fetch sync per chunk (the only reliable
barrier on the tunnel runtime — CLAUDE.md).

HBM budget: every arm keeps its params + Adam state resident, ~2 GB per
ViT-B arm — cap campaigns at SIX arms per process (7 arms OOMed the 16 GB
v5e chip; the 7th arm is skipped at build, then round 0 still dies when
activations land on top).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np  # noqa: E402


def build(arm: str, batch: int, model: str):
    import jax  # noqa: F401

    from spatial_clip_tpu import create_model
    from spatial_clip_tpu.losses import make_loss
    from spatial_clip_tpu.parallel.mesh import make_mesh
    from spatial_clip_tpu.train.loop import Trainer, TrainerConfig

    name = arm
    mlp = "dense"
    ln = "onepass"
    ln_gemm = "dense"
    master = False
    from spatial_clip_tpu.ops import fused_attention as fa

    # arms without explicit suffixes get the module defaults (reset between
    # builds so earlier arms' overrides don't leak)
    if not hasattr(build, "_cap_defaults"):
        build._cap_defaults = (fa.FWD_BLOCK_CAP, fa.BWD_BLOCK_CAP,
                               fa.GROUP_LANES, fa.FWD_LANES,
                               fa.VMEM_LIMIT_BYTES)
    (fa.FWD_BLOCK_CAP, fa.BWD_BLOCK_CAP, fa.GROUP_LANES, fa.FWD_LANES,
     fa.VMEM_LIMIT_BYTES) = build._cap_defaults

    # '^pack'/'^nopack' pin the packed head-pair variant per arm
    if "^pack" in name:
        name = name.replace("^pack", "")
        fa.PACK_PAIRS = True
    elif "^nopack" in name:
        name = name.replace("^nopack", "")
        fa.PACK_PAIRS = False
    # '^dx'/'^db'/'^nodx' pin the qkv_attention backward fusion mode per arm
    # (no suffix -> the shipped default, so a prior arm's pin never leaks)
    if "^nodx" in name:
        name = name.replace("^nodx", "")
        fa.BWD_FUSE = "none"
    elif "^dx" in name:
        name = name.replace("^dx", "")
        fa.BWD_FUSE = "dxdb"
    elif "^db" in name:
        name = name.replace("^db", "")
        fa.BWD_FUSE = "db"
    else:
        fa.BWD_FUSE = "db"
    # '^nozip'/'^zip' pin the zipped dual-tower attention path per arm
    # (models/clip.py encode_pair; config default is 'auto' = zip on TPU)
    zip_towers = None
    if "^nozip" in name:
        name = name.replace("^nozip", "")
        zip_towers = "off"
    elif "^zip" in name:
        name = name.replace("^zip", "")
        zip_towers = "auto"
    # '^mw' enables master-weights training (bf16 live kernels) per arm
    if "^mw" in name:
        name = name.replace("^mw", "")
        master = True
    # '^noaug' disables in-step augmentation (sizes that op family)
    augment = True
    if "^noaug" in name:
        name = name.replace("^noaug", "")
        augment = False
    # '^par' marks kernel grid dims parallel for Mosaic scheduling
    if "^par" in name:
        name = name.replace("^par", "")
        fa.PARALLEL_SEMANTICS = True
    else:
        fa.PARALLEL_SEMANTICS = False
    # '^light' selects reference-parity per-step metrics (loss/scale/lr)
    step_metrics = "full"
    if "^light" in name:
        name = name.replace("^light", "")
        step_metrics = "light"
    # '^nu' stores the Adam second moment in bf16 (scale_by_adam_nd)
    nu = None
    if "^nu" in name:
        name = name.replace("^nu", "")
        nu = "bf16"
    # '^gbf' materializes gradients in bf16 (TrainerConfig.grad_dtype)
    gdt = None
    if "^gbf" in name:
        name = name.replace("^gbf", "")
        gdt = "bf16"
    # '^scanN' runs N real optimizer steps per dispatched program
    # (TrainerConfig.scan_steps; batch gets a leading (N,) dim)
    scan_steps = 1
    m = __import__("re").search(r"\^scan(\d+)", name)
    if m:
        scan_steps = int(m.group(1))
        name = name.replace(m.group(0), "")
    # '^i8' pins int8-forward training GEMMs (ops/int8_train) per arm;
    # '^i82d' additionally flattens the quantized dots to 2-D (both
    # measured negative — reports/ab_int8_r5.json, ab_int8b_r5.json)
    import spatial_clip_tpu.models.transformer as _tf
    import spatial_clip_tpu.ops.int8_train as _i8

    if "^i82d" in name:
        name = name.replace("^i82d", "")
        _tf.INT8_GEMM = True
        _i8.INT8_2D = True
    elif "^i8" in name:
        name = name.replace("^i8", "")
        _tf.INT8_GEMM = True
        _i8.INT8_2D = False
    else:
        _tf.INT8_GEMM = False
        _i8.INT8_2D = False
    # '^d2'/'^nod2' pin the 2D-GEMM projection layout per arm
    if "^nod2" in name:
        name = name.replace("^nod2", "")
        _tf.DENSE_2D = False
    elif "^d2" in name:
        name = name.replace("^d2", "")
        _tf.DENSE_2D = True
    # '^fwdN'/'^bwdN' pin the kernel batch-block caps per arm
    import re as _re

    m = _re.search(r"\^fwd(\d+)", name)
    if m:
        fa.FWD_BLOCK_CAP = int(m.group(1))
        name = name.replace(m.group(0), "")
    m = _re.search(r"\^bwd(\d+)", name)
    if m:
        fa.BWD_BLOCK_CAP = int(m.group(1))
        name = name.replace(m.group(0), "")
    # '^flanesN' pins the FORWARD-only lane width (full-width fwd groups,
    # shape-aware bwd); must be matched before the '^lanesN' substring
    m = _re.search(r"\^flanes(\d+)", name)
    if m:
        fa.FWD_LANES = int(m.group(1))
        name = name.replace(m.group(0), "")
    # '^lanesN' pins the head-group lane width (fewer, fatter grid steps)
    m = _re.search(r"\^lanes(\d+)", name)
    if m:
        fa.GROUP_LANES = int(m.group(1))
        name = name.replace(m.group(0), "")
    # '^vmN' pins the per-kernel Mosaic VMEM budget to N MiB (chip has 128;
    # big block x lane combinations need >64)
    m = _re.search(r"\^vm(\d+)", name)
    if m:
        fa.VMEM_LIMIT_BYTES = int(m.group(1)) * 2 ** 20
        name = name.replace(m.group(0), "")
    # '^nolse' pins the recompute backward (no saved-logsumexp residual)
    if "^nolse" in name:
        name = name.replace("^nolse", "")
        fa.SAVE_LSE = False
    else:
        fa.SAVE_LSE = True
    # '~fast'/'~safe'/'~shift' pin the softmax variant per arm (read at
    # trace time); bare arms get the shipped default (rowmax + post-dot
    # normalization), so a prior arm's pin never leaks
    if name.endswith("~fast"):
        name = name[:-5]
        fa.FAST_SOFTMAX, fa.FIXED_SHIFT = True, False
    elif name.endswith("~shift"):  # the retired fixed-shift formulation
        name = name[:-6]
        fa.FAST_SOFTMAX, fa.FIXED_SHIFT = True, True
    elif name.endswith("~safe"):
        name = name[:-5]
        fa.FAST_SOFTMAX, fa.FIXED_SHIFT = False, False
    else:
        fa.FAST_SOFTMAX, fa.FIXED_SHIFT = True, False
    if name.endswith("+lnf"):  # fused LN->GEMM kernel (ops/fused_ln_dense)
        name, ln_gemm = name[:-4], "pallas"
    if "%" in name:
        name, ln = name.split("%")
    if "#" in name:
        name, mlp = name.split("#")
    if "@" in name:
        name, bs = name.split("@")
        batch = int(bs)
    # '!preset' pins per-jit XLA compiler options (one compiled executable
    # per arm in the same process — the only way to interleave flag A/Bs
    # through pool noise)
    copts = None
    _COPTS = {
        "vmem32": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
        "vmem64": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
        "vmem96": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
        "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
        "lhsvmem64": {"xla_tpu_enable_latency_hiding_scheduler": "true",
                      "xla_tpu_scoped_vmem_limit_kib": "65536"},
        "fcm": {"xla_tpu_enable_experimental_fusion_cost_model": "true"},
        "flash": {"xla_tpu_enable_flash_attention": "true"},
        "bundle": {"xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"},
        "rwb": {"xla_tpu_rwb_fusion": "true"},
        "scav": {"xla_tpu_scavenge_vmem_for_fusions": "true"},
        "nodup": {"xla_tpu_reduce_loop_fusion_dup_with_unfusable_user": "true"},
    }
    if "!" in name:
        name, preset = name.split("!")
        if "=" in preset:  # raw key=val[;key=val] form
            copts = dict(kv.split("=", 1) for kv in preset.split(";"))
        else:
            copts = _COPTS[preset]
    extra = {} if zip_towers is None else {"zip_towers": zip_towers}
    bundle = create_model(model, precision="bf16", seed=0, attn_impl=name,
                          mlp_impl=mlp, ln_impl=ln, ln_gemm_impl=ln_gemm,
                          **extra)
    tr = Trainer(
        bundle, loss=make_loss("spatial", cap_logit_scale=50.0),
        config=TrainerConfig(warmup_steps=10, total_steps=10**5,
                             augment=augment,
                             color_jitter=0.2 if augment else None,
                             log_every=10**9,
                             master_weights=master, compiler_options=copts,
                             step_metrics=step_metrics,
                             scan_steps=scan_steps, nu_dtype=nu,
                             grad_dtype=gdt),
        mesh=make_mesh(),
    )
    step = tr.make_train_step()
    state = tr.init_state()
    rng = np.random.default_rng(0)
    B = batch
    tid = np.arange(B, dtype=np.int32)
    size = bundle.cfg.vision_cfg.image_size

    def one_batch():
        return {
            "images": rng.integers(0, 255, (B, size, size, 3), dtype=np.uint8),
            "texts": rng.integers(0, bundle.cfg.text_cfg.vocab_size,
                                  (B, bundle.cfg.text_cfg.context_length)).astype(np.int32),
            "image_tile_ids": tid, "text_tile_ids": tid,
            "neighbor_tile_ids": rng.integers(-1, B, (B, 6)).astype(np.int32),
            "neighbor_alphas": rng.uniform(0, 1, (B, 6)).astype(np.float32),
        }

    if scan_steps > 1:
        stacked = next(Trainer._group_batches(
            (one_batch() for _ in range(scan_steps)), scan_steps))
        db = tr._device_batch(stacked, stacked=True)
    else:
        db = tr._device_batch(one_batch())
    return step, state, db, B, scan_steps


def main():
    # persistent compile cache: repeat arms across campaigns skip the
    # 4-30 min tunnel compile when the executable is unchanged (harmless
    # no-op if the backend doesn't support serialization)
    import os

    import jax

    # honor JAX_PLATFORMS in-process (the env var alone is ignored once
    # sitecustomize registers the axon backend) — enables CPU dry runs
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(Path(__file__).parents[1] / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:  # noqa: BLE001
        pass

    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", nargs="+", required=True)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--chunk", type=int, default=10)
    # equalize REAL steps per value-fetch barrier across arms with different
    # scan_steps (the ~38 ms fetch amortizes per-barrier; unequal
    # steps/barrier confounds scan A/Bs — docs/experiments.md round 3)
    ap.add_argument("--steps-per-barrier", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    arms = {}
    for arm in args.arms:
        print(f"building + compiling arm {arm} ...", flush=True)
        t0 = time.perf_counter()
        # the pooled tunnel throws transient UNAVAILABLE compile errors —
        # retry each arm a few times, and skip (not abort) a persistently
        # failing arm so the rest of the campaign still measures
        for attempt in range(3):
            try:
                step, state, db, B, mult = build(arm, args.batch, args.model)
                # warmup = first executions (compile happens on the tunnel)
                for _ in range(3):
                    state, m = step(state, db)
                loss0 = float(np.asarray(m["loss"]))
                break
            except Exception as e:  # noqa: BLE001
                print(f"  attempt {attempt}: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                if attempt < 2:
                    time.sleep(60)
        else:
            print(f"  arm {arm} SKIPPED after 3 failures", flush=True)
            continue
        print(f"  compiled+warm in {time.perf_counter()-t0:.0f}s loss={loss0:.3f}",
              flush=True)
        arms[arm] = dict(step=step, state=state, db=db, B=B, mult=mult,
                         times=[])

    for r in range(args.rounds):
        for arm, a in arms.items():
            state = a["state"]
            calls = (max(1, args.steps_per_barrier // a["mult"])
                     if args.steps_per_barrier else args.chunk)
            t0 = time.perf_counter()
            for _ in range(calls):
                state, m = a["step"](state, a["db"])
            float(np.asarray(m["loss"]))  # value-fetch barrier
            dt = time.perf_counter() - t0
            a["state"] = state
            n_steps = calls * a["mult"]
            a["times"].append(dt / n_steps)
            print(f"round {r} {arm}: {1e3*dt/n_steps:.2f} ms/step", flush=True)

    result = {}
    for arm, a in arms.items():
        ms = 1e3 * float(np.median(a["times"]))
        result[arm] = {
            "ms_per_step_median": round(ms, 2),
            "ms_all": [round(1e3 * t, 2) for t in a["times"]],
            "pairs_per_sec": round(a["B"] / (ms / 1e3), 1),
            "batch": a["B"],
        }
    print(json.dumps(result, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
