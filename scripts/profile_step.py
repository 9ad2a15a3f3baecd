#!/usr/bin/env python
"""Capture + summarize a jax.profiler trace of the train step.

    python scripts/profile_step.py --batch 256 --steps 3 --out /tmp/jaxtrace

Prints a per-op-family device-time breakdown (the TPU analogue of the
reference's Lightning profiler presets, configs/debug/profiler.yaml).
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np  # noqa: E402


def capture(batch: int, steps: int, out: str, model: str = "ViT-B-32", attn: str = "auto"):
    import jax

    from spatial_clip_tpu import create_model
    from spatial_clip_tpu.losses import make_loss
    from spatial_clip_tpu.parallel.mesh import make_mesh
    from spatial_clip_tpu.train.loop import Trainer, TrainerConfig

    bundle = create_model(model, precision="bf16", seed=0, attn_impl=attn)
    tr = Trainer(
        bundle, loss=make_loss("spatial", cap_logit_scale=50.0),
        config=TrainerConfig(warmup_steps=10, total_steps=10**5, augment=True,
                             color_jitter=0.2, log_every=10**9),
        mesh=make_mesh(),
    )
    step = tr.make_train_step()
    state = tr.init_state()
    rng = np.random.default_rng(0)
    B = batch
    tid = np.arange(B, dtype=np.int32)
    size = bundle.cfg.vision_cfg.image_size
    db = tr._device_batch({
        "images": rng.integers(0, 255, (B, size, size, 3), dtype=np.uint8),
        "texts": rng.integers(0, bundle.cfg.text_cfg.vocab_size,
                              (B, bundle.cfg.text_cfg.context_length)).astype(np.int32),
        "image_tile_ids": tid, "text_tile_ids": tid,
        "neighbor_tile_ids": rng.integers(-1, B, (B, 6)).astype(np.int32),
        "neighbor_alphas": rng.uniform(0, 1, (B, 6)).astype(np.float32),
    })
    for _ in range(3):
        state, m = step(state, db)
    float(np.asarray(m["loss"]))
    jax.profiler.start_trace(out)
    for _ in range(steps):
        state, m = step(state, db)
    float(np.asarray(m["loss"]))
    jax.profiler.stop_trace()


def summarize(out: str, steps: int):
    traces = sorted(glob.glob(f"{out}/plugins/profile/*/*.trace.json.gz"))
    if not traces:
        print("no trace found")
        return {}
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    rows = [
        (e["name"], e["dur"])
        for e in data.get("traceEvents", [])
        if e.get("ph") == "X" and e.get("dur") and e.get("pid") == 3
    ]
    fam = collections.Counter()
    for name, dur in rows:
        if re.fullmatch(r"\d+", name):
            continue
        fam[re.sub(r"[.\d]+$", "", name)] += dur
    print(f"device events: {len(rows)}; per-step family breakdown (ms):")
    result = {}
    for name, dur in fam.most_common(20):
        per_step = dur / 1e3 / max(steps, 1)
        result[name] = round(per_step, 2)
        print(f"{per_step:9.2f}  {name}")
    return result


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--out", default="/tmp/jaxtrace")
    ap.add_argument("--attn", default="auto")
    ap.add_argument("--summarize-only", action="store_true")
    args = ap.parse_args(argv)
    if not args.summarize_only:
        capture(args.batch, args.steps, args.out, args.model, args.attn)
    return summarize(args.out, args.steps)


if __name__ == "__main__":
    main()
