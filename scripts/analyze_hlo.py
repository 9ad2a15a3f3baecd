#!/usr/bin/env python
"""Compile the train step for TPU and inventory layout copies / conv fusions.

    python scripts/analyze_hlo.py --batch 256 --out /tmp/hlo_b256.txt

Complements scripts/profile_step.py (which gives per-family device time but
anonymized op names): the optimized HLO names every copy with its shapes and
the source-op metadata, which is what we need to attribute the ~15% copy
overhead (docs/experiments.md, round-1 profile) to specific model ops.
"""
from __future__ import annotations

import argparse
import collections
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np  # noqa: E402


def build_step(batch: int, model: str, attn: str, mlp: str = "dense"):
    from spatial_clip_tpu import create_model
    from spatial_clip_tpu.losses import make_loss
    from spatial_clip_tpu.parallel.mesh import make_mesh
    from spatial_clip_tpu.train.loop import Trainer, TrainerConfig

    bundle = create_model(model, precision="bf16", seed=0, attn_impl=attn,
                          mlp_impl=mlp)
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
    return step, state, db


_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _bytes_of(shape_str: str) -> int:
    """Approx byte count of an HLO shape string like bf16[256,50,768]{2,1,0}."""
    m = _SHAPE_RE.match(shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    sizes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
             "pred": 1, "f16": 2, "s64": 8, "u64": 8}
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * sizes.get(dt, 4)


def analyze(hlo: str):
    copies = []
    convs = []
    transposes = []
    for line in hlo.splitlines():
        ls = line.strip()
        m = re.match(r"%?([\w.\-]+) = (\S+) copy\(", ls)
        if m:
            name, shape = m.groups()
            meta = re.search(r'metadata=\{op_name="([^"]*)"', ls)
            copies.append((shape, meta.group(1) if meta else "?"))
            continue
        if " convolution(" in ls or "conv(" in ls:
            m2 = re.match(r"%?([\w.\-]+) = (\S+) ", ls)
            meta = re.search(r'metadata=\{op_name="([^"]*)"', ls)
            convs.append((m2.group(2) if m2 else "?", meta.group(1) if meta else "?"))
        if " transpose(" in ls:
            m2 = re.match(r"%?([\w.\-]+) = (\S+) ", ls)
            meta = re.search(r'metadata=\{op_name="([^"]*)"', ls)
            transposes.append((m2.group(2) if m2 else "?", meta.group(1) if meta else "?"))

    def report(tag, items):
        print(f"\n== {tag}: {len(items)} ==")
        agg = collections.Counter()
        byte_agg = collections.Counter()
        for shape, op in items:
            key = (shape.split("{")[0], op)
            agg[key] += 1
            byte_agg[key] += _bytes_of(shape)
        for (shape, op), cnt in sorted(agg.items(), key=lambda kv: -byte_agg[kv[0]])[:40]:
            mb = byte_agg[(shape, op)] / 1e6
            print(f"  {cnt:4d}x {shape:28s} {mb:9.2f} MB total  {op}")

    report("copies", copies)
    report("convolutions", convs)
    report("transposes", transposes)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--attn", default="einsum")
    ap.add_argument("--mlp", default="dense")
    ap.add_argument("--out", default="/tmp/hlo_train_step.txt")
    ap.add_argument("--in-file", default=None,
                    help="skip compile; analyze an existing HLO dump")
    args = ap.parse_args(argv)
    if args.in_file:
        analyze(Path(args.in_file).read_text())
        return
    import jax

    step, state, db = build_step(args.batch, args.model, args.attn, args.mlp)
    print("lowering + compiling (TPU remote compile can take ~6-12 min)...",
          flush=True)
    compiled = jax.jit(step).lower(state, db).compile()
    hlo = compiled.as_text()
    Path(args.out).write_text(hlo)
    print(f"wrote {args.out} ({len(hlo)/1e6:.1f} MB)")
    analyze(hlo)


if __name__ == "__main__":
    main()
