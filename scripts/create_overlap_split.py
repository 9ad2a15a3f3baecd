#!/usr/bin/env python
"""Build train/val sample-id split files for a sharded dataset
(ref: scripts/create_hugo_overlap_shards.py:18-24 — pinned-id overlap splits).

Two modes:
- ``disjoint``: split sample ids train/val with no overlap (default)
- ``overlap``: every sample appears in train AND val (the reference's
  overlap-comparison experiments, configs/experiment/compare_*_overlap.yaml)

    python scripts/create_overlap_split.py --dataset-dir data/processed/hest_v1 \
        --val-fraction 0.2 --mode disjoint --seed 42
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-dir", type=Path, required=True)
    ap.add_argument("--val-fraction", type=float, default=0.2)
    ap.add_argument("--mode", choices=["disjoint", "overlap"], default="disjoint")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--pin", nargs="*", default=[], help="sample ids forced into val")
    args = ap.parse_args(argv)

    samples = sorted(
        d.name
        for d in args.dataset_dir.iterdir()
        if d.is_dir() and not d.name.startswith(".") and any(d.glob("*.tar"))
    )
    if not samples:
        print("no sample dirs found", file=sys.stderr)
        sys.exit(1)
    rng = np.random.default_rng(args.seed)
    order = list(rng.permutation(samples))
    n_val = max(1, int(round(len(samples) * args.val_fraction)))
    pinned = [s for s in args.pin if s in samples]
    val = list(dict.fromkeys(pinned + order))[:n_val]
    if args.mode == "overlap":
        train = samples
    else:
        train = [s for s in samples if s not in set(val)]

    (args.dataset_dir / "train.txt").write_text("\n".join(train) + "\n")
    (args.dataset_dir / "val.txt").write_text("\n".join(val) + "\n")
    summary = {"mode": args.mode, "n_train": len(train), "n_val": len(val),
               "train": train, "val": val}
    (args.dataset_dir / "split.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps({k: v for k, v in summary.items() if k not in ("train",)}, indent=2))
    return summary


if __name__ == "__main__":
    main()
