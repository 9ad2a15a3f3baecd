#!/usr/bin/env python
"""Per-model GFLOPs/MParams profiler CLI (ref: open_clip_train/profiler.py:
13-24 argparse, 131-208 profiling loop, 234-245 CSV output).

    python -m spatial_clip_tpu.cli.profiler --model ViT-B-32 ViT-Test
    python -m spatial_clip_tpu.cli.profiler --model all --results-file costs.csv
"""
from __future__ import annotations

import argparse
import csv
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="model FLOPs/params profiler")
    ap.add_argument("--model", nargs="+", default=["ViT-B-32"],
                    help="model names, or 'all' for every built-in config")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--train", action="store_true", help="include fwd+bwd cost")
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--results-file", default=None, help="write CSV here")
    args = ap.parse_args(argv)

    from spatial_clip_tpu.models.factory import create_model, list_models
    from spatial_clip_tpu.ops.flops import profile_model

    names = list_models() if args.model == ["all"] else args.model
    rows = []
    for name in names:
        try:
            bundle = create_model(name, precision=args.precision)
            row = profile_model(bundle, batch_size=args.batch_size, train=args.train)
            rows.append(row)
            print(json.dumps(row))
        except Exception as e:
            print(f"skip {name}: {e}", file=sys.stderr)
    if args.results_file and rows:
        with open(args.results_file, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
    return rows


if __name__ == "__main__":
    main()
