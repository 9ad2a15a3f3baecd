#!/usr/bin/env python
"""Find sample-id overlap between two dataset specifications
(ref: scripts/find_overlapping_ids.py — medium-allowlist vs hugo-parquet
intersection; generalized here to every id-source the repo supports).

Id sources (auto-detected per argument):
- a preprocess YAML config -> ``params.samples_allowlist``
- a parquet split dir (or file) -> distinct ``sample_id`` column values
- a shard dataset root -> ``manifest.json`` sample_dirs (or subdirectories)
- a plain .txt listing (one id per line)

    python scripts/find_overlapping_ids.py \
        configs/preprocess/hest_human_medium.yaml data/hugo_parquet \
        --out reports/overlap_ids.txt
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))


def ids_from(spec: str) -> set:
    p = Path(spec)
    if p.suffix in (".yaml", ".yml"):
        from spatial_clip_tpu.config import load_yaml

        cfg, _ = load_yaml(p)
        allow = (cfg.get("params", {}) or {}).get("samples_allowlist") or []
        return {str(s) for s in allow}
    if p.suffix == ".txt":
        return {ln.strip() for ln in p.read_text().splitlines() if ln.strip()}
    if p.suffix == ".parquet" or (p.is_dir() and list(p.glob("**/*.parquet"))):
        import pandas as pd

        files = [p] if p.suffix == ".parquet" else sorted(p.glob("**/*.parquet"))
        ids: set = set()
        for f in files:
            try:
                df = pd.read_parquet(f, columns=["sample_id"])
            except Exception:
                continue
            ids.update(map(str, df["sample_id"].unique()))
        return ids
    if p.is_dir():
        manifest = p / "manifest.json"
        if manifest.exists():
            m = json.loads(manifest.read_text())
            dirs = (m.get("outputs", {}) or {}).get("sample_dirs")
            if dirs:
                return {str(d) for d in dirs}
        return {d.name for d in p.iterdir()
                if d.is_dir() and not d.name.startswith(".")}
    raise ValueError(f"cannot extract sample ids from {spec!r}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("source_a")
    ap.add_argument("source_b")
    ap.add_argument("--out", default=None,
                    help="write the sorted overlapping ids to this file")
    args = ap.parse_args(argv)
    a, b = ids_from(args.source_a), ids_from(args.source_b)
    overlap = sorted(a & b)
    print(f"Found {len(a)} IDs in {args.source_a}.")
    print(f"Found {len(b)} IDs in {args.source_b}.")
    print(f"Found {len(overlap)} overlapping IDs.")
    print("Overlapping IDs:", overlap)
    if args.out:
        Path(args.out).write_text("\n".join(overlap) + "\n")
    return overlap


if __name__ == "__main__":
    main()
