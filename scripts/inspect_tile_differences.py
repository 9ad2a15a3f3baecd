#!/usr/bin/env python
"""Compare a sample's tiles between a parquet dataset and a shard dataset.

The TPU-native analogue of the reference's one-off diagnostic
(ref: scripts/inspect_tile_differences.py:13-80): it cross-checks spatial
extents, detects swapped-axis coordinate overlap, and reports gene-sentence
length statistics — generalized to take both roots on the command line
instead of hard-coded repo paths.

    python scripts/inspect_tile_differences.py SAMPLE_ID \
        --parquet-root data/parquet/train --shard-root data/shards
"""
from __future__ import annotations

import argparse
import json
import sys
import tarfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np  # noqa: E402


def load_parquet_tiles(root: Path, sample_id: str):
    import pandas as pd

    df = pd.read_parquet(root / "nodes.parquet")
    if "sample_id" in df.columns:
        df = df[df["sample_id"].astype(str) == sample_id]
    else:
        df = df[df["tile_id"].astype(str).str.contains(sample_id)]
    return [
        {
            "x": float(r.get("x", 0.0)),
            "y": float(r.get("y", 0.0)),
            "txt": str(r.get("gene_sentence", "")),
        }
        for _, r in df.iterrows()
    ]


def load_shard_tiles(root: Path, sample_id: str):
    out = []
    sdir = root / sample_id
    tars = sorted(sdir.glob("*.tar")) if sdir.is_dir() else sorted(
        root.glob(f"{sample_id}*.tar")
    )
    for tar_path in tars:
        with tarfile.open(tar_path) as tf:
            metas, txts = {}, {}
            for m in tf.getmembers():
                key, _, ext = m.name.rpartition(".")
                if ext == "json":
                    metas[key] = json.loads(tf.extractfile(m).read())
                elif ext == "txt":
                    txts[key] = tf.extractfile(m).read().decode()
            for key, meta in metas.items():
                out.append({
                    "x": float(meta.get("x", 0.0)),
                    "y": float(meta.get("y", 0.0)),
                    "txt": txts.get(key, ""),
                })
    return out


def _extent(tiles):
    xs = np.array([t["x"] for t in tiles])
    ys = np.array([t["y"] for t in tiles])
    return xs, ys


def analyze(sample_id: str, parquet_root: Path, shard_root: Path) -> dict:
    a = load_parquet_tiles(parquet_root, sample_id)
    b = load_shard_tiles(shard_root, sample_id)
    report = {"sample_id": sample_id, "parquet_tiles": len(a), "shard_tiles": len(b)}
    print(f"\nAnalyzing sample {sample_id}: parquet={len(a)} shard={len(b)}")
    if not a or not b:
        report["error"] = "one of the datasets has no tiles for this sample"
        print(report["error"])
        return report

    ax, ay = _extent(a)
    bx, by = _extent(b)
    print(f"parquet: X[{ax.min():.1f},{ax.max():.1f}] Y[{ay.min():.1f},{ay.max():.1f}]")
    print(f"shards:  X[{bx.min():.1f},{bx.max():.1f}] Y[{by.min():.1f},{by.max():.1f}]")

    coords_a = set(zip(np.round(ax).astype(int), np.round(ay).astype(int)))
    coords_b = set(zip(np.round(bx).astype(int), np.round(by).astype(int)))
    coords_b_swapped = set(zip(np.round(by).astype(int), np.round(bx).astype(int)))
    report["common"] = len(coords_a & coords_b)
    report["common_swapped"] = len(coords_a & coords_b_swapped)
    print(f"common coords: {report['common']}; with X<->Y swap: "
          f"{report['common_swapped']}")
    if report["common_swapped"] > report["common"]:
        print("!! coordinate axes appear SWAPPED between the two datasets")

    lens = np.array([len(t["txt"].strip()) for t in b])
    report["txt_len"] = {
        "mean": float(lens.mean()), "min": int(lens.min()), "max": int(lens.max()),
        "p50": float(np.percentile(lens, 50)),
    }
    print(f"shard gene-sentence length: mean {lens.mean():.1f} "
          f"median {np.percentile(lens, 50):.0f} range [{lens.min()},{lens.max()}]")
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("sample_ids", nargs="+")
    ap.add_argument("--parquet-root", type=Path, required=True)
    ap.add_argument("--shard-root", type=Path, required=True)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args(argv)
    reports = [
        analyze(s, args.parquet_root, args.shard_root) for s in args.sample_ids
    ]
    if args.out:
        args.out.write_text(json.dumps(reports, indent=2))
    return reports


if __name__ == "__main__":
    main()
