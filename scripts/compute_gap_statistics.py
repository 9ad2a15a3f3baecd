#!/usr/bin/env python
"""Spot-spacing gap statistics (ref: scripts/compute_gap_statistics.py:147-272).

For each slide: nearest-neighbor spacing distribution of spot coordinates vs
the tile size — tells you whether tiles overlap. Summaries per technology,
JSON + CSV outputs.

    python scripts/compute_gap_statistics.py --raw-dir data/raw/hest_v1 \
        --patch-size 224 --out-dir reports/
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import Dict, List, Optional

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def compute_sample_metrics(coords: np.ndarray, patch_size: float) -> Optional[Dict]:
    """KD-tree nearest-neighbor spacing summary for one slide
    (ref: compute_gap_statistics.py:147-203)."""
    if len(coords) < 2:
        return None
    from scipy.spatial import cKDTree

    tree = cKDTree(coords)
    dists, _ = tree.query(coords, k=2)
    nn = dists[:, 1]
    return {
        "n_spots": int(len(coords)),
        "nn_mean": float(nn.mean()),
        "nn_median": float(np.median(nn)),
        "nn_p05": float(np.percentile(nn, 5)),
        "nn_p95": float(np.percentile(nn, 95)),
        "patch_size": float(patch_size),
        "gap_mean": float(nn.mean() - patch_size),
        "overlap_fraction": float((nn < patch_size).mean()),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw-dir", type=Path, required=True)
    ap.add_argument("--patch-size", type=float, default=224.0)
    ap.add_argument("--out-dir", type=Path, default=Path("reports"))
    ap.add_argument("--limit", type=int, default=-1)
    args = ap.parse_args(argv)

    from spatial_clip_tpu.data.preprocessing.utils import get_spot_coordinates
    from spatial_clip_tpu.data.spaglam.hest_loading import HESTDataset

    ds = HESTDataset(args.raw_dir)
    samples = ds.get_samples()
    if args.limit > 0:
        samples = samples[: args.limit]
    rows: List[Dict] = []
    for s in samples:
        try:
            adata = s.load_adata()
            m = compute_sample_metrics(get_spot_coordinates(adata), args.patch_size)
            if m is None:
                continue
            m["sample_id"] = s.sample_id
            m["technology"] = str(
                s.metadata.get("st_technology", s.metadata.get("technology", ""))
            )
            rows.append(m)
        except Exception as e:
            print(f"skip {s.sample_id}: {e}", file=sys.stderr)
    if not rows:
        print("no samples processed", file=sys.stderr)
        return {}

    df = pd.DataFrame(rows)
    args.out_dir.mkdir(parents=True, exist_ok=True)
    df.to_csv(args.out_dir / "gap_statistics.csv", index=False)
    per_tech = (
        df.groupby("technology")
        .agg(
            n_slides=("sample_id", "count"),
            n_spots=("n_spots", "sum"),
            nn_mean=("nn_mean", "mean"),
            overlap_fraction=("overlap_fraction", "mean"),
        )
        .reset_index()
        .to_dict(orient="records")
    )
    summary = {
        "n_slides": int(len(df)),
        "n_spots": int(df.n_spots.sum()),
        "nn_mean_px": float(df.nn_mean.mean()),
        "patch_size": args.patch_size,
        "per_technology": per_tech,
    }
    (args.out_dir / "gap_statistics_summary.json").write_text(
        json.dumps(summary, indent=2)
    )
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
