#!/usr/bin/env python
"""Inspect the k-NN neighbor graph a ShardedSpatialDataset builds
(ref: inspect_smoke_neighbors.py:6,19-27).

    python scripts/inspect_neighbors.py --dataset-root data/processed/smoke \
        --samples SAMPLE_A SAMPLE_B --k 6 --n 5
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-root", type=Path, required=True)
    ap.add_argument("--samples", nargs="*", default=None)
    ap.add_argument("--k", type=int, default=6)
    ap.add_argument("--n", type=int, default=5, help="spots to print")
    ap.add_argument("--rebuild-cache", action="store_true")
    args = ap.parse_args(argv)

    from spatial_clip_tpu.data.datasets import ShardedSpatialDataset
    from spatial_clip_tpu.data.datasets import _resolve_sample_ids

    sample_ids = args.samples or _resolve_sample_ids("train", args.dataset_root)
    ds = ShardedSpatialDataset(
        dataset_root=args.dataset_root,
        split="inspect",
        sample_ids=sample_ids,
        k_neighbors=args.k,
        rebuild_cache=args.rebuild_cache,
    )
    ids = ds._graph["ids"]
    alphas = ds._graph["alphas"]
    print(f"{len(ds)} spots; mean valid neighbors: {(ids >= 0).sum(1).mean():.2f}")
    print(f"alpha stats: mean {alphas[alphas > 0].mean():.3f} "
          f"min {alphas[alphas > 0].min():.3f} max {alphas.max():.3f}")
    for i in range(min(args.n, len(ds))):
        item = ds[i]
        print(
            f"spot {i} (tile {item['anchor_tile_id']}): "
            f"nbrs {item['neighbor_tile_ids']} alphas "
            f"{np.round(item['neighbor_alphas'], 3).tolist()} :: "
            f"{item['raw_text'][:60]}"
        )
    return ds


if __name__ == "__main__":
    main()
