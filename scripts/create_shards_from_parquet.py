#!/usr/bin/env python
"""Parquet nodes/edges -> per-sample tar shards converter
(ref: scripts/create_hugo_shards.py:18-104 and create_full_hugo_dataset.py).

Reads a parquet split (nodes.parquet with tile_id/image_path/gene_sentence
[/sample_id/x/y], edges.parquet) and writes the shards_v1 layout:
``<out>/<SAMPLE>/<SAMPLE>_NNNNNN.tar`` of ``{key}.png/.txt/.json``.

    python scripts/create_shards_from_parquet.py --parquet-dir data/train \
        --out-dir data/processed/hugo --maxcount 1000
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import pandas as pd  # noqa: E402

from spatial_clip_tpu.data.spaglam.shard_writer import ShardWriter  # noqa: E402


def convert(parquet_dir: Path, out_dir: Path, maxcount: int = 1000) -> dict:
    nodes = pd.read_parquet(parquet_dir / "nodes.parquet")
    sample_col = "sample_id" if "sample_id" in nodes.columns else None
    stats = {"samples": {}, "total": 0}
    groups = (
        nodes.groupby(sample_col) if sample_col else [("SAMPLE", nodes)]
    )
    for sample_id, grp in groups:
        sample_id = str(sample_id)
        writer = ShardWriter(
            str(out_dir / sample_id / f"{sample_id}_%06d.tar"), maxcount=maxcount
        )
        n = 0
        with writer:
            for i, row in enumerate(grp.itertuples(index=False)):
                img_path = Path(row.image_path)
                if not img_path.is_absolute():
                    img_path = parquet_dir / img_path
                meta = {
                    "sample_id": sample_id,
                    "x": float(getattr(row, "x", 0.0)),
                    "y": float(getattr(row, "y", 0.0)),
                    "tile_id": int(row.tile_id),
                }
                writer.write(
                    {
                        "__key__": f"{sample_id}_{i:06d}",
                        "png": img_path.read_bytes(),
                        "txt": str(row.gene_sentence),
                        "json": meta,
                    }
                )
                n += 1
        stats["samples"][sample_id] = n
        stats["total"] += n
    (out_dir / "conversion_stats.json").write_text(json.dumps(stats, indent=2))
    return stats


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--parquet-dir", type=Path, required=True)
    ap.add_argument("--out-dir", type=Path, required=True)
    ap.add_argument("--maxcount", type=int, default=1000)
    args = ap.parse_args(argv)
    stats = convert(args.parquet_dir, args.out_dir, args.maxcount)
    print(json.dumps(stats, indent=2))
    return stats


if __name__ == "__main__":
    main()
