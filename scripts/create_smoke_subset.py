#!/usr/bin/env python
"""Subset a sharded dataset into a smoke set (ref: scripts/create_hugo_smoke.py).

Copies the first N spots of each of the first S samples into a new shards_v1
tree, preserving the tar record layout.

    python scripts/create_smoke_subset.py --src data/processed/hest_v1 \
        --dst data/processed/hest_smoke --samples 6 --spots-per-sample 200
"""
from __future__ import annotations

import argparse
import io
import json
import sys
import tarfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))


def subset(src: Path, dst: Path, n_samples: int, spots_per_sample: int) -> dict:
    sample_dirs = sorted(
        d for d in src.iterdir() if d.is_dir() and not d.name.startswith(".")
    )[:n_samples]
    stats = {}
    for sdir in sample_dirs:
        sid = sdir.name
        out_dir = dst / sid
        out_dir.mkdir(parents=True, exist_ok=True)
        out_tar = tarfile.open(out_dir / f"{sid}_000000.tar", "w")
        copied_keys = set()
        try:
            for tp in sorted(sdir.glob("*.tar")):
                with tarfile.open(tp) as tf:
                    for m in tf.getmembers():
                        stem = m.name.rpartition(".")[0]
                        if len(copied_keys) >= spots_per_sample and stem not in copied_keys:
                            continue
                        copied_keys.add(stem)
                        data = tf.extractfile(m).read()
                        info = tarfile.TarInfo(name=m.name)
                        info.size = len(data)
                        out_tar.addfile(info, io.BytesIO(data))
                if len(copied_keys) >= spots_per_sample:
                    break
        finally:
            out_tar.close()
        stats[sid] = len(copied_keys)
    (dst / "smoke_stats.json").write_text(json.dumps(stats, indent=2))
    return stats


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", type=Path, required=True)
    ap.add_argument("--dst", type=Path, required=True)
    ap.add_argument("--samples", type=int, default=6)
    ap.add_argument("--spots-per-sample", type=int, default=200)
    args = ap.parse_args(argv)
    stats = subset(args.src, args.dst, args.samples, args.spots_per_sample)
    print(json.dumps(stats, indent=2))
    return stats


if __name__ == "__main__":
    main()
