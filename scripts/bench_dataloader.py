#!/usr/bin/env python
"""Host input-pipeline throughput: shard-read -> PNG decode -> resize ->
tokenize -> collate, in tiles/sec/core.

The training bench (bench.py) measures device-resident steady-state compute;
this benchmark answers the other half of the production question: how many
host cores does the tar-shard loader need to FEED one chip at the measured
step rate? (ref instrumentation: open_clip_train/train.py:244-249 samples/s;
the reference's webdataset loader has the same role.)

    python scripts/bench_dataloader.py --spots 512 --tile-size 224

Writes reports/bench_dataloader.json with tiles/sec/core and the implied
cores-per-chip at the bench.py target rate (2790 pairs/sec/chip).
"""
from __future__ import annotations

import argparse
import io
import json
import sys
import tarfile
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

from bench import TARGET as TARGET_PAIRS_PER_SEC  # noqa: E402 (single source)


def make_shards(root: Path, n_samples: int, spots: int, tile: int, seed=0):
    rng = np.random.default_rng(seed)
    for s in range(n_samples):
        sid = f"S{s:03d}"
        sdir = root / sid
        sdir.mkdir(parents=True, exist_ok=True)
        with tarfile.open(sdir / f"{sid}_000000.tar", "w") as tar:
            for i in range(spots):
                key = f"{sid}_{i:06d}"
                # smooth structured tiles (realistic PNG entropy, not noise)
                yy, xx = np.mgrid[0:tile, 0:tile]
                f1, f2 = rng.uniform(0.01, 0.1, 2)
                img = np.stack(
                    [
                        127 + 120 * np.sin(f1 * xx + p) * np.cos(f2 * yy + p)
                        for p in rng.uniform(0, 6, 3)
                    ],
                    axis=-1,
                ).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, format="PNG")
                sentence = " ".join(
                    f"G{g}" for g in rng.integers(0, 2000, 16)
                )
                meta = json.dumps(
                    {"sample_id": sid, "x": float(rng.uniform(0, 5000)),
                     "y": float(rng.uniform(0, 5000))}
                )
                for ext, payload in (
                    ("png", buf.getvalue()),
                    ("txt", sentence.encode()),
                    ("json", meta.encode()),
                ):
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(payload)
                    tar.addfile(info, io.BytesIO(payload))


def main():
    # host-side benchmark, but DataLoader queries jax.process_index() for
    # per-process sharding — force the cpu backend so that query never
    # touches the (possibly unreachable) TPU tunnel
    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--spots", type=int, default=512)
    ap.add_argument("--tile-size", type=int, default=224)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--workers", type=int, nargs="+", default=[0, 2])
    ap.add_argument("--worker-type", choices=["thread", "process"],
                    default="thread")
    ap.add_argument("--out", default="reports/bench_dataloader.json")
    args = ap.parse_args()

    from spatial_clip_tpu.data.datamodule import DataLoader, collate_spatial
    from spatial_clip_tpu.data.datasets.shard_backend import (
        ShardedSpatialDataset,
    )
    from spatial_clip_tpu.models.factory import get_tokenizer
    from spatial_clip_tpu.models.transforms import image_transform

    work = Path(tempfile.mkdtemp(prefix="bench_loader_"))
    n_tiles = args.samples * args.spots
    print(f"writing {n_tiles} x {args.tile_size}px tiles ...", flush=True)
    make_shards(work, args.samples, args.spots, args.tile_size)

    preprocess = image_transform(args.image_size, is_train=True, seed=0)
    tokenizer = get_tokenizer("ViT-B-32")
    t0 = time.perf_counter()
    ds = ShardedSpatialDataset(
        dataset_root=work, split="train",
        sample_ids=[f"S{s:03d}" for s in range(args.samples)],
        k_neighbors=6, preprocess_fn=preprocess, tokenizer=tokenizer,
        cache_dir=work / ".cache", rebuild_cache=True,
    )
    startup_s = time.perf_counter() - t0

    result = {
        "n_tiles": n_tiles,
        "tile_px": args.tile_size,
        "index_plus_knn_startup_sec": round(startup_s, 2),
        "target_pairs_per_sec_per_chip": TARGET_PAIRS_PER_SEC,
    }
    for nw in args.workers:
        loader = DataLoader(
            ds, batch_size=args.batch_size, shuffle=True, num_workers=nw,
            collate_fn=collate_spatial, seed=0,
            worker_type=args.worker_type,
        )
        # warm one epoch (page cache, PIL lazy init), then time
        for _ in loader:
            pass
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.epochs):
            for batch in loader:
                n += len(batch["image_tile_ids"])
        dt = time.perf_counter() - t0
        rate = n / dt
        result[f"tiles_per_sec_workers{nw}"] = round(rate, 1)
        # per-core rate from the synchronous arm (or the first arm measured)
        if nw == 0 or "tiles_per_sec_per_core" not in result:
            result["tiles_per_sec_per_core"] = round(rate, 1)
            result["cores_to_feed_one_chip_at_target"] = round(
                TARGET_PAIRS_PER_SEC / rate, 1
            )
        print(f"workers={nw}: {rate:.1f} tiles/sec ({n} tiles in {dt:.1f}s)",
              flush=True)

    out = REPO / args.out if not Path(args.out).is_absolute() else Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))

    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
