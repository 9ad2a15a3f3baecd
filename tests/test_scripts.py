"""Script-level integration tests: parquet->shards conversion, smoke subset,
overlap split, shard validation, manifest inspection, neighbor inspection."""
import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).parents[1] / "scripts"))
sys.path.insert(0, str(Path(__file__).parents[1]))


@pytest.fixture()
def parquet_ds(tmp_path):
    pdir = tmp_path / "train"
    pdir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for sid in ("S1", "S2"):
        for i in range(5):
            p = pdir / f"{sid}_{i}.png"
            Image.fromarray(
                rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
            ).save(p)
            rows.append(
                {
                    "tile_id": len(rows),
                    "image_path": str(p),
                    "gene_sentence": f"G{i} G{i+1}",
                    "sample_id": sid,
                    "x": float(i * 10),
                    "y": float(i * 7),
                }
            )
    pd.DataFrame(rows).to_parquet(pdir / "nodes.parquet")
    pd.DataFrame(
        {"src_tile_id": [0], "nbr_tile_id": [1], "alpha": [1.0]}
    ).to_parquet(pdir / "edges.parquet")
    return pdir


def test_parquet_to_shards_and_subset(parquet_ds, tmp_path):
    from create_shards_from_parquet import convert
    from create_smoke_subset import subset

    out = tmp_path / "shards"
    stats = convert(parquet_ds, out, maxcount=3)
    assert stats["total"] == 10
    assert stats["samples"] == {"S1": 5, "S2": 5}
    assert len(list((out / "S1").glob("*.tar"))) == 2  # 5 spots / 3 per shard

    # round-trip through the training dataset
    from spatial_clip_tpu.data.datasets import ShardedSpatialDataset

    ds = ShardedSpatialDataset(
        dataset_root=out, split="t", sample_ids=["S1", "S2"], k_neighbors=2,
        rebuild_cache=True,
    )
    assert len(ds) == 10
    assert ds[0]["image"].shape == (8, 8, 3)

    smoke = tmp_path / "smoke"
    sstats = subset(out, smoke, n_samples=1, spots_per_sample=2)
    assert sstats == {"S1": 2}


def test_overlap_split(parquet_ds, tmp_path):
    from create_shards_from_parquet import convert
    import create_overlap_split

    out = tmp_path / "shards"
    convert(parquet_ds, out, maxcount=10)
    create_overlap_split.main(
        ["--dataset-dir", str(out), "--val-fraction", "0.5", "--mode", "disjoint"]
    )
    train = (out / "train.txt").read_text().split()
    val = (out / "val.txt").read_text().split()
    assert set(train) | set(val) == {"S1", "S2"}
    assert not set(train) & set(val)
    create_overlap_split.main(
        ["--dataset-dir", str(out), "--val-fraction", "0.5", "--mode", "overlap"]
    )
    train = (out / "train.txt").read_text().split()
    assert set(train) == {"S1", "S2"}  # overlap: all samples in train


def test_find_overlapping_ids(parquet_ds, tmp_path):
    """Overlap discovery across id-source kinds (ref:
    scripts/find_overlapping_ids.py — allowlist-vs-parquet intersection)."""
    import find_overlapping_ids

    cfg = tmp_path / "medium.yaml"
    cfg.write_text(
        "params:\n  samples_allowlist:\n    - S1\n    - S_other\n"
    )
    overlap = find_overlapping_ids.main([str(cfg), str(parquet_ds)])
    assert overlap == ["S1"]

    txt = tmp_path / "ids.txt"
    txt.write_text("S2\nS9\n")
    out = tmp_path / "overlap.txt"
    overlap = find_overlapping_ids.main(
        [str(txt), str(parquet_ds), "--out", str(out)]
    )
    assert overlap == ["S2"] and out.read_text().strip() == "S2"


def test_validator_and_manifest_on_real_pipeline(tmp_path):
    """Full pipeline -> validator reports 100% validity -> manifest inspects clean."""
    from tests.test_preprocess import _make_raw_hest
    from spatial_clip_tpu.data.preprocessing.entry import run
    from validate_sharded_dataset import validate
    from inspect_manifest import inspect as inspect_manifest

    raw, genes = _make_raw_hest(tmp_path, n_spots=5, n_genes=6)
    hvg = tmp_path / "hvgs.txt"
    hvg.write_text("\n".join(genes))
    hgnc = tmp_path / "hgnc.txt"
    hgnc.write_text("symbol\tstatus\n" + "\n".join(f"{g}\tApproved" for g in genes))
    cfg = {
        "dataset": {"key": "v", "description": ""},
        "source": {"raw_data_dir": str(raw), "hgnc_path": str(hgnc),
                   "global_hvg_path": str(hvg)},
        "intermediate_dir": str(tmp_path / "inter"),
        "output_dir": str(tmp_path / "out"),
        "run": {"stage": "full"},
        "params": {
            "general": {"batch_key": "sample_id", "species_filter": None},
            "samples_to_exclude": [],
            "gene_alignment": {"keep_status": ["Approved"], "keep_locus_types": None},
            "sentence_generation": {"n_top_genes": 4},
            "sharding": {"max_samples_per_shard": 10},
            "tiling": {"tile_size": 16},
        },
        "performance": {"max_workers": 1, "limit_samples": -1},
    }
    run(cfg)
    report = validate(
        tmp_path / "out",
        tmp_path / "inter" / "adata_final_for_sharding.h5ad",
        n_top_genes=4,
    )
    assert report["validity_pct"] == 100.0, report
    summary = inspect_manifest(tmp_path / "out")
    assert summary["ok"], summary
    assert summary["total_processed"] == 10


def test_bench_inference_smoke(tmp_path, monkeypatch):
    """Serving-path benchmark drives both encoder configs end-to-end on the
    tiny arch (CPU; sub-second batches)."""
    import json
    import sys

    sys.path.insert(0, "scripts")
    import bench_inference

    out = tmp_path / "infer.json"
    monkeypatch.setattr(
        sys, "argv",
        ["bench_inference.py", "--model", "ViT-Test", "--batch", "4",
         "--steps", "2", "--out", str(out)],
    )
    bench_inference.main()
    r = json.loads(out.read_text())
    assert r["dense"]["image_tiles_per_sec"] > 0
    assert r["int8"]["image_tiles_per_sec"] > 0
