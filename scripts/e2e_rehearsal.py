#!/usr/bin/env python
"""End-to-end preprocessing -> training -> evaluation rehearsal.

One scripted run over the full production path (ref: docs/data_pipeline.md:
39-105 three-stage flow + scripts/validate_sharded_dataset.py:29-57):

1. synthesize a raw HEST-layout dataset (N slides of AnnData h5ad with
   embedded slide images + metadata CSV)
2. 3-stage preprocessing pipeline (merge/align -> normalize/filter ->
   tile+shard), timed -> preprocess spots/sec
3. shard-replay validation (coordinates + sentences vs the stage-2 adata)
4. gap statistics over the raw slides
5. train.py smoke on the produced shards (real ShardedSpatialDataset path)
6. eval.py retrieval suite restoring the saved checkpoint

Writes one JSON report. Sizes: --slides 50 --spots 400 is the "realistic
shape" rehearsal (~20k spots); --smoke shrinks everything for CI.

    python scripts/e2e_rehearsal.py --workdir /tmp/rehearsal --slides 50
    python scripts/e2e_rehearsal.py --smoke   # CI variant (pytest slow)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def make_raw_hest(raw: Path, n_slides: int, n_spots: int, n_genes: int,
                  image_size: int = 256, seed: int = 0):
    """Synthetic HEST v1 layout: metadata CSV + st/*.h5ad with spot
    coordinates and an embedded hires image."""
    from spatial_clip_tpu.data.spaglam.anndata_lite import AnnDataLite

    (raw / "st").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    genes = [f"G{i}" for i in range(n_genes)]
    rows = []
    total_spots = 0
    for s in range(n_slides):
        sid = f"S{s:03d}"
        # log-normal expression with slide-level gene programs so retrieval
        # has real signal (not pure noise)
        program = rng.normal(0, 1, n_genes)
        X = rng.poisson(np.exp(0.5 * program + rng.normal(0, 0.5, (n_spots, n_genes)))).astype(float)
        margin = 20
        obs = pd.DataFrame(
            {
                "pxl_col_in_fullres": rng.uniform(margin, image_size - margin, n_spots),
                "pxl_row_in_fullres": rng.uniform(margin, image_size - margin, n_spots),
            },
            index=[f"{sid}_{i}" for i in range(n_spots)],
        )
        var = pd.DataFrame(index=pd.Index(genes))
        img = rng.integers(0, 255, (image_size, image_size, 3), dtype=np.uint8)
        AnnDataLite(
            X=X, obs=obs, var=var,
            uns={"spatial": {sid: {"images": {"hires": img}}}},
        ).write_h5ad(raw / "st" / f"{sid}.h5ad")
        rows.append({"id": sid, "species": "Homo sapiens", "organ": "Lung",
                     "st_technology": "Visium"})
        total_spots += n_spots
    pd.DataFrame(rows).to_csv(raw / "HEST_v1_1_0.csv", index=False)
    return genes, total_spots


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--slides", type=int, default=50)
    ap.add_argument("--spots", type=int, default=400)
    ap.add_argument("--genes", type=int, default=256)
    ap.add_argument("--hvgs", type=int, default=128)
    ap.add_argument("--tile-size", type=int, default=32)
    ap.add_argument("--train-steps", type=int, default=20)
    ap.add_argument("--smoke", action="store_true",
                    help="CI sizes: 4 slides x 24 spots, 3 train steps")
    ap.add_argument("--out", default="reports/e2e_rehearsal.json")
    # in-process platform forcing for the train/eval stages: the env var
    # alone is IGNORED once sitecustomize registers the axon TPU backend,
    # and with the tunnel down the subprocess hangs forever (CLAUDE.md)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()
    if args.smoke:
        args.slides, args.spots, args.genes, args.hvgs = 4, 24, 32, 16
        args.train_steps = 3

    import tempfile

    work = Path(args.workdir) if args.workdir else Path(
        tempfile.mkdtemp(prefix="rehearsal_")
    )
    work.mkdir(parents=True, exist_ok=True)
    report = {"sizes": {"slides": args.slides, "spots_per_slide": args.spots,
                        "genes": args.genes}}

    # ---- 1. raw data ------------------------------------------------------
    raw = work / "raw"
    print(f"[1/6] synthesizing {args.slides} slides x {args.spots} spots ...",
          flush=True)
    genes, total_spots = make_raw_hest(raw, args.slides, args.spots, args.genes)
    hvg_path = work / "global_hvgs.txt"
    hvg_path.write_text("\n".join(genes[: args.hvgs]))
    hgnc = work / "hgnc.txt"
    hgnc.write_text("symbol\tstatus\talias_symbol\n"
                    + "\n".join(f"{g}\tApproved\t" for g in genes))

    # ---- 2. 3-stage preprocessing (timed) ---------------------------------
    out_dir = work / "processed"
    inter = work / "intermediate"
    cfg = {
        "dataset": {"key": "rehearsal", "description": "e2e rehearsal"},
        "source": {"raw_data_dir": str(raw), "hgnc_path": str(hgnc),
                   "global_hvg_path": str(hvg_path)},
        "intermediate_dir": str(inter),
        "output_dir": str(out_dir),
        "run": {"stage": "full"},
        "params": {
            "general": {"batch_key": "sample_id",
                        "species_filter": "Homo sapiens"},
            "samples_to_exclude": [],
            "gene_alignment": {"keep_status": ["Approved"],
                               "keep_locus_types": None},
            "sentence_generation": {"n_top_genes": 16},
            "sharding": {"max_samples_per_shard": 256},
            "tiling": {"tile_size": args.tile_size},
        },
        "performance": {"max_workers": 1, "limit_samples": -1},
    }
    from spatial_clip_tpu.data.preprocessing.entry import run as preprocess_run

    print("[2/6] running 3-stage preprocessing ...", flush=True)
    t0 = time.perf_counter()
    stats = preprocess_run(cfg)
    dt = time.perf_counter() - t0
    assert stats["total_failed"] == 0, stats
    manifest = json.loads((out_dir / "manifest.json").read_text())
    report["preprocess"] = {
        "seconds": round(dt, 2),
        "spots_per_sec": round(stats["total_processed"] / dt, 1),
        "total_processed": stats["total_processed"],
        "shard_count": manifest["outputs"]["shard_count"],
    }
    print(f"      {stats['total_processed']} spots in {dt:.1f}s = "
          f"{report['preprocess']['spots_per_sec']} spots/sec", flush=True)

    # ---- 3. shard-replay validation ---------------------------------------
    print("[3/6] shard-replay validation ...", flush=True)
    # the validator walks <dataset_root>/<SAMPLE_ID>/*.tar and replays
    # against the STAGE-2 adata (the matrix the shards were written from)
    adata_path = inter / "adata_final_for_sharding.h5ad"
    if not adata_path.exists():
        adata_path = next(Path(inter).glob("*.h5ad"))
    val_report = work / "shard_validation.json"
    rc = subprocess.run(
        [sys.executable, str(REPO / "scripts/validate_sharded_dataset.py"),
         "--dataset-dir", str(out_dir),
         "--adata", str(adata_path),
         "--n-top-genes", "16",
         "--report", str(val_report)],
        capture_output=True, text=True, timeout=900,
    )
    assert rc.returncode == 0, rc.stdout + rc.stderr
    report["shard_validation"] = json.loads(val_report.read_text())
    assert report["shard_validation"]["total_spots_checked"] == stats["total_processed"], (
        "shard validator must replay every written spot: "
        f"{report['shard_validation']}"
    )
    assert report["shard_validation"]["validity_pct"] == 100.0, (
        f"shard replay mismatches: {report['shard_validation']}"
    )
    print(f"      {report['shard_validation']['total_spots_checked']} spots "
          f"replayed, {report['shard_validation']['validity_pct']}% valid",
          flush=True)

    # ---- 4. gap statistics --------------------------------------------------
    print("[4/6] gap statistics ...", flush=True)
    rc = subprocess.run(
        [sys.executable, str(REPO / "scripts/compute_gap_statistics.py"),
         "--raw-dir", str(raw), "--patch-size", str(args.tile_size),
         "--out-dir", str(work / "gap_stats")],
        capture_output=True, text=True, timeout=900,
    )
    assert rc.returncode == 0, rc.stdout + rc.stderr
    gap_files = list((work / "gap_stats").glob("*.json"))
    if gap_files:
        report["gap_statistics"] = json.loads(gap_files[0].read_text())

    # ---- 5. training smoke on the produced shards --------------------------
    print("[5/6] train.py on the shards ...", flush=True)
    ids = manifest["outputs"]["sample_dirs"]
    n_val = max(1, len(ids) // 5)
    (out_dir / "train.txt").write_text("\n".join(ids[:-n_val]))
    (out_dir / "val.txt").write_text("\n".join(ids[-n_val:]))
    run_dir = work / "run"
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    # shared by the train AND eval stages (dataset/model/platform identity)
    shared_overrides = [
        "experiment=smoke_shards",
        f"trainer.platform={args.platform}",
        f"data.data_dir={out_dir}",
        "data.batch_size=16",
        "data.k_neighbors=3",
        "data.num_workers=0",
        "model.model_name=ViT-Test",
        "model.precision=fp32",
        "model.aug_cfg=null",
    ]
    train_overrides = shared_overrides + [
        f"trainer.total_steps={args.train_steps}",
        f"trainer.limit_batches={args.train_steps}",
        "trainer.epochs=1",
        "trainer.log_every=1",
        "scheduler.warmup_steps=2",
        "save_ckpt=true",
        f"paths.output_dir={run_dir}",
        "name=rehearsal",
    ]
    rc = subprocess.run(
        [sys.executable, str(REPO / "train.py"), *train_overrides],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800,
    )
    assert rc.returncode == 0, rc.stdout[-3000:] + rc.stderr[-3000:]
    results = run_dir / "results.jsonl"
    if results.exists():
        lines = [json.loads(ln) for ln in results.read_text().splitlines() if ln]
        if lines:
            report["train"] = lines[-1]

    # ---- 6. eval.py restoring the checkpoint -------------------------------
    print("[6/6] eval.py restore + retrieval suite ...", flush=True)
    ckpts = run_dir / "checkpoints"
    rc = subprocess.run(
        [sys.executable, str(REPO / "eval.py"),
         *shared_overrides,
         f"ckpt_path={ckpts}",
         f"paths.output_dir={work / 'eval'}",
         "name=rehearsal_eval"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800,
    )
    assert rc.returncode == 0, rc.stdout[-3000:] + rc.stderr[-3000:]
    eval_results = work / "eval" / "eval_results.json"
    if not eval_results.exists():
        eval_results = next((work / "eval").glob("*.json"), None)
    if eval_results:
        report["eval"] = json.loads(Path(eval_results).read_text())

    out_path = REPO / args.out if not Path(args.out).is_absolute() else Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(report, indent=2, default=float))
    print(json.dumps(report.get("preprocess"), indent=2))
    print(f"report -> {out_path}")


if __name__ == "__main__":
    main()
