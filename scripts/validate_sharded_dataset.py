#!/usr/bin/env python
"""Shard replay validator (ref: scripts/validate_sharded_dataset.py:29-399).

Replays every shard against the Stage-2 AnnData
(``adata_final_for_sharding.h5ad``): coordinates must match within a pixel
tolerance and the stored gene sentence must equal the top-k replay from the
expression matrix. Writes a JSON report.

    python scripts/validate_sharded_dataset.py \
        --dataset-dir data/processed/hest_v1 \
        --adata data/processed_intermediate/hest_v1/adata_final_for_sharding.h5ad
"""
from __future__ import annotations

import argparse
import json
import sys
import tarfile
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np  # noqa: E402


@dataclass
class SampleReport:
    sample_id: str
    n_spots: int = 0
    n_checked: int = 0
    coord_mismatches: int = 0
    sentence_mismatches: int = 0
    errors: List[str] = field(default_factory=list)

    @property
    def valid(self) -> bool:
        return (
            self.n_checked > 0
            and not self.coord_mismatches
            and not self.sentence_mismatches
            and not self.errors
        )


def validate(
    dataset_dir: Path,
    adata_path: Path,
    n_top_genes: int = 50,
    coord_tol: float = 1.5,
    batch_key: str = "sample_id",
) -> Dict:
    from spatial_clip_tpu.data.preprocessing.utils import get_spot_coordinates
    from spatial_clip_tpu.data.spaglam.anndata_lite import AnnDataLite
    from spatial_clip_tpu.data.spaglam.gene_encoder import generate_gene_sentence

    adata = AnnDataLite.read_h5ad(adata_path)
    sample_col = adata.obs[batch_key].astype(str).to_numpy()
    coords = get_spot_coordinates(adata)
    gene_names = list(map(str, adata.var_names))

    # index rows per sample in obs order (stage-3 enumerates obs order)
    rows_per_sample: Dict[str, List[int]] = {}
    for i, sid in enumerate(sample_col):
        rows_per_sample.setdefault(sid, []).append(i)

    reports: Dict[str, SampleReport] = {}
    for sample_dir in sorted(p for p in dataset_dir.iterdir() if p.is_dir()):
        sid = sample_dir.name
        if sid.startswith("."):
            continue
        rep = SampleReport(sample_id=sid, n_spots=len(rows_per_sample.get(sid, [])))
        reports[sid] = rep
        rows = rows_per_sample.get(sid)
        if rows is None:
            rep.errors.append("sample not present in AnnData")
            continue
        for tar_path in sorted(sample_dir.glob("*.tar")):
            with tarfile.open(tar_path) as tf:
                members: Dict[str, Dict[str, tarfile.TarInfo]] = {}
                for m in tf.getmembers():
                    stem, _, ext = m.name.rpartition(".")
                    members.setdefault(stem, {})[ext] = m
                for key in sorted(members):
                    grp = members[key]
                    if "json" not in grp or "txt" not in grp:
                        continue
                    try:
                        idx_local = int(key.rsplit("_", 1)[1])
                        row = rows[idx_local]
                        meta = json.loads(tf.extractfile(grp["json"]).read())
                        dx = abs(float(meta["x"]) - coords[row, 0])
                        dy = abs(float(meta["y"]) - coords[row, 1])
                        if dx > coord_tol or dy > coord_tol:
                            rep.coord_mismatches += 1
                        stored = tf.extractfile(grp["txt"]).read().decode()
                        expect = generate_gene_sentence(
                            adata.X_row(row), gene_names, n_top_genes
                        )
                        if stored != expect:
                            rep.sentence_mismatches += 1
                        rep.n_checked += 1
                    except Exception as e:  # keep scanning on per-spot errors
                        rep.errors.append(f"{key}: {e}")

    total = sum(r.n_checked for r in reports.values())
    ok = sum(r.n_checked for r in reports.values() if r.valid)
    return {
        "dataset_dir": str(dataset_dir),
        "adata": str(adata_path),
        "total_spots_checked": total,
        "validity_pct": round(100.0 * ok / total, 2) if total else 0.0,
        "samples": {
            sid: {
                "n_spots": r.n_spots,
                "n_checked": r.n_checked,
                "coord_mismatches": r.coord_mismatches,
                "sentence_mismatches": r.sentence_mismatches,
                "valid": r.valid,
                "errors": r.errors[:5],
            }
            for sid, r in reports.items()
        },
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-dir", type=Path, required=True)
    ap.add_argument("--adata", type=Path, required=True)
    ap.add_argument("--n-top-genes", type=int, default=50)
    ap.add_argument("--coord-tol", type=float, default=1.5)
    ap.add_argument("--report", type=Path, default=None)
    args = ap.parse_args(argv)
    report = validate(args.dataset_dir, args.adata, args.n_top_genes, args.coord_tol)
    out = args.report or (args.dataset_dir / "validation_report.json")
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps({k: v for k, v in report.items() if k != "samples"}, indent=2))
    return report


if __name__ == "__main__":
    main()
