"""Three-stage offline preprocessing pipeline.

Rebuild of the missing ``src/data/preprocessing/pipeline.py`` from its
contract (tests/test_preprocess.py:52-103, docs/data_pipeline.md:39-113,
configs/preprocess/default.yaml):

- **Stage 1 — merge & align**: enumerate HEST samples (species filter,
  exclusions, limit), load each AnnData, HGNC-align/collapse gene symbols,
  concatenate -> ``<intermediate_dir>/adata_aligned_unfiltered.h5ad``.
- **Stage 2 — normalize & HVG filter**: subset to the global HVG list,
  normalize -> ``<intermediate_dir>/adata_final_for_sharding.h5ad``.
- **Stage 3 — shard**: per-sample worker pool crops tiles, generates gene
  sentences, writes webdataset-layout tars + per-sample json, then emits
  ``manifest.json`` with resolved config, input fingerprints, git state,
  timing, and output statistics.

All stages are idempotent (existing outputs are skipped).
"""
from __future__ import annotations

import getpass
import hashlib
import io
import json
import logging
import platform
import subprocess
import tarfile
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Dict, List

import numpy as np
from PIL import Image

from spatial_clip_tpu.config.dotdict import DotDict
from spatial_clip_tpu.data.spaglam.anndata_lite import AnnDataLite, concat_anndata
from spatial_clip_tpu.data.spaglam.gene_encoder import batch_gene_sentences
from spatial_clip_tpu.data.spaglam.hest_loading import HESTDataset, HESTSample
from spatial_clip_tpu.data.spaglam.image_tiler import ImageHandler
from spatial_clip_tpu.data.preprocessing.utils import (
    align_and_collapse_genes,
    get_spot_coordinates,
    load_hgnc_resources,
    load_single_sample_adata,
    normalize_adata,
)

log = logging.getLogger(__name__)

ALIGNED_NAME = "adata_aligned_unfiltered.h5ad"
FINAL_NAME = "adata_final_for_sharding.h5ad"


def _cfg(cfg) -> DotDict:
    return DotDict.wrap(cfg if isinstance(cfg, dict) else dict(cfg))


# ---------------------------------------------------------------------- stage 1
def stage_01_merge_and_align(cfg) -> Dict[str, Any]:
    cfg = _cfg(cfg)
    out_dir = Path(cfg.intermediate_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    target = out_dir / ALIGNED_NAME
    if target.exists():
        log.info("Stage 1 output exists, skipping: %s", target)
        return {"output": str(target), "skipped": True}

    t0 = time.time()
    dataset = HESTDataset(cfg.source.raw_data_dir)
    species = cfg.get_path("params.general.species_filter")
    samples = dataset.get_samples(species=species)
    excluded = set(cfg.get_path("params.samples_to_exclude", []) or [])
    samples = [s for s in samples if s.sample_id not in excluded]
    limit = int(cfg.get_path("performance.limit_samples", -1) or -1)
    if limit > 0:
        samples = samples[:limit]
    if not samples:
        raise ValueError("Stage 1: no samples matched the filters")

    keep_status = cfg.get_path("params.gene_alignment.keep_status")
    keep_locus = cfg.get_path("params.gene_alignment.keep_locus_types")
    approved, alias_map = load_hgnc_resources(
        cfg.source.hgnc_path, keep_status=keep_status, keep_locus_types=keep_locus
    )

    batch_key = cfg.get_path("params.general.batch_key", "sample_id")
    adatas = []
    for s in samples:
        a = load_single_sample_adata(s, batch_key=batch_key)
        a = align_and_collapse_genes(a, approved, alias_map)
        adatas.append(a)
    merged = adatas[0] if len(adatas) == 1 else concat_anndata(adatas, join="outer")
    merged.write_h5ad(target)
    log.info(
        "Stage 1: merged %d samples -> %s (%d spots x %d genes) in %.1fs",
        len(adatas), target, merged.n_obs, merged.n_vars, time.time() - t0,
    )
    return {
        "output": str(target),
        "n_samples": len(adatas),
        "n_obs": merged.n_obs,
        "n_vars": merged.n_vars,
    }


# ---------------------------------------------------------------------- stage 2
def stage_02_normalize_and_filter(cfg) -> Dict[str, Any]:
    cfg = _cfg(cfg)
    inter = Path(cfg.intermediate_dir)
    source = inter / ALIGNED_NAME
    target = inter / FINAL_NAME
    if target.exists():
        log.info("Stage 2 output exists, skipping: %s", target)
        return {"output": str(target), "skipped": True}
    if not source.exists():
        raise FileNotFoundError(f"Missing input for Stage 2: {source} (run stage-1)")

    adata = AnnDataLite.read_h5ad(source)
    hvg_path = Path(cfg.source.global_hvg_path)
    if hvg_path.exists():
        hvgs = [line.strip() for line in hvg_path.read_text().splitlines() if line.strip()]
        present = [g for g in hvgs if g in set(map(str, adata.var_names))]
        if present:
            adata = adata.subset_var(present)
        else:
            log.warning("Stage 2: no HVG overlap with var_names; keeping all genes")
    normalize_adata(adata)
    adata.write_h5ad(target)
    log.info("Stage 2: %s (%d spots x %d genes)", target, adata.n_obs, adata.n_vars)
    return {"output": str(target), "n_obs": adata.n_obs, "n_vars": adata.n_vars}


# ---------------------------------------------------------------------- stage 3
def _open_sample_image(sample_id: str, adata_sample: AnnDataLite, cfg) -> ImageHandler:
    tile_size = int(cfg.get_path("params.tiling.tile_size", 224))
    raw_dir = Path(cfg.source.raw_data_dir)
    sample = HESTSample(sample_id=sample_id, root=raw_dir)
    if sample.wsi_path or sample.thumbnail_path:
        return sample.open_image(tile_size=tile_size)
    return ImageHandler(adata_sample, tile_size=tile_size)  # embedded/blank


def _process_one_sample(sample_id: str, adata_sample: AnnDataLite, cfg) -> Dict[str, int]:
    """Tile + sentence + tar-shard one sample (worker body; per-spot failures
    are isolated and counted, ref: dataset_writer.py:167-169,286-289)."""
    cfg = _cfg(cfg)
    out_dir = Path(cfg.output_dir) / sample_id
    out_dir.mkdir(parents=True, exist_ok=True)
    tile_size = int(cfg.get_path("params.tiling.tile_size", 224))
    overrides = cfg.get_path("params.tiling.tile_size_overrides", {}) or {}
    tech_col = cfg.get_path("params.tiling.technology_column", "st_technology")
    if tech_col in adata_sample.obs.columns and len(adata_sample.obs):
        tech = str(adata_sample.obs[tech_col].iloc[0])
        tile_size = int(overrides.get(tech, tile_size))
    n_top = int(cfg.get_path("params.sentence_generation.n_top_genes", 50))
    max_per_shard = int(cfg.get_path("params.sharding.max_samples_per_shard", 5000))
    # 'npy' stores raw uint8 tiles: ~5x faster training-time loading (no PNG
    # decode on the host hot path) at ~1.5x the bytes
    tile_format = cfg.get_path("params.tiling.tile_format", "png")

    try:
        coords = get_spot_coordinates(adata_sample)
    except KeyError:
        coords = np.zeros((adata_sample.n_obs, 2))
    sentences = batch_gene_sentences(
        adata_sample.X, list(map(str, adata_sample.var_names)), n_top
    )
    handler = _open_sample_image(sample_id, adata_sample, cfg)

    processed = failed = 0
    shard_idx = 0
    tar = None
    try:
        for i in range(adata_sample.n_obs):
            if processed % max_per_shard == 0:
                if tar is not None:
                    tar.close()
                tar = tarfile.open(out_dir / f"{sample_id}_{shard_idx:06d}.tar", "w")
                shard_idx += 1
            try:
                x, y = float(coords[i, 0]), float(coords[i, 1])
                tile = handler.get_tile(x, y, tile_size)
                buf = io.BytesIO()
                if tile_format == "npy":
                    np.save(buf, tile)
                    img_ext = "npy"
                else:
                    Image.fromarray(tile).save(buf, format="PNG")
                    img_ext = "png"
                key = f"{sample_id}_{i:06d}"
                meta = json.dumps({"sample_id": sample_id, "x": x, "y": y}).encode()
                for ext, payload in (
                    (img_ext, buf.getvalue()),
                    ("txt", sentences[i].encode("utf-8")),
                    ("json", meta),
                ):
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(payload)
                    tar.addfile(info, io.BytesIO(payload))
                processed += 1
            except Exception as e:  # isolate per-spot failures
                failed += 1
                if failed <= 3:
                    log.warning("spot %s[%d] failed: %s", sample_id, i, e)
    finally:
        if tar is not None:
            tar.close()
        handler.close()

    (out_dir / f"{sample_id}.json").write_text(
        json.dumps(
            {
                "sample_id": sample_id,
                "spots": int(adata_sample.n_obs),
                "processed": processed,
                "failed": failed,
                "tile_size": tile_size,
                "shards": shard_idx,
            }
        )
    )
    return {"processed": processed, "failed": failed}


def _sha256_file(path: Path, limit: int = 1 << 24) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        h.update(f.read(limit))
    return h.hexdigest()


def _fingerprint_dir(path: Path) -> str:
    h = hashlib.sha256()
    if path.exists():
        for p in sorted(path.rglob("*"))[:2000]:
            if p.is_file():
                st = p.stat()
                h.update(f"{p.relative_to(path)}:{st.st_size}".encode())
    return h.hexdigest()


def _git_state() -> Dict[str, Any]:
    def run(*args):
        try:
            return subprocess.run(
                ["git", *args], capture_output=True, text=True, timeout=10
            ).stdout.strip()
        except Exception:
            return ""

    return {
        "commit": run("rev-parse", "HEAD"),
        "dirty": bool(run("status", "--porcelain")),
    }


def stage_03_create_shards(cfg) -> Dict[str, Any]:
    cfg = _cfg(cfg)
    inter = Path(cfg.intermediate_dir)
    source = inter / FINAL_NAME
    out_dir = Path(cfg.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if not source.exists():
        raise FileNotFoundError(f"Missing input for Stage 3: {source} (run stage-1/2)")

    t0 = time.time()
    adata = AnnDataLite.read_h5ad(source)
    batch_key = cfg.get_path("params.general.batch_key", "sample_id")
    if batch_key not in adata.obs.columns:
        raise KeyError(f"Stage 3: obs is missing batch key '{batch_key}'")
    sample_ids = adata.obs[batch_key].astype(str)
    groups = {sid: np.nonzero((sample_ids == sid).to_numpy())[0] for sid in sample_ids.unique()}

    max_workers = int(cfg.get_path("performance.max_workers", 8) or 1)
    per_sample: Dict[str, Dict[str, int]] = {}
    with ThreadPoolExecutor(max_workers=max(1, max_workers)) as pool:
        futs = {
            sid: pool.submit(_process_one_sample, sid, adata.subset_obs(rows), cfg)
            for sid, rows in groups.items()
        }
        for sid, fut in futs.items():
            per_sample[sid] = fut.result()

    elapsed = time.time() - t0
    stats = {
        "total_processed": int(sum(v["processed"] for v in per_sample.values())),
        "total_failed": int(sum(v["failed"] for v in per_sample.values())),
        "per_sample": per_sample,
        "spots_per_sec": (
            round(sum(v["processed"] for v in per_sample.values()) / elapsed, 2)
            if elapsed > 0
            else 0.0
        ),
    }
    shards = sorted(out_dir.rglob("*.tar"))
    sample_dirs = sorted({p.parent.name for p in shards})
    manifest = {
        "dataset": cfg.get_path("dataset.key", ""),
        "description": cfg.get_path("dataset.description", ""),
        "config": cfg.to_dict() if isinstance(cfg, DotDict) else dict(cfg),
        "fingerprints": {
            "raw_data_dir": _fingerprint_dir(Path(cfg.source.raw_data_dir)),
            "global_hvg_sha256": (
                _sha256_file(Path(cfg.source.global_hvg_path))
                if Path(cfg.source.global_hvg_path).exists()
                else None
            ),
            "hgnc_sha256": (
                _sha256_file(Path(cfg.source.hgnc_path))
                if Path(cfg.source.hgnc_path).exists()
                else None
            ),
        },
        "git": _git_state(),
        "host": {"hostname": platform.node(), "user": getpass.getuser()},
        "timing": {"elapsed_sec": round(elapsed, 2), "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S")},
        "stats": stats,
        "outputs": {
            "shard_count": len(shards),
            "sample_dirs": sample_dirs,
            "total_bytes": int(sum(p.stat().st_size for p in shards)),
        },
    }
    manifest_path = out_dir / "manifest.json"
    manifest_path.write_text(json.dumps(manifest, indent=2, default=str))
    log.info(
        "Stage 3: %d shards, %d spots (%.1f spots/sec) -> %s",
        len(shards), stats["total_processed"], stats["spots_per_sec"], manifest_path,
    )
    return {**stats, "manifest_path": str(manifest_path)}
