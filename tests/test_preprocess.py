"""Preprocessing pipeline tests.

Part 1 ports the reference's monkeypatched smoke contract
(ref: tests/test_preprocess.py:17-103); part 2 runs the REAL stage 1-3 path
on synthetic h5ad data with an embedded image and round-trips the produced
shards through ShardedSpatialDataset.
"""
from __future__ import annotations

import json
import tarfile
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pandas as pd
import pytest

from spatial_clip_tpu.config.dotdict import DotDict
from spatial_clip_tpu.data.preprocessing import entry as hydra_entry
from spatial_clip_tpu.data.preprocessing import pipeline
from spatial_clip_tpu.data.spaglam.anndata_lite import AnnDataLite


@pytest.fixture()
def smoke_cfg(tmp_path):
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    hvgs = tmp_path / "global_hvgs.txt"
    hvgs.write_text("g1\ng2\ng3\n")
    hgnc = tmp_path / "hgnc.txt"
    hgnc.write_text("symbol\talias\n")
    return DotDict.wrap(
        {
            "dataset": {"key": "smoke_ds", "description": "Synthetic test dataset"},
            "source": {
                "raw_data_dir": str(raw_dir),
                "hgnc_path": str(hgnc),
                "global_hvg_path": str(hvgs),
            },
            "intermediate_dir": str(tmp_path / "processed_intermediate"),
            "output_dir": str(tmp_path / "processed"),
            "params": {
                "general": {"batch_key": "sample_id", "species_filter": "test"},
                "samples_to_exclude": [],
                "gene_alignment": {"keep_status": ["Approved"], "keep_locus_types": None},
                "sentence_generation": {"n_top_genes": 3},
                "sharding": {"max_samples_per_shard": 10},
                "tiling": {"tile_size": 32},
            },
            "performance": {"max_workers": 1, "limit_samples": -1},
        }
    )


def test_pipeline_emits_manifest(tmp_path, smoke_cfg, monkeypatch):
    class DummyDataset:
        def __init__(self, data_dir, metadata_csv=None):
            self.data_dir = data_dir

        def get_samples(self, species=None, **kw):
            return [SimpleNamespace(sample_id="sample_a"), SimpleNamespace(sample_id="sample_b")]

    def fake_load_single_sample_adata(sample, batch_key):
        adata = AnnDataLite(np.array([[1, 0, 0], [0, 1, 0]], dtype=float))
        adata.var_names = ["g1", "g2", "g3"]
        adata.obs_names = [f"{sample.sample_id}_0", f"{sample.sample_id}_1"]
        adata.obs[batch_key] = [sample.sample_id] * adata.n_obs
        return adata

    def fake_process_one_sample(sample_id, adata_sample, cfg):
        sample_dir = Path(cfg.output_dir) / sample_id
        sample_dir.mkdir(parents=True, exist_ok=True)
        (sample_dir / f"{sample_id}_000000.tar").write_bytes(b"dummy")
        (sample_dir / f"{sample_id}.json").write_text(
            json.dumps({"spots": int(adata_sample.n_obs)})
        )
        return {"processed": int(adata_sample.n_obs), "failed": 0}

    monkeypatch.setattr(pipeline, "HESTDataset", DummyDataset)
    monkeypatch.setattr(pipeline, "load_single_sample_adata", fake_load_single_sample_adata)
    monkeypatch.setattr(pipeline, "align_and_collapse_genes", lambda a, *_, **__: a)
    monkeypatch.setattr(pipeline, "load_hgnc_resources", lambda *_, **__: ({"g1", "g2", "g3"}, {}))
    monkeypatch.setattr(pipeline, "normalize_adata", lambda _a: None)
    monkeypatch.setattr(pipeline, "_process_one_sample", fake_process_one_sample)

    pipeline.stage_01_merge_and_align(smoke_cfg)
    pipeline.stage_02_normalize_and_filter(smoke_cfg)
    stats = pipeline.stage_03_create_shards(smoke_cfg)

    manifest_path = Path(smoke_cfg.output_dir) / "manifest.json"
    assert manifest_path.exists()
    manifest = json.loads(manifest_path.read_text())
    assert manifest["stats"]["total_processed"] == stats["total_processed"]
    assert manifest["outputs"]["shard_count"] == 2
    assert set(manifest["outputs"]["sample_dirs"]) == {"sample_a", "sample_b"}


# -------------------------------------------------------------- entry dispatch
def test_run_executes_all_stages_for_full_pipeline(monkeypatch):
    call_order = []

    def fake(name, suffix):
        def impl(_cfg):
            call_order.append(name)
            return {"manifest_path": f"/tmp/{suffix}"}

        return impl

    monkeypatch.setitem(hydra_entry._STAGE_FUNCS, "stage_1", fake("stage_1", "s1.json"))
    monkeypatch.setitem(hydra_entry._STAGE_FUNCS, "stage_2", fake("stage_2", "s2.json"))
    monkeypatch.setitem(hydra_entry._STAGE_FUNCS, "stage_3", fake("stage_3", "s3.json"))
    result = hydra_entry.run({"run": {"stage": "full-pipeline"}})
    assert call_order == ["stage_1", "stage_2", "stage_3"]
    assert result == {"manifest_path": "/tmp/s3.json"}


def test_run_accepts_comma_separated_stage_list(monkeypatch):
    call_order = []
    monkeypatch.setitem(
        hydra_entry._STAGE_FUNCS, "stage_2", lambda _c: call_order.append("stage_2")
    )
    monkeypatch.setitem(
        hydra_entry._STAGE_FUNCS, "stage_3", lambda _c: call_order.append("stage_3")
    )
    hydra_entry.run({"run": {"stage": "stage-2, stage-3"}})
    assert call_order == ["stage_2", "stage_3"]


def test_run_raises_for_unknown_stage():
    with pytest.raises(ValueError):
        hydra_entry.run({"run": {"stage": "unknown"}})


def test_cli_invokes_entry(monkeypatch):
    from spatial_clip_tpu.data.preprocessing import cli

    captured = {}

    def fake_invoke(config_name, config_path, stage, overrides):
        captured.update(
            config_name=config_name, config_path=config_path, stage=stage,
            overrides=overrides,
        )

    monkeypatch.setattr(cli, "_invoke_hydra_process", fake_invoke)
    cli.main(
        ["--config-name", "preprocess/hest_mouse.yaml", "--config-path", "configs",
         "-o", "extras.print_config=false", "stage-2"]
    )
    assert captured == {
        "config_name": "preprocess/hest_mouse.yaml",
        "config_path": "configs",
        "stage": "stage-2",
        "overrides": ["extras.print_config=false"],
    }


# ------------------------------------------------------- real integration run
def _make_raw_hest(tmp_path: Path, sample_ids=("S1", "S2"), n_spots=6, n_genes=8):
    """Synthetic HEST-layout raw dir: metadata CSV + st/*.h5ad with coords
    and an embedded spatial image."""
    raw = tmp_path / "raw"
    (raw / "st").mkdir(parents=True)
    rng = np.random.default_rng(0)
    genes = [f"G{i}" for i in range(n_genes)]
    rows = []
    for sid in sample_ids:
        X = rng.poisson(2.0, (n_spots, n_genes)).astype(float)
        obs = pd.DataFrame(
            {
                "pxl_col_in_fullres": rng.uniform(40, 200, n_spots),
                "pxl_row_in_fullres": rng.uniform(40, 200, n_spots),
            },
            index=[f"{sid}_{i}" for i in range(n_spots)],
        )
        var = pd.DataFrame(index=pd.Index(genes))
        img = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
        adata = AnnDataLite(
            X=X, obs=obs, var=var,
            uns={"spatial": {sid: {"images": {"hires": img}}}},
        )
        adata.write_h5ad(raw / "st" / f"{sid}.h5ad")
        rows.append({"id": sid, "species": "Homo sapiens", "organ": "Lung",
                     "st_technology": "Visium"})
    pd.DataFrame(rows).to_csv(raw / "HEST_v1_1_0.csv", index=False)
    return raw, genes


def test_full_pipeline_real_integration(tmp_path):
    raw, genes = _make_raw_hest(tmp_path)
    hvg = tmp_path / "hvgs.txt"
    hvg.write_text("\n".join(genes[:6]))
    hgnc = tmp_path / "hgnc.txt"
    hgnc.write_text(
        "symbol\tstatus\talias_symbol\n"
        + "\n".join(f"{g}\tApproved\t" for g in genes)
    )
    cfg = {
        "dataset": {"key": "it_ds", "description": "integration"},
        "source": {
            "raw_data_dir": str(raw),
            "hgnc_path": str(hgnc),
            "global_hvg_path": str(hvg),
        },
        "intermediate_dir": str(tmp_path / "inter"),
        "output_dir": str(tmp_path / "out"),
        "run": {"stage": "full"},
        "params": {
            "general": {"batch_key": "sample_id", "species_filter": "Homo sapiens"},
            "samples_to_exclude": [],
            "gene_alignment": {"keep_status": ["Approved"], "keep_locus_types": None},
            "sentence_generation": {"n_top_genes": 4},
            "sharding": {"max_samples_per_shard": 4},
            "tiling": {"tile_size": 32},
        },
        "performance": {"max_workers": 2, "limit_samples": -1},
    }
    from spatial_clip_tpu.data.preprocessing.entry import run

    stats = run(cfg)
    assert stats["total_processed"] == 12
    assert stats["total_failed"] == 0

    out = tmp_path / "out"
    manifest = json.loads((out / "manifest.json").read_text())
    # 6 spots / 4-per-shard -> 2 shards per sample
    assert manifest["outputs"]["shard_count"] == 4
    assert manifest["fingerprints"]["global_hvg_sha256"]

    # shard contents replay: coordinates + sentence derived from HVG subset
    with tarfile.open(next((out / "S1").glob("*.tar"))) as tf:
        names = tf.getnames()
        assert any(n.endswith(".png") for n in names)
        meta = json.loads(tf.extractfile([n for n in names if n.endswith(".json")][0]).read())
        assert meta["sample_id"] == "S1"
        txt = tf.extractfile([n for n in names if n.endswith(".txt")][0]).read().decode()
        assert all(tok in genes[:6] for tok in txt.split())

    # idempotency: re-run skips stages 1-2 without error
    from spatial_clip_tpu.data.preprocessing.pipeline import (
        stage_01_merge_and_align,
        stage_02_normalize_and_filter,
    )

    assert stage_01_merge_and_align(cfg).get("skipped")
    assert stage_02_normalize_and_filter(cfg).get("skipped")

    # training-side round trip over the produced shards
    from spatial_clip_tpu.data.datasets import ShardedSpatialDataset

    ds = ShardedSpatialDataset(
        dataset_root=out, split="train", sample_ids=["S1", "S2"], k_neighbors=3,
        preprocess_fn=None,
        tokenizer=None,
        cache_dir=out / ".cache", rebuild_cache=True,
    )
    assert len(ds) == 12
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert len(item["neighbor_tile_ids"]) == 3


def test_stage3_npy_tile_format(tmp_path):
    """tile_format=npy stores raw uint8 tiles; the shard backend reads them."""
    raw, genes = _make_raw_hest(tmp_path, sample_ids=("S1",), n_spots=4, n_genes=5)
    hvg = tmp_path / "hvgs.txt"
    hvg.write_text("\n".join(genes))
    hgnc = tmp_path / "hgnc.txt"
    hgnc.write_text("symbol\tstatus\n" + "\n".join(f"{g}\tApproved" for g in genes))
    cfg = {
        "dataset": {"key": "npy_ds", "description": ""},
        "source": {"raw_data_dir": str(raw), "hgnc_path": str(hgnc),
                   "global_hvg_path": str(hvg)},
        "intermediate_dir": str(tmp_path / "inter"),
        "output_dir": str(tmp_path / "out"),
        "run": {"stage": "full"},
        "params": {
            "general": {"batch_key": "sample_id", "species_filter": None},
            "samples_to_exclude": [],
            "gene_alignment": {"keep_status": ["Approved"], "keep_locus_types": None},
            "sentence_generation": {"n_top_genes": 3},
            "sharding": {"max_samples_per_shard": 10},
            "tiling": {"tile_size": 16, "tile_format": "npy"},
        },
        "performance": {"max_workers": 1, "limit_samples": -1},
    }
    from spatial_clip_tpu.data.preprocessing.entry import run

    stats = run(cfg)
    assert stats["total_processed"] == 4
    from spatial_clip_tpu.data.datasets import ShardedSpatialDataset

    ds = ShardedSpatialDataset(
        dataset_root=tmp_path / "out", split="t", sample_ids=["S1"],
        k_neighbors=2, rebuild_cache=True,
    )
    item = ds[0]
    assert item["image"].shape == (16, 16, 3)
    assert item["image"].dtype == np.uint8
