"""HEST v1.1.0 artifact-schema contract test (round-4 verdict #8).

Builds a fixture replicating the REAL HEST v1.1.0 layout — exact metadata
CSV columns, per-sample QC json, patches h5 dir, transcripts parquet,
spatial_plots png, and both spot-coordinate conventions
(obs.pxl_{col,row}_in_fullres vs obsm['spatial']) — and drives
HESTDataset -> stage-1 -> stage-3 over it.

Schema source: /root/reference/src/spaglam_preproc/utils/hest_loading.py:
16-321 (HESTSample artifacts), :322-546 (HESTDataset CSV columns + QC
merge), utils/anndata_utils.py:5-34 (coordinate preference order).
"""
import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from spatial_clip_tpu.data.spaglam.anndata_lite import AnnDataLite
from spatial_clip_tpu.data.spaglam.hest_loading import HESTDataset

# exact column set of HEST_v1_1_0.csv as read by the reference
# (hest_loading.py:377-404 query filters + :144-188 metadata fields)
HEST_CSV_COLUMNS = [
    "id", "organ", "oncotree_code", "disease_state", "species",
    "st_technology", "preservation_method", "nb_genes",
    "data_publication_date", "license", "tissue", "subseries",
    "spots_under_tissue", "inter_spot_dist", "spot_diameter",
    "pixel_size_um_embedded", "pixel_size_um_estimated",
    "fullres_px_width", "fullres_px_height",
]


def _make_hest_v110(tmp_path: Path, n_spots=6, n_genes=8):
    raw = tmp_path / "hest_v1_1_0"
    for sub in ("st", "wsis", "patches", "transcripts", "metadata",
                "spatial_plots", "thumbnails"):
        (raw / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    genes = [f"G{i}" for i in range(n_genes)]
    img = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
    rows = []
    # three coordinate conventions seen in HEST: pxl_* obs columns,
    # obsm['spatial'] only, and both (pxl_* must win)
    for sid, convention in (
        ("TENX95", "pxl_obs"),
        ("NCBI783", "obsm_only"),
        ("MISC001", "both"),
    ):
        X = rng.poisson(2.0, (n_spots, n_genes)).astype(float)
        xs = rng.uniform(40, 200, n_spots)
        ys = rng.uniform(40, 200, n_spots)
        obs = pd.DataFrame(index=[f"{sid}_{i}" for i in range(n_spots)])
        obsm = {}
        if convention in ("pxl_obs", "both"):
            obs["pxl_col_in_fullres"] = xs  # x
            obs["pxl_row_in_fullres"] = ys  # y
        if convention in ("obsm_only", "both"):
            # obsm['spatial'] rows are (x, y); in the 'both' case make it
            # deliberately DIFFERENT so a wrong preference order is caught
            shift = 17.0 if convention == "both" else 0.0
            obsm["spatial"] = np.column_stack([xs + shift, ys + shift])
        adata = AnnDataLite(
            X=X, obs=obs, var=pd.DataFrame(index=pd.Index(genes)),
            obsm=obsm,
            uns={"spatial": {sid: {"images": {"hires": img}}}},
        )
        # one sample exercises the reference's "*<sid>*.h5ad" glob fallback
        st_name = (f"{sid}.h5ad" if sid != "MISC001"
                   else f"prefix_{sid}_visium.h5ad")
        adata.write_h5ad(raw / "st" / st_name)
        # per-sample artifacts
        (raw / "patches" / sid).mkdir()
        (raw / "patches" / sid / f"{sid}_patches.h5").write_bytes(b"\x89HDF")
        (raw / "transcripts" / f"{sid}_transcripts.parquet").write_bytes(b"PAR1")
        (raw / "spatial_plots" / f"{sid}_spatial_plots.png").write_bytes(b"\x89PNG")
        # QC json merged over the CSV row; nb_genes deliberately disagrees
        (raw / "metadata" / f"{sid}.json").write_text(json.dumps({
            "nb_genes": n_genes,
            "spots_under_tissue": n_spots,
            "pixel_size_um_estimated": 0.92,
            "adata_nb_spots_under_tissue": n_spots,
        }))
        rows.append({
            "id": sid, "organ": "Lung", "oncotree_code": "LUAD",
            "disease_state": "Cancer", "species": "Homo sapiens",
            "st_technology": "Spatial Transcriptomics",
            "preservation_method": "FFPE", "nb_genes": -1,  # stale; QC wins
            "data_publication_date": "2023-01-01", "license": "CC BY 4.0",
            "tissue": "Lung", "subseries": "sub1",
            "spots_under_tissue": n_spots, "inter_spot_dist": 100.0,
            "spot_diameter": 55.0, "pixel_size_um_embedded": 0.9,
            "pixel_size_um_estimated": 0.92,
            "fullres_px_width": 256, "fullres_px_height": 256,
        })
    df = pd.DataFrame(rows, columns=HEST_CSV_COLUMNS)
    df.to_csv(raw / "HEST_v1_1_0.csv", index=False)
    return raw, genes


def test_csv_columns_and_query_filters(tmp_path):
    raw, _ = _make_hest_v110(tmp_path)
    ds = HESTDataset(raw)
    assert list(ds.meta.columns) == HEST_CSV_COLUMNS
    # every reference query filter column resolves
    assert len(ds.query(species="Homo sapiens")) == 3
    assert len(ds.query(organ="Lung", oncotree_code="LUAD")) == 3
    assert len(ds.query(st_technology="Spatial Transcriptomics")) == 3
    assert len(ds.query(disease_state="Cancer", tissue="Lung")) == 3
    assert len(ds.query(ids=["TENX95"])) == 1
    assert len(ds.query(species="Mus musculus")) == 0


def test_sample_artifact_resolution_and_qc_merge(tmp_path):
    raw, _ = _make_hest_v110(tmp_path)
    samples = {s.sample_id: s for s in HESTDataset(raw).get_samples()}
    assert set(samples) == {"TENX95", "NCBI783", "MISC001"}
    s = samples["TENX95"]
    assert s.adata_path.exists()
    assert s.patches_dir is not None and s.patches_dir.name == "TENX95"
    assert [p.name for p in s.list_patches()] == ["TENX95_patches.h5"]
    assert s.transcripts_path.name == "TENX95_transcripts.parquet"
    assert s.spatial_plot_path.name == "TENX95_spatial_plots.png"
    # QC json overrode the stale CSV value (ref merge order :491-506)
    assert s.metadata["nb_genes"] == 8
    assert s.metadata["pixel_size_um_estimated"] == 0.92
    # glob fallback for non-canonical st filename
    assert samples["MISC001"].adata_path.name == "prefix_MISC001_visium.h5ad"


def test_coordinate_preference_order(tmp_path):
    from spatial_clip_tpu.data.preprocessing.utils import get_spot_coordinates

    raw, _ = _make_hest_v110(tmp_path)
    samples = {s.sample_id: s for s in HESTDataset(raw).get_samples()}
    pxl = get_spot_coordinates(samples["TENX95"].load_adata())
    assert pxl.shape == (6, 2)
    obsm = get_spot_coordinates(samples["NCBI783"].load_adata())
    assert obsm.shape == (6, 2)
    # when both exist, obs.pxl_* wins (the 'both' fixture shifts obsm by 17)
    both_adata = samples["MISC001"].load_adata()
    both = get_spot_coordinates(both_adata)
    np.testing.assert_allclose(
        both[:, 0], both_adata.obs["pxl_col_in_fullres"].to_numpy())
    assert abs(both[0, 0] - both_adata.obsm["spatial"][0, 0]) > 10


def test_pipeline_over_hest_schema(tmp_path):
    """stage-1 -> stage-3 over the exact v1.1.0 layout: all three
    coordinate conventions survive to shards."""
    raw, genes = _make_hest_v110(tmp_path)
    hvg = tmp_path / "hvgs.txt"
    hvg.write_text("\n".join(genes[:6]))
    hgnc = tmp_path / "hgnc.txt"
    hgnc.write_text(
        "symbol\tstatus\talias_symbol\n"
        + "\n".join(f"{g}\tApproved\t" for g in genes)
    )
    cfg = {
        "dataset": {"key": "hest_schema", "description": "schema contract"},
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
            "sharding": {"max_samples_per_shard": 8},
            "tiling": {"tile_size": 32},
        },
        "performance": {"max_workers": 2, "limit_samples": -1},
    }
    from spatial_clip_tpu.data.preprocessing.entry import run

    stats = run(cfg)
    assert stats["total_processed"] == 18  # 3 samples x 6 spots
    assert stats["total_failed"] == 0
    out = tmp_path / "out"
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["outputs"]["shard_count"] == 3
    for sid in ("TENX95", "NCBI783", "MISC001"):
        assert (out / sid).is_dir(), f"no shard dir for {sid}"
