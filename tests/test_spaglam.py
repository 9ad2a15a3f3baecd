"""spaglam single-pass pipeline + components tests (graph, tiler, encoder,
shard writer, validation, QC)."""
import json
import tarfile
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from spatial_clip_tpu.data.spaglam.anndata_lite import AnnDataLite, concat_anndata
from spatial_clip_tpu.data.spaglam.config import MainConfig
from spatial_clip_tpu.data.spaglam.dataset_writer import SpaglamPipeline
from spatial_clip_tpu.data.spaglam.gene_encoder import (
    batch_gene_sentences,
    generate_gene_sentence,
)
from spatial_clip_tpu.data.spaglam.graph_builder import (
    build_knn_graph,
    get_k_hop_neighborhood,
    subgraph_edge_list,
)
from spatial_clip_tpu.data.spaglam.image_tiler import ImageHandler
from spatial_clip_tpu.data.spaglam.shard_writer import ShardWriter
from spatial_clip_tpu.data.spaglam.validation import pre_run_validation
from spatial_clip_tpu.data.spaglam.qc_tools import write_qc_report


def test_gene_sentence_order_and_zeros():
    expr = np.array([0.0, 5.0, 1.0, 5.0, 0.0])
    genes = ["A", "B", "C", "D", "E"]
    s = generate_gene_sentence(expr, genes, n_top_genes=4)
    assert s == "B D C"  # ties stable, zeros dropped
    assert batch_gene_sentences(np.stack([expr, expr]), genes, 2) == ["B D", "B D"]


def test_khop_bfs():
    # path graph 0-1-2-3-4
    rows = [0, 1, 1, 2, 2, 3, 3, 4]
    cols = [1, 0, 2, 1, 3, 2, 4, 3]
    g = sp.csr_matrix((np.ones(8), (rows, cols)), shape=(5, 5))
    nodes, dists = get_k_hop_neighborhood(g, 0, hops=2)
    assert set(nodes.tolist()) == {0, 1, 2}
    assert dict(zip(nodes.tolist(), dists.tolist())) == {0: 0, 1: 1, 2: 2}
    ei = subgraph_edge_list(g, nodes)
    assert ei.shape[0] == 2 and ei.shape[1] >= 4


def test_knn_graph_symmetric():
    coords = np.random.default_rng(0).uniform(0, 100, (20, 2))
    g = build_knn_graph(coords, k=3)
    assert (g != g.T).nnz == 0
    assert g.diagonal().sum() == 0


def test_image_handler_boundary_padding():
    arr = np.arange(100 * 100 * 3, dtype=np.uint8).reshape(100, 100, 3)
    h = ImageHandler(arr, tile_size=32)
    t = h.get_tile(0, 0)  # top-left corner: 3/4 padded
    assert t.shape == (32, 32, 3)
    assert (t[:16, :16] == 255).all()  # fill
    np.testing.assert_array_equal(t[16:, 16:], arr[:16, :16])
    # center tile exact
    t2 = h.get_tile(50, 50, 10)
    np.testing.assert_array_equal(t2, arr[45:55, 45:55])


def test_shard_writer_rollover(tmp_path):
    with ShardWriter(str(tmp_path / "s-%06d.tar"), maxcount=2) as w:
        for i in range(5):
            w.write({"__key__": f"k{i}", "txt": f"t{i}", "json": {"i": i}})
    assert len(w.shards) == 3
    with tarfile.open(w.shards[0]) as tf:
        assert sorted(tf.getnames()) == ["k0.json", "k0.txt", "k1.json", "k1.txt"]


@pytest.fixture()
def spaglam_setup(tmp_path):
    rng = np.random.default_rng(0)
    n, g = 12, 10
    X = rng.poisson(1.5, (n, g)).astype(float)
    obs = pd.DataFrame(
        {
            "pxl_col_in_fullres": rng.uniform(20, 80, n),
            "pxl_row_in_fullres": rng.uniform(20, 80, n),
        }
    )
    var = pd.DataFrame(index=pd.Index([f"G{i}" for i in range(g)]))
    img = rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
    adata = AnnDataLite(X=X, obs=obs, var=var,
                        uns={"spatial": {"s": {"images": {"hires": img}}}})
    apath = tmp_path / "sample.h5ad"
    adata.write_h5ad(apath)
    hvg = tmp_path / "hvg.txt"
    hvg.write_text("\n".join(f"G{i}" for i in range(8)))
    cfg = MainConfig.from_dict(
        {
            "paths": {
                "adata_path": str(apath),
                "hvg_list_path": str(hvg),
                "output_dir": str(tmp_path / "shards"),
            },
            "preprocessing": {"hops": 1, "n_top_genes": 5, "tile_size": 16, "knn_k": 3},
            "performance": {"max_workers": 2, "maxcount": 5},
        }
    )
    return cfg


def test_spaglam_pipeline_end_to_end(spaglam_setup, tmp_path):
    cfg = spaglam_setup
    report = pre_run_validation(cfg)
    assert report["ok"], report
    stats = SpaglamPipeline(cfg).run()
    assert stats["processed"] == 12
    assert stats["failed"] == 0
    assert stats["spots_per_sec"] > 0
    shards = list(Path(cfg.paths.output_dir).glob("*.tar"))
    assert len(shards) == 3  # 12 spots / maxcount 5
    with tarfile.open(shards[0]) as tf:
        names = tf.getnames()
        meta = json.loads(
            tf.extractfile([n for n in names if n.endswith("json")][0]).read()
        )
        assert "edge_index" in meta and meta["n_nodes"] >= 1
    qc = write_qc_report(Path(cfg.paths.output_dir), grid=2)
    assert qc["n_samples"] == 12
    assert (Path(cfg.paths.output_dir) / "qc_grid.png").exists()


def test_anndata_roundtrip_and_concat(tmp_path):
    rng = np.random.default_rng(1)
    a = AnnDataLite(
        X=sp.csr_matrix(rng.poisson(1, (4, 3)).astype(float)),
        obs=pd.DataFrame({"sample_id": ["a"] * 4, "val": [1.0, 2, 3, 4]},
                         index=[f"a{i}" for i in range(4)]),
        var=pd.DataFrame(index=pd.Index(["g1", "g2", "g3"])),
        obsm={"spatial": rng.uniform(0, 10, (4, 2))},
        uns={"meta": {"k": "v"}, "num": 3},
    )
    p = tmp_path / "x.h5ad"
    a.write_h5ad(p)
    b = AnnDataLite.read_h5ad(p)
    np.testing.assert_allclose(b.X_dense(), a.X_dense())
    assert list(b.var_names) == ["g1", "g2", "g3"]
    assert b.obs["val"].tolist() == [1.0, 2, 3, 4]
    assert b.uns["meta"]["k"] == "v"
    # outer concat with disjoint gene
    c = AnnDataLite(
        X=np.ones((2, 2)),
        obs=pd.DataFrame({"sample_id": ["b"] * 2}, index=["b0", "b1"]),
        var=pd.DataFrame(index=pd.Index(["g2", "g9"])),
        obsm={"spatial": np.zeros((2, 2))},
    )
    m = concat_anndata([a, c], join="outer")
    assert m.n_obs == 6
    assert set(m.var_names) == {"g1", "g2", "g3", "g9"}
    # g9 zero for sample a rows
    g9 = m.X_dense()[:, list(m.var_names).index("g9")]
    assert (g9[:4] == 0).all() and (g9[4:] == 1).all()
