"""Single-pass spot->shard pipeline (ref: src/spaglam_preproc/core/
dataset_writer.py:52-343 ``SpaglamPipeline``).

Per spot: k-hop BFS subgraph over the spatial connectivity graph, local edge
list, center-tile crop, gene sentence, optional precomputed text/image
embeddings — emitted as one webdataset sample
``{__key__, json(meta+edge_index+x,y), png, txt}`` through a thread pool into
rolling tar shards. Per-spot failures are isolated and counted
(ref: :167-169, 286-289); the run summary includes spots/sec (ref: :294-319).
"""
from __future__ import annotations

import json
import logging
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from spatial_clip_tpu.data.spaglam.config import MainConfig
from spatial_clip_tpu.data.spaglam.gene_encoder import generate_gene_sentence
from spatial_clip_tpu.data.spaglam.graph_builder import (
    build_knn_graph,
    get_k_hop_neighborhood,
    subgraph_edge_list,
)
from spatial_clip_tpu.data.spaglam.image_tiler import ImageHandler
from spatial_clip_tpu.data.spaglam.shard_writer import ShardWriter

log = logging.getLogger(__name__)


class SpaglamPipeline:
    def __init__(self, cfg: MainConfig):
        self.cfg = cfg
        self.adata = None
        self.coords: Optional[np.ndarray] = None
        self.graph = None
        self.handler: Optional[ImageHandler] = None
        self.hvgs: Optional[List[str]] = None
        self.stats: Dict[str, Any] = {}

    # --------------------------------------------------------------- loading
    def _load_resources(self):
        """Ref: dataset_writer.py:195-236."""
        from spatial_clip_tpu.data.preprocessing.utils import get_spot_coordinates
        from spatial_clip_tpu.data.spaglam.anndata_lite import AnnDataLite

        p = self.cfg.paths
        self.adata = AnnDataLite.read_h5ad(p.adata_path)
        self.coords = get_spot_coordinates(self.adata)
        key = self.cfg.preprocessing.connectivity_key
        if key in self.adata.obsp:
            self.graph = self.adata.obsp[key]
        else:
            log.info("No obsp['%s']; building %d-NN graph from coordinates",
                     key, self.cfg.preprocessing.knn_k)
            self.graph = build_knn_graph(self.coords, self.cfg.preprocessing.knn_k)
        src = p.image_path or self.adata
        self.handler = ImageHandler(src, tile_size=self.cfg.preprocessing.tile_size)
        if p.hvg_list_path and Path(p.hvg_list_path).exists():
            self.hvgs = [
                line.strip()
                for line in Path(p.hvg_list_path).read_text().splitlines()
                if line.strip()
            ]
            present = [g for g in self.hvgs if g in set(map(str, self.adata.var_names))]
            if present:
                self.adata = self.adata.subset_var(present)

    # ------------------------------------------------------------- one spot
    def _process_subgraph_to_sample(self, spot_idx: int) -> Optional[Dict[str, Any]]:
        """Ref: dataset_writer.py:52-169."""
        pp = self.cfg.preprocessing
        nodes, hop_dists = get_k_hop_neighborhood(self.graph, spot_idx, pp.hops)
        edge_index = subgraph_edge_list(self.graph, nodes)
        x, y = float(self.coords[spot_idx, 0]), float(self.coords[spot_idx, 1])
        tile = self.handler.get_tile(x, y, pp.tile_size)
        expr = self.adata.X_row(spot_idx)
        if self.cfg.quality_control.min_genes_per_spot > 0:
            if (expr > 0).sum() < self.cfg.quality_control.min_genes_per_spot:
                return None
        sentence = generate_gene_sentence(
            expr, list(map(str, self.adata.var_names)), pp.n_top_genes
        )
        key = f"{spot_idx:08d}"
        meta = {
            "spot_idx": int(spot_idx),
            "obs_name": str(self.adata.obs_names[spot_idx]),
            "x": x,
            "y": y,
            "n_nodes": int(len(nodes)),
            "nodes": nodes.tolist(),
            "hop_distances": hop_dists.tolist(),
            "edge_index": edge_index.tolist(),
        }
        return {"__key__": key, "json": meta, "png": tile, "txt": sentence}

    # ------------------------------------------------------------------ run
    def run(self) -> Dict[str, Any]:
        """Ref: dataset_writer.py:238-292."""
        t0 = time.time()
        self._load_resources()
        perf = self.cfg.performance
        out_dir = Path(self.cfg.paths.output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        pattern = str(out_dir / self.cfg.paths.shard_pattern)

        n = self.adata.n_obs
        if perf.limit_spots > 0:
            n = min(n, perf.limit_spots)
        processed = failed = skipped = 0
        with ShardWriter(pattern, maxcount=perf.maxcount) as writer:
            with ThreadPoolExecutor(max_workers=max(1, perf.max_workers)) as pool:
                for sample in pool.map(self._safe_process, range(n)):
                    if sample is None:
                        skipped += 1
                    elif sample is False:
                        failed += 1
                    else:
                        writer.write(sample)
                        processed += 1
            shards = writer.shards
        self.stats = self._finalize_run(t0, n, processed, failed, skipped, shards)
        return self.stats

    def _safe_process(self, idx: int):
        try:
            return self._process_subgraph_to_sample(idx)
        except Exception as e:
            if idx < 3:
                log.warning("spot %d failed: %s", idx, e)
            return False

    def _finalize_run(self, t0, n, processed, failed, skipped, shards):
        """Ref: dataset_writer.py:294-319."""
        elapsed = max(time.time() - t0, 1e-9)
        stats = {
            "total_spots": int(n),
            "processed": int(processed),
            "failed": int(failed),
            "skipped": int(skipped),
            "shards": shards,
            "elapsed_sec": round(elapsed, 2),
            "spots_per_sec": round(processed / elapsed, 2),
        }
        out_dir = Path(self.cfg.paths.output_dir)
        (out_dir / "run_stats.json").write_text(json.dumps(stats, indent=2))
        max_fail = self.cfg.quality_control.max_failed_fraction
        if n and failed / n > max_fail:
            log.error("failure fraction %.2f exceeds %.2f", failed / n, max_fail)
        log.info("spaglam run: %s", stats)
        return stats


def create_dataset_shards(cfg: MainConfig) -> Dict[str, Any]:
    """Entry used by the CLI (ref: cli.py:60 -> dataset_writer.py:334)."""
    return SpaglamPipeline(cfg).run()
