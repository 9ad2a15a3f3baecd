"""Pre-run validation (ref: src/spaglam_preproc/validation.py:10-74).

Checks, before an expensive shard run: spatial graph presence (or buildable),
coordinate sanity vs image bounds, HVG coverage of var_names, and model
checkpoint existence when embedding precompute is requested.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List

import numpy as np

from spatial_clip_tpu.data.spaglam.config import MainConfig

log = logging.getLogger(__name__)


def pre_run_validation(cfg: MainConfig) -> Dict[str, object]:
    from spatial_clip_tpu.data.preprocessing.utils import get_spot_coordinates
    from spatial_clip_tpu.data.spaglam.anndata_lite import AnnDataLite
    from spatial_clip_tpu.data.spaglam.image_tiler import ImageHandler

    problems: List[str] = []
    warnings: List[str] = []

    p = cfg.paths
    if not Path(p.adata_path).exists():
        return {"ok": False, "problems": [f"adata not found: {p.adata_path}"]}
    adata = AnnDataLite.read_h5ad(p.adata_path)

    # graph presence
    if cfg.preprocessing.connectivity_key not in adata.obsp:
        warnings.append(
            f"no obsp['{cfg.preprocessing.connectivity_key}'] — a "
            f"{cfg.preprocessing.knn_k}-NN graph will be built from coordinates"
        )

    # coordinate sanity
    try:
        coords = get_spot_coordinates(adata)
        if not np.isfinite(coords).all():
            problems.append("non-finite spot coordinates")
        handler = ImageHandler(p.image_path or adata, cfg.preprocessing.tile_size)
        W, H = handler.dimensions
        if W and H:
            frac_out = float(
                ((coords[:, 0] < 0) | (coords[:, 0] >= W)
                 | (coords[:, 1] < 0) | (coords[:, 1] >= H)).mean()
            )
            if frac_out > 0.05:
                problems.append(
                    f"{frac_out:.0%} of spots fall outside the image ({W}x{H})"
                )
        handler.close()
    except KeyError as e:
        problems.append(str(e))

    # HVG coverage
    if p.hvg_list_path and Path(p.hvg_list_path).exists():
        hvgs = [
            line.strip()
            for line in Path(p.hvg_list_path).read_text().splitlines()
            if line.strip()
        ]
        present = set(map(str, adata.var_names))
        coverage = sum(g in present for g in hvgs) / max(len(hvgs), 1)
        if coverage < 0.5:
            problems.append(f"HVG coverage only {coverage:.0%} of list present in var_names")
        elif coverage < 0.9:
            warnings.append(f"HVG coverage {coverage:.0%}")

    # model checkpoint (embedding precompute)
    if cfg.preprocessing.precompute_embeddings:
        ckpt = cfg.model.checkpoint
        if not ckpt or not Path(ckpt).exists():
            problems.append(f"precompute_embeddings=True but checkpoint missing: {ckpt}")

    ok = not problems
    for w in warnings:
        log.warning("validation: %s", w)
    for e in problems:
        log.error("validation: %s", e)
    return {"ok": ok, "problems": problems, "warnings": warnings,
            "n_obs": adata.n_obs, "n_vars": adata.n_vars}
