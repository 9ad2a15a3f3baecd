"""Preprocessing helpers (the missing ``src/data/preprocessing/utils.py``
rebuilt from its usage contract — SURVEY.md §2.8; callers:
scripts/validate_sharded_dataset.py:23, tests/test_preprocess.py:87-92).
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Set, Tuple, Union

import numpy as np
import pandas as pd
import scipy.sparse as sp

from spatial_clip_tpu.data.spaglam.anndata_lite import AnnDataLite

log = logging.getLogger(__name__)


# ----------------------------------------------------------------- HGNC align
def load_hgnc_resources(
    hgnc_path: Union[str, Path],
    keep_status: Optional[Sequence[str]] = ("Approved",),
    keep_locus_types: Optional[Sequence[str]] = None,
) -> Tuple[Set[str], Dict[str, str]]:
    """Parse the HGNC complete set TSV into (approved_symbols, alias->symbol).

    Ref contract: tests/test_preprocess.py:70-72 returns
    ``({'g1','g2','g3'}, {})``. Tolerates minimal TSVs with any of the
    standard columns missing.
    """
    df = pd.read_csv(hgnc_path, sep="\t", dtype=str, low_memory=False)
    cols = {c.lower(): c for c in df.columns}
    sym_col = cols.get("symbol", list(df.columns)[0])
    if "status" in cols and keep_status:
        df = df[df[cols["status"]].isin(list(keep_status))]
    if "locus_type" in cols and keep_locus_types:
        df = df[df[cols["locus_type"]].isin(list(keep_locus_types))]
    symbols = {s.upper() for s in df[sym_col].dropna()}

    alias_map: Dict[str, str] = {}
    for alias_col_name in ("alias_symbol", "prev_symbol", "alias"):
        col = cols.get(alias_col_name)
        if col is None:
            continue
        for sym, aliases in zip(df[sym_col], df[col]):
            if pd.isna(aliases) or pd.isna(sym):
                continue
            for a in str(aliases).split("|"):
                a = a.strip().upper()
                if a and a not in symbols:
                    alias_map.setdefault(a, str(sym).upper())
    return symbols, alias_map


def align_and_collapse_genes(
    adata: AnnDataLite,
    approved_symbols: Set[str],
    alias_map: Dict[str, str],
    drop_unknown: bool = False,
) -> AnnDataLite:
    """Harmonize var_names to HGNC symbols, collapsing alias duplicates by
    summing their counts (stage-1 semantics, docs/data_pipeline.md:95)."""
    names = [str(g).upper() for g in adata.var_names]
    mapped = [alias_map.get(g, g) for g in names]
    if drop_unknown and approved_symbols:
        keep = [i for i, g in enumerate(mapped) if g in approved_symbols]
        adata = adata.subset_var(np.asarray(keep))
        mapped = [mapped[i] for i in keep]

    # collapse duplicate target symbols by summation
    uniq: Dict[str, List[int]] = {}
    for i, g in enumerate(mapped):
        uniq.setdefault(g, []).append(i)
    if len(uniq) == len(mapped):
        out = adata.copy() if adata is None else adata
        out.var_names = mapped
        return out
    X = sp.csc_matrix(adata.X)
    cols = []
    for g, idxs in uniq.items():
        if len(idxs) == 1:
            cols.append(X[:, idxs[0]])
        else:
            cols.append(sp.csc_matrix(X[:, idxs].sum(axis=1)))
    Xnew = sp.hstack(cols).tocsr()
    out = AnnDataLite(
        X=Xnew,
        obs=adata.obs.copy(),
        var=pd.DataFrame(index=pd.Index(list(uniq))),
        obsm=dict(adata.obsm),
        uns=dict(adata.uns),
    )
    return out


# --------------------------------------------------------------- data loading
def load_single_sample_adata(sample, batch_key: str = "sample_id") -> AnnDataLite:
    """Load one HEST sample's AnnData and tag its obs with the batch key
    (ref contract: tests/test_preprocess.py:60-65)."""
    adata = sample.load_adata()
    adata.obs[batch_key] = [sample.sample_id] * adata.n_obs
    adata.obs_names = [f"{sample.sample_id}_{i}" for i in range(adata.n_obs)]
    # Canonicalize spot coordinates into obs.pxl_{col,row}_in_fullres BEFORE
    # the cross-sample concat: a sample carrying only obsm['spatial'] (one
    # of HEST's conventions, ref anndata_utils.py:5-34) would otherwise end
    # up with NaN pxl_* columns after an outer obs merge with samples that
    # have them, silently poisoning its tile extraction.
    if ("pxl_col_in_fullres" not in adata.obs.columns
            or "pxl_row_in_fullres" not in adata.obs.columns):
        coords = get_spot_coordinates(adata)
        adata.obs["pxl_col_in_fullres"] = coords[:, 0]
        adata.obs["pxl_row_in_fullres"] = coords[:, 1]
    return adata


# ---------------------------------------------------------------- normalizing
def normalize_adata(adata: AnnDataLite, target_sum: float = 1e4) -> None:
    """In-place library-size normalization + log1p (scanpy
    normalize_total+log1p equivalent; returns None per the test contract,
    tests/test_preprocess.py:73-74)."""
    X = adata.X
    if sp.issparse(X):
        X = X.tocsr().astype(np.float32)
        row_sums = np.asarray(X.sum(axis=1)).ravel()
        scale = np.divide(
            target_sum, row_sums, out=np.zeros_like(row_sums, dtype=np.float64),
            where=row_sums > 0,
        )
        X = sp.diags(scale) @ X
        X.data = np.log1p(X.data)
        adata.X = X.tocsr()
    else:
        X = np.asarray(X, dtype=np.float32)
        row_sums = X.sum(axis=1, keepdims=True)
        X = np.where(row_sums > 0, X * (target_sum / np.maximum(row_sums, 1e-12)), 0.0)
        adata.X = np.log1p(X)


def compute_hvgs(adata: AnnDataLite, n_top_genes: int = 5000) -> List[str]:
    """Highly-variable genes by the seurat_v3 criterion (variance of
    clipped standardized counts; simplified single-batch variant of
    ref hvg.flavor='seurat_v3_paper', configs/preprocess/default.yaml)."""
    X = adata.X
    if sp.issparse(X):
        X = np.asarray(X.todense())
    X = np.asarray(X, dtype=np.float64)
    mean = X.mean(axis=0)
    var = X.var(axis=0)
    # loess-free fallback: rank genes by variance-to-mean ratio on log scale
    with np.errstate(divide="ignore", invalid="ignore"):
        dispersion = np.where(mean > 0, var / mean, 0.0)
    order = np.argsort(-dispersion, kind="stable")[:n_top_genes]
    return [str(adata.var_names[i]) for i in sorted(order)]


# --------------------------------------------------------------- coordinates
def get_spot_coordinates(adata: AnnDataLite) -> np.ndarray:
    """(n, 2) full-resolution pixel (x=col, y=row) coordinates.

    Prefers ``obs['pxl_col_in_fullres']``/``obs['pxl_row_in_fullres']``,
    falling back to ``obsm['spatial']`` with orientation auto-detection
    against the pxl_* convention (ref: anndata_utils.py:5-34 and
    docs/data_pipeline.md §8).
    """
    obs = adata.obs
    if "pxl_col_in_fullres" in obs.columns and "pxl_row_in_fullres" in obs.columns:
        return np.stack(
            [
                pd.to_numeric(obs["pxl_col_in_fullres"]).to_numpy(dtype=np.float64),
                pd.to_numeric(obs["pxl_row_in_fullres"]).to_numpy(dtype=np.float64),
            ],
            axis=1,
        )
    spatial = adata.obsm.get("spatial")
    if spatial is None:
        raise KeyError(
            "No spot coordinates: need obs.pxl_{col,row}_in_fullres or obsm['spatial']"
        )
    coords = np.asarray(spatial, dtype=np.float64)[:, :2]
    return coords


def get_top_k_genes(adata: AnnDataLite, row: int, k: int = 50) -> List[str]:
    """Top-k expressed gene symbols for one spot (used by the shard
    validator's sentence replay, ref: validate_sharded_dataset.py:23)."""
    from spatial_clip_tpu.data.spaglam.gene_encoder import top_k_gene_indices

    expr = adata.X_row(row)
    idx = top_k_gene_indices(expr, k)
    return [str(adata.var_names[i]) for i in idx]
