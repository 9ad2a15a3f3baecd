"""Minimal AnnData-compatible container with h5ad I/O (h5py).

The reference pipeline operates on ``anndata.AnnData`` (ref:
src/spaglam_preproc/core/hest_loading.py, tests/test_preprocess.py); anndata
is not a baked dependency here, so this module provides the slice the
pipeline needs: ``X`` (dense or CSR), ``obs``/``var`` DataFrames with named
indexes, ``obsm``/``obsp``/``uns``/``layers``, row/column subsetting, sample
concatenation, and read/write of the standard h5ad layout (dense or CSR X,
string/numeric/categorical obs columns) so files interoperate with the
anndata ecosystem.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np
import pandas as pd
import scipy.sparse as sp


class AnnDataLite:
    def __init__(
        self,
        X: Union[np.ndarray, sp.spmatrix],
        obs: Optional[pd.DataFrame] = None,
        var: Optional[pd.DataFrame] = None,
        obsm: Optional[Dict[str, np.ndarray]] = None,
        obsp: Optional[Dict[str, sp.spmatrix]] = None,
        uns: Optional[Dict[str, Any]] = None,
        layers: Optional[Dict[str, Any]] = None,
    ):
        self.X = X
        n, m = X.shape
        self.obs = obs if obs is not None else pd.DataFrame(index=[str(i) for i in range(n)])
        self.var = var if var is not None else pd.DataFrame(index=[str(i) for i in range(m)])
        self.obsm = dict(obsm or {})
        self.obsp = dict(obsp or {})
        self.uns = dict(uns or {})
        self.layers = dict(layers or {})

    # ----------------------------------------------------------- properties
    @property
    def n_obs(self) -> int:
        return self.X.shape[0]

    @property
    def n_vars(self) -> int:
        return self.X.shape[1]

    n_var = n_vars

    @property
    def obs_names(self) -> pd.Index:
        return self.obs.index

    @obs_names.setter
    def obs_names(self, names: Sequence[str]):
        self.obs.index = pd.Index([str(n) for n in names])

    @property
    def var_names(self) -> pd.Index:
        return self.var.index

    @var_names.setter
    def var_names(self, names: Sequence[str]):
        self.var.index = pd.Index([str(n) for n in names])

    @property
    def shape(self):
        return self.X.shape

    def X_dense(self) -> np.ndarray:
        return self.X.toarray() if sp.issparse(self.X) else np.asarray(self.X)

    def X_row(self, i: int) -> np.ndarray:
        if sp.issparse(self.X):
            return np.asarray(self.X[i].todense()).ravel()
        return np.asarray(self.X[i]).ravel()

    # ------------------------------------------------------------ subsetting
    def subset_obs(self, sel) -> "AnnDataLite":
        sel = np.asarray(sel)
        if sel.dtype == bool:
            sel = np.nonzero(sel)[0]
        return AnnDataLite(
            X=self.X[sel],
            obs=self.obs.iloc[sel].copy(),
            var=self.var.copy(),
            obsm={k: np.asarray(v)[sel] for k, v in self.obsm.items()},
            obsp={k: v[sel][:, sel] for k, v in self.obsp.items()},
            uns=dict(self.uns),
            layers={k: v[sel] for k, v in self.layers.items()},
        )

    def subset_var(self, sel) -> "AnnDataLite":
        if isinstance(sel, (list, tuple, pd.Index)) and len(sel) and isinstance(sel[0], str):
            pos = self.var.index.get_indexer([s for s in sel if s in self.var.index])
            pos = pos[pos >= 0]
        else:
            pos = np.asarray(sel)
            if pos.dtype == bool:
                pos = np.nonzero(pos)[0]
        X = self.X[:, pos] if not sp.issparse(self.X) else self.X.tocsc()[:, pos].tocsr()
        return AnnDataLite(
            X=X,
            obs=self.obs.copy(),
            var=self.var.iloc[pos].copy(),
            obsm=dict(self.obsm),
            obsp=dict(self.obsp),
            uns=dict(self.uns),
            layers={k: v[:, pos] for k, v in self.layers.items()},
        )

    def copy(self) -> "AnnDataLite":
        return AnnDataLite(
            X=self.X.copy(),
            obs=self.obs.copy(),
            var=self.var.copy(),
            obsm={k: np.array(v) for k, v in self.obsm.items()},
            obsp={k: v.copy() for k, v in self.obsp.items()},
            uns=dict(self.uns),
            layers={k: np.array(v) for k, v in self.layers.items()},
        )

    def __repr__(self):
        return (
            f"AnnDataLite(n_obs={self.n_obs}, n_vars={self.n_vars}, "
            f"obs={list(self.obs.columns)}, obsm={list(self.obsm)})"
        )

    # ----------------------------------------------------------------- h5ad
    def write_h5ad(self, path):
        import h5py

        with h5py.File(path, "w") as f:
            f.attrs["encoding-type"] = "anndata"
            f.attrs["encoding-version"] = "0.1.0"
            _write_X(f, "X", self.X)
            _write_df(f, "obs", self.obs)
            _write_df(f, "var", self.var)
            g = f.create_group("obsm")
            for k, v in self.obsm.items():
                g.create_dataset(k, data=np.asarray(v))
            g = f.create_group("obsp")
            for k, v in self.obsp.items():
                _write_X(g, k, sp.csr_matrix(v))
            _write_uns(f.create_group("uns"), self.uns)

    @classmethod
    def read_h5ad(cls, path) -> "AnnDataLite":
        import h5py

        with h5py.File(path, "r") as f:
            X = _read_X(f["X"]) if "X" in f else np.zeros((0, 0))
            obs = _read_df(f["obs"]) if "obs" in f else None
            var = _read_df(f["var"]) if "var" in f else None
            obsm = (
                {k: np.asarray(v) for k, v in f["obsm"].items()} if "obsm" in f else {}
            )
            obsp = (
                {k: _read_X(f["obsp"][k]) for k in f["obsp"]} if "obsp" in f else {}
            )
            uns = _read_uns(f["uns"]) if "uns" in f else {}
        return cls(X=X, obs=obs, var=var, obsm=obsm, obsp=obsp, uns=uns)


# alias so call sites read like anndata
AnnData = AnnDataLite


def concat_anndata(adatas: List[AnnDataLite], join: str = "outer") -> AnnDataLite:
    """Concatenate samples along obs (ref: stage-1 merge semantics).

    ``outer`` joins the gene axes (missing genes -> 0); ``inner`` intersects.
    """
    if not adatas:
        raise ValueError("nothing to concatenate")
    if join == "inner":
        genes = adatas[0].var_names
        for a in adatas[1:]:
            genes = genes.intersection(a.var_names)
        genes = list(genes)
    else:
        seen: Dict[str, None] = {}
        for a in adatas:
            for g in a.var_names:
                seen.setdefault(g, None)
        genes = list(seen)
    gene_pos = {g: i for i, g in enumerate(genes)}

    mats = []
    for a in adatas:
        X = sp.csr_matrix(a.X)
        cols = np.array([gene_pos[g] for g in a.var_names if g in gene_pos])
        keep = np.array([i for i, g in enumerate(a.var_names) if g in gene_pos])
        out = sp.csr_matrix((a.n_obs, len(genes)), dtype=X.dtype)
        if len(keep):
            sub = X.tocsc()[:, keep].tocsr()
            lil = sp.lil_matrix((a.n_obs, len(genes)), dtype=X.dtype)
            lil[:, cols] = sub
            out = lil.tocsr()
        mats.append(out)
    Xall = sp.vstack(mats).tocsr()
    obs = pd.concat([a.obs for a in adatas], axis=0)
    var = pd.DataFrame(index=pd.Index(genes))
    obsm: Dict[str, np.ndarray] = {}
    keys = set.intersection(*(set(a.obsm) for a in adatas)) if adatas else set()
    for k in keys:
        obsm[k] = np.concatenate([np.asarray(a.obsm[k]) for a in adatas], axis=0)
    uns: Dict[str, Any] = {}
    for a in adatas:
        uns.update(a.uns)
    return AnnDataLite(X=Xall, obs=obs, var=var, obsm=obsm, uns=uns)


# ------------------------------------------------------------------ h5 helpers
def _write_X(parent, name, X):
    if sp.issparse(X):
        X = X.tocsr()
        g = parent.create_group(name)
        g.attrs["encoding-type"] = "csr_matrix"
        g.attrs["encoding-version"] = "0.1.0"
        g.attrs["shape"] = np.asarray(X.shape, dtype=np.int64)
        g.create_dataset("data", data=X.data)
        g.create_dataset("indices", data=X.indices)
        g.create_dataset("indptr", data=X.indptr)
    else:
        parent.create_dataset(name, data=np.asarray(X))


def _read_X(node):
    import h5py

    if isinstance(node, h5py.Group):
        shape = tuple(node.attrs["shape"])
        enc = node.attrs.get("encoding-type", "csr_matrix")
        cls = sp.csr_matrix if "csr" in str(enc) else sp.csc_matrix
        mat = cls(
            (node["data"][:], node["indices"][:], node["indptr"][:]), shape=shape
        )
        return mat.tocsr()
    return np.asarray(node)


def _write_df(parent, name, df: pd.DataFrame):
    import h5py

    g = parent.create_group(name)
    g.attrs["encoding-type"] = "dataframe"
    g.attrs["_index"] = "_index"
    g.attrs["column-order"] = np.array(list(df.columns), dtype=h5py.string_dtype())
    str_dt = h5py.string_dtype(encoding="utf-8")
    g.create_dataset("_index", data=np.array([str(i) for i in df.index], dtype=object), dtype=str_dt)
    for col in df.columns:
        vals = df[col]
        if pd.api.types.is_numeric_dtype(vals) or pd.api.types.is_bool_dtype(vals):
            g.create_dataset(str(col), data=vals.to_numpy())
        else:
            g.create_dataset(
                str(col),
                data=np.array([str(v) for v in vals], dtype=object),
                dtype=str_dt,
            )


def _read_df(node) -> pd.DataFrame:
    import h5py

    index_key = node.attrs.get("_index", "_index")
    if isinstance(index_key, bytes):
        index_key = index_key.decode()

    def read_col(item):
        if isinstance(item, h5py.Group):  # anndata categorical
            cats = [_to_str(c) for c in item["categories"][:]]
            codes = item["codes"][:]
            return np.array([cats[c] if c >= 0 else "" for c in codes], dtype=object)
        arr = item[:]
        if arr.dtype.kind in ("S", "O"):
            return np.array([_to_str(v) for v in arr], dtype=object)
        return arr

    index = read_col(node[index_key]) if index_key in node else None
    cols = {}
    for key in node:
        if key == index_key:
            continue
        cols[key] = read_col(node[key])
    df = pd.DataFrame(cols)
    if index is not None:
        df.index = pd.Index(index)
    return df


def _to_str(v):
    return v.decode("utf-8") if isinstance(v, bytes) else str(v)


def _write_uns(group, uns: Dict[str, Any]):
    import h5py

    str_dt = h5py.string_dtype(encoding="utf-8")
    for k, v in uns.items():
        if isinstance(v, dict):
            _write_uns(group.create_group(str(k)), v)
        elif isinstance(v, str):
            group.create_dataset(str(k), data=v, dtype=str_dt)
        elif isinstance(v, (int, float, np.integer, np.floating)):
            group.create_dataset(str(k), data=v)
        elif isinstance(v, (list, tuple)) and all(isinstance(x, str) for x in v):
            group.create_dataset(str(k), data=np.array(v, dtype=object), dtype=str_dt)
        else:
            try:
                group.create_dataset(str(k), data=np.asarray(v))
            except TypeError:
                pass  # unserializable uns entries are skipped


def _read_uns(node) -> Dict[str, Any]:
    import h5py

    out: Dict[str, Any] = {}
    for k, v in node.items():
        if isinstance(v, h5py.Group):
            out[k] = _read_uns(v)
        else:
            val = v[()]
            if isinstance(val, bytes):
                val = val.decode("utf-8")
            elif isinstance(val, np.ndarray) and val.dtype.kind in ("S", "O"):
                val = np.array([_to_str(x) for x in val], dtype=object)
            out[k] = val
    return out
