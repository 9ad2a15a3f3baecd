"""HEST-1k corpus access (ref: src/spaglam_preproc/core/hest_loading.py:16-546).

``HESTDataset`` reads the HEST metadata CSV and answers filtered sample
queries (species / organ / technology / id); ``HESTSample`` lazily resolves
the per-sample artifacts (ST AnnData h5ad, WSI, patches, transcripts) under
the HEST directory layout:

    <root>/st/<ID>.h5ad            spot-level AnnData
    <root>/wsis/<ID>.tif           whole-slide image
    <root>/thumbnails/<ID>.jpeg    downsampled image
    <root>/metadata/<ID>.json      per-sample metadata
    <root>/HEST_v1_1_0.csv         corpus metadata table
"""
from __future__ import annotations

import json
import logging
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import pandas as pd

log = logging.getLogger(__name__)


@dataclass
class HESTSample:
    sample_id: str
    root: Path
    metadata: Dict[str, Any] = field(default_factory=dict)

    @property
    def adata_path(self) -> Path:
        p = self.root / "st" / f"{self.sample_id}.h5ad"
        if not p.exists():
            # flexible match, like the reference's glob fallback
            # (ref: hest_loading.py:465-470 "*{sid}*.h5ad")
            cands = sorted((self.root / "st").glob(f"*{self.sample_id}*.h5ad"))
            if cands:
                return cands[0]
        return p

    @property
    def wsi_path(self) -> Optional[Path]:
        for ext in (".tif", ".tiff", ".svs"):
            p = self.root / "wsis" / f"{self.sample_id}{ext}"
            if p.exists():
                return p
        return None

    @property
    def thumbnail_path(self) -> Optional[Path]:
        for ext in (".jpeg", ".jpg", ".png"):
            p = self.root / "thumbnails" / f"{self.sample_id}{ext}"
            if p.exists():
                return p
        return None

    @property
    def metadata_path(self) -> Path:
        return self.root / "metadata" / f"{self.sample_id}.json"

    @property
    def patches_dir(self) -> Optional[Path]:
        """Per-sample patches directory (ref: hest_loading.py:478-480)."""
        p = self.root / "patches" / self.sample_id
        return p if p.is_dir() else None

    @property
    def transcripts_path(self) -> Optional[Path]:
        """First <root>/transcripts/<ID>*.parquet (ref: hest_loading.py:483-485)."""
        cands = sorted(
            (self.root / "transcripts").glob(f"{self.sample_id}*.parquet"))
        return cands[0] if cands else None

    @property
    def spatial_plot_path(self) -> Optional[Path]:
        """Pre-rendered <root>/spatial_plots/<ID>_spatial_plots.png
        (ref: hest_loading.py:487-489)."""
        p = self.root / "spatial_plots" / f"{self.sample_id}_spatial_plots.png"
        return p if p.exists() else None

    def list_patches(self) -> List[Path]:
        """*.h5 patch files in the sample's patches dir (ref: :295-304)."""
        d = self.patches_dir
        return sorted(d.glob("*.h5")) if d else []

    def load_adata(self):
        from spatial_clip_tpu.data.spaglam.anndata_lite import AnnDataLite

        return AnnDataLite.read_h5ad(self.adata_path)

    def load_metadata(self) -> Dict[str, Any]:
        if self.metadata:
            return self.metadata
        if self.metadata_path.exists():
            self.metadata = json.loads(self.metadata_path.read_text())
        return self.metadata

    def open_image(self, tile_size: int = 224):
        from spatial_clip_tpu.data.spaglam.image_tiler import ImageHandler

        src = self.wsi_path or self.thumbnail_path
        return ImageHandler(src, tile_size=tile_size)


class HESTDataset:
    """Metadata-table-driven corpus view (ref: hest_loading.py:322-546)."""

    # canonical column aliases in HEST metadata CSVs
    COLS = {
        "sample_id": ("id", "sample_id"),
        "species": ("species",),
        "organ": ("organ",),
        "technology": ("st_technology", "technology"),
        "oncotree_code": ("oncotree_code",),
        "disease_state": ("disease_state",),
    }

    def __init__(
        self,
        data_dir: Union[str, Path],
        metadata_csv: Optional[Union[str, Path]] = None,
    ):
        self.data_dir = Path(data_dir)
        if metadata_csv is None:
            candidates = sorted(self.data_dir.glob("HEST*.csv")) + sorted(
                self.data_dir.glob("*.csv")
            )
            metadata_csv = candidates[0] if candidates else None
        self.metadata_csv = Path(metadata_csv) if metadata_csv else None
        if self.metadata_csv and self.metadata_csv.exists():
            self.meta = pd.read_csv(self.metadata_csv)
        else:
            # fall back: enumerate st/*.h5ad
            ids = sorted(p.stem for p in (self.data_dir / "st").glob("*.h5ad"))
            self.meta = pd.DataFrame({"id": ids})
            if not ids:
                log.warning("No HEST metadata csv or st/ dir under %s", self.data_dir)

    def _col(self, name: str) -> Optional[str]:
        for c in self.COLS.get(name, (name,)):
            if c in self.meta.columns:
                return c
        return None

    def query(
        self,
        species: Optional[str] = None,
        organ: Optional[str] = None,
        technology: Optional[str] = None,
        ids: Optional[List[str]] = None,
        **extra,
    ) -> pd.DataFrame:
        df = self.meta
        for key, val in {
            "species": species,
            "organ": organ,
            "technology": technology,
            **extra,
        }.items():
            if val is None:
                continue
            col = self._col(key)
            if col is None:
                continue
            if isinstance(val, (list, tuple, set)):
                df = df[df[col].isin(list(val))]
            else:
                df = df[df[col].astype(str).str.lower() == str(val).lower()]
        if ids is not None:
            idc = self._col("sample_id")
            df = df[df[idc].isin(ids)]
        return df

    def get_samples(self, species: Optional[str] = None, **filters) -> List[HESTSample]:
        df = self.query(species=species, **filters)
        idc = self._col("sample_id")
        out = []
        for _, row in df.iterrows():
            sid = str(row[idc])
            metadata = row.to_dict()
            # merge per-sample QC json over the CSV row (qc wins on shared
            # keys, ref: hest_loading.py:491-506)
            qc_path = self.data_dir / "metadata" / f"{sid}.json"
            if qc_path.exists():
                try:
                    qc = json.loads(qc_path.read_text())
                    if isinstance(qc, dict):
                        metadata.update(qc)
                    else:
                        log.warning(
                            "QC json for %s is not an object; ignoring", sid)
                except (json.JSONDecodeError, OSError) as e:
                    log.warning("bad QC json for %s: %s", sid, e)
            out.append(
                HESTSample(sample_id=sid, root=self.data_dir, metadata=metadata)
            )
        return out

    def __len__(self) -> int:
        return len(self.meta)
