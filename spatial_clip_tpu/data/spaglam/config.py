"""spaglam pipeline config dataclasses (ref: src/spaglam_preproc/config.py:6-66)."""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional


def _take(cls, d: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in (d or {}).items() if k in names}


@dataclass
class PathConfig:
    adata_path: str = ""
    image_path: Optional[str] = None
    hvg_list_path: Optional[str] = None
    output_dir: str = "shards"
    shard_pattern: str = "shard-%06d.tar"


@dataclass
class PreprocessingConfig:
    hops: int = 1
    n_top_genes: int = 50
    tile_size: int = 224
    precompute_embeddings: bool = False
    connectivity_key: str = "spatial_connectivities"
    knn_k: int = 6  # used when the graph must be built from coordinates


@dataclass
class ModelConfig:
    checkpoint: Optional[str] = None  # optional embedding model (e.g. OmiCLIP-style)
    model_name: str = "ViT-B-32"
    batch_size: int = 256


@dataclass
class QualityControlConfig:
    min_genes_per_spot: int = 0
    max_failed_fraction: float = 0.5
    emit_qc_report: bool = True


@dataclass
class PerformanceConfig:
    max_workers: int = 8
    maxcount: int = 1000
    limit_spots: int = -1


@dataclass
class MainConfig:
    paths: PathConfig = field(default_factory=PathConfig)
    preprocessing: PreprocessingConfig = field(default_factory=PreprocessingConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    quality_control: QualityControlConfig = field(default_factory=QualityControlConfig)
    performance: PerformanceConfig = field(default_factory=PerformanceConfig)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "MainConfig":
        return cls(
            paths=PathConfig(**_take(PathConfig, d.get("paths", {}))),
            preprocessing=PreprocessingConfig(
                **_take(PreprocessingConfig, d.get("preprocessing", {}))
            ),
            model=ModelConfig(**_take(ModelConfig, d.get("model", {}))),
            quality_control=QualityControlConfig(
                **_take(QualityControlConfig, d.get("quality_control", {}))
            ),
            performance=PerformanceConfig(
                **_take(PerformanceConfig, d.get("performance", {}))
            ),
        )
