from spatial_clip_tpu.data.preprocessing import entry as hydra_entry  # noqa: F401
from spatial_clip_tpu.data.preprocessing import pipeline  # noqa: F401
from spatial_clip_tpu.data.preprocessing.entry import parse_stages, run  # noqa: F401
from spatial_clip_tpu.data.preprocessing.pipeline import (  # noqa: F401
    stage_01_merge_and_align,
    stage_02_normalize_and_filter,
    stage_03_create_shards,
)
from spatial_clip_tpu.data.preprocessing.utils import (  # noqa: F401
    align_and_collapse_genes,
    compute_hvgs,
    get_spot_coordinates,
    get_top_k_genes,
    load_hgnc_resources,
    load_single_sample_adata,
    normalize_adata,
)
