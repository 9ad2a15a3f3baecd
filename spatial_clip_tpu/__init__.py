"""spatial_clip_tpu — a TPU-native spatial-transcriptomics CLIP framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the Spatial-Clip
reference (histology tile <-> gene-sentence contrastive alignment on HEST-1k):

- ``models``   : CLIP model library (ViT + text/gene towers), tokenizers,
                 transforms, factory API (ref: src/open_clip/*).
- ``losses``   : CLIP / SigLIP / spatial multi-positive contrastive losses as
                 mesh-aware pure functions (ref: src/open_clip/loss.py,
                 src/models/components/losses.py).
- ``ops``      : Pallas TPU kernels (fused contrastive loss, image ops).
- ``parallel`` : device-mesh construction, shardings, collectives.
- ``data``     : dataset backends (parquet/shards/synthetic), datamodule,
                 offline preprocessing pipeline (ref: src/data/*,
                 src/spaglam_preproc/*).
- ``train``    : train state, jitted train loop, optimizers, checkpoints,
                 metrics, evaluation (ref: src/train.py, open_clip_train/*).
- ``config``   : lightweight Hydra-style YAML config composition.
"""

__version__ = "0.1.0"

from spatial_clip_tpu.losses import make_loss  # noqa: F401
from spatial_clip_tpu.models.factory import (  # noqa: F401
    create_loss,
    create_model,
    create_model_and_transforms,
    get_tokenizer,
    list_models,
)
