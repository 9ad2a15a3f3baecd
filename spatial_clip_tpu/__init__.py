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
from spatial_clip_tpu.openclip_api import (  # noqa: F401
    CLIP,
    AugmentationCfg,
    ClipLoss,
    CLIPTextCfg,
    CLIPVisionCfg,
    CoCa,
    CoCaLoss,
    CustomTextCLIP,
    DistillClipLoss,
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
    SigLipLoss,
    SimpleTokenizer,
    SpatialLoss,
    add_model_config,
    create_model_from_pretrained,
    decode,
    get_model_config,
    image_transform,
    list_openai_models,
    list_pretrained,
    list_pretrained_models_by_tag,
    list_pretrained_tags_by_model,
    load_checkpoint,
    load_openai_model,
    push_pretrained_to_hf_hub,
    push_to_hf_hub,
    register_model_config,
    tokenize,
)


def __getattr__(name: str):
    # lazily forwarded names (ImageNet metadata tables, zero-shot builders)
    if name in (
        "IMAGENET_CLASSNAMES",
        "OPENAI_IMAGENET_TEMPLATES",
        "SIMPLE_IMAGENET_TEMPLATES",
        "build_zero_shot_classifier",
        "build_zero_shot_classifier_legacy",
    ):
        from spatial_clip_tpu import openclip_api

        return getattr(openclip_api, name)
    raise AttributeError(name)
