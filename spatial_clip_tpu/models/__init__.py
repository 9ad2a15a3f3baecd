from spatial_clip_tpu.models.clip import CLIP, l2_normalize  # noqa: F401
from spatial_clip_tpu.models.config import (  # noqa: F401
    CLIPCfg,
    GeneCfg,
    TextCfg,
    VisionCfg,
    list_model_configs,
    load_model_config,
    resolve_clip_cfg,
)
from spatial_clip_tpu.models.factory import (  # noqa: F401
    ModelBundle,
    create_loss,
    create_model,
    create_model_and_transforms,
    get_tokenizer,
    list_models,
    load_checkpoint,
)
from spatial_clip_tpu.models.tokenizer import (  # noqa: F401
    GeneTokenizer,
    HashTokenizer,
    HFTokenizer,
    ReductionTokenizer,
    SigLipTokenizer,
    SimpleTokenizer,
)
from spatial_clip_tpu.models.transforms import (  # noqa: F401
    AugmentationCfg,
    HostImageTransform,
    PreprocessCfg,
    augment_batch,
    image_transform,
    normalize_batch,
)
