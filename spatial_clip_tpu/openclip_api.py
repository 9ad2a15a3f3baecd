"""open_clip-shaped public API surface.

A user of the reference imports everything from ``open_clip`` (ref:
src/open_clip/__init__.py). This module provides the same names on top of
the TPU-native implementations so migration is an import swap:

    from spatial_clip_tpu import (create_model_and_transforms, get_tokenizer,
                                  tokenize, ClipLoss, list_pretrained, ...)

Losses are pure mesh-aware functions here (losses/contrastive.py), so the
reference's loss *classes* map to thin factories returning the callable
``LossFn`` with the same knobs.

Versioning: ``spatial_clip_tpu.__version__`` is this package's own version
(0.x), NOT the reference's (open_clip 3.1.0 at the pinned snapshot) —
feature parity is tracked per-surface in COVERAGE.md, not by version
number. ``openclip_compat_version`` below names the reference release whose
export surface this module mirrors.
"""
from __future__ import annotations

# the open_clip release whose public surface this module tracks
# (ref: src/open_clip/version.py)
openclip_compat_version = "3.1.0"

from typing import Optional

from spatial_clip_tpu.losses import make_loss
from spatial_clip_tpu.models.clip import CLIP
from spatial_clip_tpu.models.coca import CoCa
from spatial_clip_tpu.models.config import (
    TextCfg,
    VisionCfg,
    add_model_config,
    list_model_configs,
    load_model_config,
    register_model_config,
)
from spatial_clip_tpu.models.constants import (
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
)
from spatial_clip_tpu.models.factory import (
    create_loss,
    create_model,
    create_model_and_transforms,
    get_tokenizer,
    list_models,
    load_checkpoint,
)
from spatial_clip_tpu.models.pretrained import (
    get_pretrained_cfg,
    list_pretrained,
    list_pretrained_tags_by_model,
)
from spatial_clip_tpu.models.push_to_hf_hub import (
    push_pretrained_to_hf_hub,
    push_to_hf_hub,
)
from spatial_clip_tpu.models.tokenizer import SimpleTokenizer
from spatial_clip_tpu.models.transforms import AugmentationCfg, image_transform

# the reference's separate custom-text-tower class is one unified module
# here (models/clip.py builds text/HF/gene towers from the config)
CustomTextCLIP = CLIP
# reference naming for the config dataclasses (ref: model.py:38,79)
CLIPVisionCfg = VisionCfg
CLIPTextCfg = TextCfg


def get_model_config(model_name: str) -> Optional[dict]:
    """Raw architecture config dict, or None if unknown (ref: factory.py:79)."""
    try:
        return load_model_config(model_name)
    except (ValueError, FileNotFoundError):
        return None


def list_openai_models() -> list:
    """Model names with an 'openai' pretrained tag (ref: openai.py:16)."""
    return [m for m, t in list_pretrained() if t == "openai"]


def list_pretrained_models_by_tag(tag: str) -> list:
    """Model names carrying ``tag`` (ref: pretrained.py:745)."""
    return sorted({m for m, t in list_pretrained() if t == tag})


def load_openai_model(name: str, precision: str = "bf16", **kwargs):
    """Build + load an OpenAI-pretrained CLIP (TorchScript archive handled
    by models/convert.py; ref: openai.py:24-90). Returns a ModelBundle."""
    if get_pretrained_cfg(name, "openai") is None:
        raise RuntimeError(
            f"{name} has no OpenAI weights; choose from {list_openai_models()}"
        )
    return create_model(name, pretrained="openai", precision=precision, **kwargs)


def create_model_from_pretrained(
    model_name: str,
    pretrained: Optional[str] = None,
    return_transform: bool = True,
    require_pretrained: bool = True,
    **kwargs,
):
    """Ref: factory.py:968-1010 — (model, preprocess) for inference.

    Like the reference, this raises when no pretrained weights were
    requested (require_pretrained): silently returning random weights from
    an inference constructor is a footgun. Pass require_pretrained=False
    (or use create_model_and_transforms) for a fresh initialization.
    """
    if pretrained is None and require_pretrained:
        raise RuntimeError(
            f"create_model_from_pretrained({model_name!r}) without "
            "pretrained= would return RANDOM weights; pass a tag/path or "
            "require_pretrained=False"
        )
    bundle, _, preprocess_val = create_model_and_transforms(
        model_name, pretrained=pretrained, **kwargs
    )
    return (bundle, preprocess_val) if return_transform else bundle


# --------------------------------------------------------------------- loss
# The reference exports loss CLASSES (loss.py:99,216,308); the TPU-native
# losses are pure functions, so these are factories returning the callable
# LossFn with the corresponding knobs.
def ClipLoss(**kwargs):
    return make_loss("clip", **kwargs)


def CoCaLoss(**kwargs):
    return make_loss("coca", **kwargs)


def DistillClipLoss(**kwargs):
    return make_loss("distill", **kwargs)


def SigLipLoss(**kwargs):
    return make_loss("siglip", **kwargs)


def SpatialLoss(**kwargs):
    return make_loss("spatial", **kwargs)


# ---------------------------------------------------------------- tokenizer
_DEFAULT_TOKENIZER: Optional[SimpleTokenizer] = None


def _default_tokenizer() -> SimpleTokenizer:
    global _DEFAULT_TOKENIZER
    if _DEFAULT_TOKENIZER is None:
        _DEFAULT_TOKENIZER = SimpleTokenizer()
    return _DEFAULT_TOKENIZER


def tokenize(texts, context_length: int = 77):
    """Module-level tokenize with the global byte-BPE tokenizer
    (ref: tokenizer.py:190 the `tokenize = SimpleTokenizer()` global)."""
    return _default_tokenizer()(texts, context_length=context_length)


def decode(output_ids):
    """Inverse of :func:`tokenize` (ref: tokenizer.py:196)."""
    import numpy as np

    return _default_tokenizer().decode(np.asarray(output_ids).tolist())


# ------------------------------------------------------- zero-shot metadata
def __getattr__(name: str):
    # lazy: the vendored ImageNet metadata JSON loads on first access
    if name in (
        "IMAGENET_CLASSNAMES",
        "OPENAI_IMAGENET_TEMPLATES",
        "SIMPLE_IMAGENET_TEMPLATES",
    ):
        from spatial_clip_tpu.train.zero_shot import load_imagenet_metadata

        classnames, openai_t = load_imagenet_metadata("openai")
        if name == "IMAGENET_CLASSNAMES":
            return tuple(classnames)
        if name == "OPENAI_IMAGENET_TEMPLATES":
            return tuple(openai_t)
        return tuple(load_imagenet_metadata("simple")[1])
    if name in ("build_zero_shot_classifier", "build_zero_shot_classifier_legacy"):
        from spatial_clip_tpu.train import zero_shot

        if name.endswith("legacy"):
            # the legacy variant differs only in per-class (unbatched)
            # template iteration (ref: zero_shot_classifier.py:72-103)
            import functools

            return functools.partial(
                zero_shot.build_zero_shot_classifier, num_classes_per_batch=1
            )
        return zero_shot.build_zero_shot_classifier
    raise AttributeError(name)
