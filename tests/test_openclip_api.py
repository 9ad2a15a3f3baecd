"""open_clip public-API surface parity (ref: src/open_clip/__init__.py).

A reference user's imports must resolve from the top-level package:
``from spatial_clip_tpu import create_model_and_transforms, tokenize, ...``.
"""
import numpy as np
import pytest

import spatial_clip_tpu as sct

# every name the reference exports from `open_clip` (ref __init__.py)
REF_EXPORTS = [
    "AugmentationCfg", "CLIP", "CLIPTextCfg", "CLIPVisionCfg", "ClipLoss",
    "CoCa", "CoCaLoss", "CustomTextCLIP", "DistillClipLoss",
    "IMAGENET_CLASSNAMES", "OPENAI_DATASET_MEAN", "OPENAI_DATASET_STD",
    "OPENAI_IMAGENET_TEMPLATES", "SIMPLE_IMAGENET_TEMPLATES",
    "SimpleTokenizer", "__version__", "add_model_config",
    "build_zero_shot_classifier", "build_zero_shot_classifier_legacy",
    "create_loss", "create_model", "create_model_and_transforms",
    "create_model_from_pretrained", "decode", "get_model_config",
    "get_tokenizer", "image_transform", "list_models", "list_openai_models",
    "list_pretrained", "list_pretrained_models_by_tag",
    "list_pretrained_tags_by_model", "load_checkpoint", "load_openai_model",
    "push_pretrained_to_hf_hub", "push_to_hf_hub", "tokenize",
]


def test_every_reference_export_resolves():
    missing = [n for n in REF_EXPORTS if not hasattr(sct, n)]
    assert not missing, f"missing top-level exports: {missing}"


def test_module_level_tokenize_decode_roundtrip():
    toks = sct.tokenize(["a photo of a cat"], context_length=77)
    assert np.asarray(toks).shape == (1, 77)
    text = sct.decode(np.asarray(toks)[0])
    assert "a photo of a cat" in text


def test_get_model_config_and_registry():
    cfg = sct.get_model_config("ViT-B-32")
    assert cfg["embed_dim"] == 512
    assert sct.get_model_config("not-a-model") is None


def test_add_model_config_registers_overlay(tmp_path):
    import json

    cfg = sct.get_model_config("ViT-Test")
    (tmp_path / "My-Overlay-Test.json").write_text(json.dumps(cfg))
    sct.add_model_config(tmp_path)
    assert "My-Overlay-Test" in sct.list_models()
    bundle = sct.create_model("My-Overlay-Test", precision="fp32", seed=0)
    assert bundle.cfg.embed_dim == cfg["embed_dim"]


def test_pretrained_listing_helpers():
    pairs = sct.list_pretrained()
    assert ("ViT-B-32", "openai") in pairs
    assert "ViT-B-32" in sct.list_openai_models()
    assert "ViT-B-32" in sct.list_pretrained_models_by_tag("openai")
    assert "openai" in sct.list_pretrained_tags_by_model("ViT-B-32")


def test_loss_factories_return_callable_lossfn():
    for factory in (sct.ClipLoss, sct.CoCaLoss, sct.DistillClipLoss,
                    sct.SigLipLoss, sct.SpatialLoss):
        loss = factory()
        assert callable(loss)
        assert hasattr(loss, "accepted_args")


def test_imagenet_metadata_tables():
    assert len(sct.IMAGENET_CLASSNAMES) == 1000
    assert len(sct.OPENAI_IMAGENET_TEMPLATES) == 80
    prompt = sct.OPENAI_IMAGENET_TEMPLATES[0]("dog")
    assert "dog" in prompt


def test_create_model_from_pretrained_shape():
    # matches the reference's require_pretrained: no weights -> error
    with pytest.raises(RuntimeError):
        sct.create_model_from_pretrained("ViT-Test")
    out = sct.create_model_from_pretrained("ViT-Test", require_pretrained=False)
    assert len(out) == 2  # (model bundle, eval preprocess)
    assert sct.create_model_from_pretrained(
        "ViT-Test", return_transform=False, require_pretrained=False
    ).cfg.embed_dim == 32


def test_add_model_config_rejects_missing_path(tmp_path):
    with pytest.raises(FileNotFoundError):
        sct.add_model_config(tmp_path / "nope")
    with pytest.raises(ValueError):
        sct.add_model_config(tmp_path)  # exists but holds no .json


def test_load_openai_model_rejects_unknown():
    with pytest.raises(RuntimeError):
        sct.load_openai_model("ViT-Test")


def test_simple_tokenizer_vendored_vocab_default():
    tok = sct.SimpleTokenizer()
    assert tok.vocab_size == 49408


def test_get_tokenizer_guards_small_vocab_models():
    # tiny test arch (vocab 512) must not receive 49408-id BPE tokens
    tok = sct.get_tokenizer("ViT-Test")
    ids = np.asarray(tok(["hello world"]))
    assert ids.max() < 512
