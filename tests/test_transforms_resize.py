"""resize_mode parity: squash / longest / shortest val preprocessing.

Reference semantics: ResizeKeepRatio + CenterCropOrPad selected by
resize_mode (ref: src/open_clip/transform.py:77-133,210-233); SigLIP
registry tags pin resize_mode='squash' (ref: src/open_clip/pretrained.py:53-63).
"""
import numpy as np
import pytest
from PIL import Image

from spatial_clip_tpu.models.pretrained import (
    get_pretrained_cfg,
    list_pretrained,
    preprocess_overrides,
)
from spatial_clip_tpu.models.transforms import (
    PreprocessCfg,
    image_transform,
    image_transform_v2,
)


def _gradient_img(w, h):
    x = np.linspace(0, 255, w, dtype=np.float64)[None, :]
    y = np.linspace(0, 255, h, dtype=np.float64)[:, None]
    arr = np.stack([np.broadcast_to(x, (h, w)),
                    np.broadcast_to(y, (h, w)),
                    np.full((h, w), 128.0)], axis=-1).astype(np.uint8)
    return Image.fromarray(arr)


def test_squash_distorts_to_exact_size():
    t = image_transform(64, is_train=False, resize_mode="squash")
    img = _gradient_img(100, 50)
    out = t(img)
    assert out.shape == (64, 64, 3)
    # squash == plain PIL resize to the target (aspect distorted)
    expected = np.asarray(img.resize((64, 64), Image.BICUBIC))
    np.testing.assert_array_equal(out, expected)


def test_longest_pads_with_fill_color():
    # 100x50 -> per-axis ratios (50/64, 100/64); longest=1 takes the max
    # => resized to 64x32, padded top/bottom by 16 rows of fill.
    t = image_transform(64, is_train=False, resize_mode="longest", fill_color=7)
    out = t(_gradient_img(100, 50))
    assert out.shape == (64, 64, 3)
    assert (out[:16] == 7).all() and (out[-16:] == 7).all()
    assert not (out[16:48] == 7).all()  # image content in the middle band


def test_longest_crops_when_larger_axis_overflows():
    # square target, square-ish input larger than target on both axes:
    # longest mode scales to fit entirely within the target (no crop needed)
    t = image_transform((48, 64), is_train=False, resize_mode="longest")
    out = t(_gradient_img(100, 100))
    assert out.shape == (48, 64, 3)
    # aspect preserved: 100x100 -> 48x48 content, padded left/right to 64
    assert (out[:, :8] == 0).all() and (out[:, -8:] == 0).all()


def test_shortest_center_crops():
    t = image_transform(64, is_train=False, resize_mode="shortest")
    out = t(_gradient_img(100, 50))
    assert out.shape == (64, 64, 3)
    # cover + center crop: no padding anywhere
    assert out.std() > 0


def test_unknown_resize_mode_raises():
    t = image_transform(64, is_train=False, resize_mode="stretchy")
    with pytest.raises(ValueError, match="resize_mode"):
        t(_gradient_img(10, 20))


def test_image_transform_v2_uses_cfg():
    cfg = PreprocessCfg(size=32, resize_mode="squash")
    t = image_transform_v2(cfg, is_train=False)
    out = t(_gradient_img(100, 50))
    expected = np.asarray(_gradient_img(100, 50).resize((32, 32), Image.BICUBIC))
    np.testing.assert_array_equal(out, expected)


def test_siglip_tags_pin_squash_preprocessing():
    cfg = get_pretrained_cfg("ViT-B-16-SigLIP", "webli")
    assert cfg is not None
    pp = preprocess_overrides(cfg)
    assert pp["resize_mode"] == "squash"
    assert pp["mean"] == (0.5, 0.5, 0.5) and pp["std"] == (0.5, 0.5, 0.5)


def test_registry_surface_and_quickgelu_derivation():
    pairs = set(list_pretrained())
    # machine-verified equal to the reference's full registry surface
    # (192 (model, tag) pairs incl. derived quickgelu aliases; the
    # comparison script exec'd the reference _PRETRAINED and diffed — zero
    # missing, zero extra; round-4 session log)
    assert len(pairs) == 192
    # derived aliases exist exactly for quick-gelu-trained tags
    assert ("ViT-B-32-quickgelu", "metaclip_400m") in pairs
    assert ("RN50-quickgelu", "openai") in pairs
    assert ("ViT-H-14-quickgelu", "dfn5b") in pairs
    assert ("ViT-H-14-quickgelu", "laion2b_s32b_b79k") not in pairs
    # CLIPA/MobileCLIP/PE preprocess contracts
    assert preprocess_overrides(
        get_pretrained_cfg("ViT-L-14-CLIPA", "datacomp1b"))["interpolation"] == "bilinear"
    assert preprocess_overrides(
        get_pretrained_cfg("MobileCLIP-B", "datacompdr"))["std"] == (1.0, 1.0, 1.0)
    assert preprocess_overrides(
        get_pretrained_cfg("ViT-H-14-378", "dfn5b"))["resize_mode"] == "squash"


def test_factory_applies_tag_preprocess_and_quickgelu(tmp_path, monkeypatch):
    """create_model(pretrained=<tag>) merges the tag's preprocess contract
    into the bundle's PreprocessCfg and enables QuickGELU when the tag was
    trained with it (ref: factory.py merges pretrained_cfg)."""
    import numpy as np

    from spatial_clip_tpu import create_model, create_model_and_transforms
    from spatial_clip_tpu.models import pretrained as P
    from spatial_clip_tpu.train.checkpoints import flatten_params

    # seed a registry entry + a real checkpoint file for ViT-Test
    bundle0 = create_model("ViT-Test", precision="fp32", seed=0)
    ckpt = tmp_path / "fake.npz"
    np.savez(ckpt, **flatten_params(bundle0.params))
    monkeypatch.setitem(P._PRETRAINED, "ViT-Test", {
        "faketag": {"url": "http://x/fake.bin", "quick_gelu": True,
                    "mean": (0.5, 0.5, 0.5), "std": (0.5, 0.5, 0.5),
                    "interpolation": "bilinear", "resize_mode": "squash"},
    })
    monkeypatch.setattr(P, "download_pretrained",
                        lambda model_name, tag, cache_dir=None: str(ckpt))
    bundle, t_train, t_val = create_model_and_transforms(
        "ViT-Test", pretrained="faketag", precision="fp32")
    assert bundle.cfg.quick_gelu is True
    pp = bundle.preprocess_cfg
    assert pp.resize_mode == "squash"
    assert pp.mean == (0.5, 0.5, 0.5) and pp.interpolation == "bilinear"
    # the val transform actually squashes
    out = t_val(_gradient_img(100, 50))
    assert out.shape == (pp.size, pp.size, 3)
    expected = np.asarray(
        _gradient_img(100, 50).resize((pp.size, pp.size), Image.BILINEAR))
    np.testing.assert_array_equal(out, expected)
