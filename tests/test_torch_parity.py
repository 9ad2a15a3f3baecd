"""End-to-end checkpoint + tokenizer parity vs the REAL reference open_clip.

The reference torch package is imported as a black-box oracle (never copied)
via tests/helpers/reference_oracle.py. These tests prove the north-star
"checkpoint-compatible embeddings" claim with actual torch modules:

- torch CLIP (random init) -> torch.save -> convert_torch_checkpoint -> our
  flax CLIP produces the same image/text embeddings (ref: model.py:265-479,
  factory.py:181-225).
- our params -> jax_to_torch_state_dict -> ref_model.load_state_dict(strict)
  round-trips the other way.
- SimpleTokenizer is token-for-token identical to the reference BPE
  (ref: tokenizer.py:133-269) on the public CLIP merges asset.
"""
from __future__ import annotations

import numpy as np
import pytest

from tests.helpers.reference_oracle import (
    REFERENCE_SRC,
    load_reference_open_clip,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

torch = pytest.importorskip("torch")

SMALL = dict(
    embed_dim=64,
    vision=dict(layers=2, width=64, head_width=32, patch_size=16, image_size=32),
    text=dict(context_length=16, vocab_size=128, width=64, heads=2, layers=2),
)


def _build_ref_clip(ref, cfg=SMALL, quick_gelu=False):
    torch.manual_seed(0)
    m = ref.model.CLIP(
        embed_dim=cfg["embed_dim"],
        vision_cfg=ref.model.CLIPVisionCfg(**cfg["vision"]),
        text_cfg=ref.model.CLIPTextCfg(**cfg["text"]),
        quick_gelu=quick_gelu,
    )
    m.eval()
    return m


def _build_our_clip(cfg=SMALL, quick_gelu=False):
    from spatial_clip_tpu import create_model

    v = cfg["vision"]
    return create_model(
        "ViT-Test",
        precision="fp32",
        seed=0,
        embed_dim=cfg["embed_dim"],
        quick_gelu=quick_gelu,
        vision_cfg=dict(
            layers=v["layers"],
            width=v["width"],
            heads=v["width"] // v["head_width"],
            patch_size=v["patch_size"],
            image_size=v["image_size"],
        ),
        text_cfg=dict(cfg["text"]),
    )


def _embed_torch(m, images_nchw, tokens):
    with torch.no_grad():
        img = m.encode_image(torch.from_numpy(images_nchw))
        txt = m.encode_text(torch.from_numpy(tokens))
    return img.numpy(), txt.numpy()


def _embed_ours(bundle, images_nchw, tokens):
    imgs = np.transpose(images_nchw, (0, 2, 3, 1))
    img = np.asarray(bundle.encode_image(imgs, normalize=False))
    txt = np.asarray(bundle.encode_text(tokens.astype(np.int32), normalize=False))
    return img, txt


@pytest.fixture(scope="module")
def ref():
    return load_reference_open_clip()


@pytest.fixture(scope="module")
def sample_inputs():
    rng = np.random.default_rng(0)
    images = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    tokens = rng.integers(1, 127, (2, 16)).astype(np.int64)
    tokens[:, -1] = 127  # highest id = EOT for argmax pooling
    return images, tokens


@pytest.mark.parametrize("quick_gelu", [False, True])
def test_torch_to_jax_embedding_parity(ref, sample_inputs, tmp_path, quick_gelu):
    from spatial_clip_tpu.models.convert import convert_torch_checkpoint

    images, tokens = sample_inputs
    tm = _build_ref_clip(ref, quick_gelu=quick_gelu)
    ckpt = tmp_path / "ref_clip.pt"
    torch.save({"state_dict": tm.state_dict()}, ckpt)

    bundle = _build_our_clip(quick_gelu=quick_gelu)
    params = convert_torch_checkpoint(ckpt, bundle.params)
    bundle.params = params

    t_img, t_txt = _embed_torch(tm, images, tokens)
    j_img, j_txt = _embed_ours(bundle, images, tokens)
    np.testing.assert_allclose(j_img, t_img, atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(j_txt, t_txt, atol=5e-4, rtol=5e-4)


def test_jax_to_torch_strict_roundtrip(ref, sample_inputs):
    from spatial_clip_tpu.models.convert import jax_to_torch_state_dict

    images, tokens = sample_inputs
    bundle = _build_our_clip()
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in jax_to_torch_state_dict(bundle.params).items()}

    tm = _build_ref_clip(ref)
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected, f"exported keys the reference rejects: {unexpected}"
    # torch buffers (e.g. attn_mask) are not parameters; everything learnable
    # must be covered by the export
    learnable = {n for n, _ in tm.named_parameters()}
    assert not (set(missing) & learnable), f"missing learnable keys: {set(missing) & learnable}"

    t_img, t_txt = _embed_torch(tm, images, tokens)
    j_img, j_txt = _embed_ours(bundle, images, tokens)
    np.testing.assert_allclose(j_img, t_img, atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(j_txt, t_txt, atol=5e-4, rtol=5e-4)


BPE_TEXTS = [
    "a photo of a cat",
    "Epithelial cells expressing KRT8 KRT18 EPCAM, stroma-adjacent!",
    "Hello, world... it's 2026; costs $3.50 (approx.)",
    "don't can't won't we're I'll they've",
    "MIXED CaSe TeXt WiTh NuMbErS 123 456789",
    "  leading and   trailing whitespace   ",
    "",
    "word " * 100,  # forces context-length truncation
    "naïve café protégé — em-dash …ellipsis",
    "ACGT " * 20,
]


def test_bpe_bit_parity_vs_reference(ref):
    gz = REFERENCE_SRC / "open_clip" / "bpe_simple_vocab_16e6.txt.gz"
    if not gz.exists():
        pytest.skip("public CLIP merges asset not in snapshot")
    from spatial_clip_tpu.models.tokenizer import SimpleTokenizer

    ref_tok = ref.tokenizer.SimpleTokenizer(bpe_path=str(gz))
    our_tok = SimpleTokenizer(bpe_path=str(gz), context_length=77)

    ref_ids = ref.tokenizer.tokenize(BPE_TEXTS, context_length=77).numpy()
    our_ids = np.asarray(our_tok(BPE_TEXTS))
    assert ref_ids.shape == our_ids.shape
    mism = np.nonzero((ref_ids != our_ids).any(axis=1))[0]
    assert mism.size == 0, (
        f"token mismatch for texts {[BPE_TEXTS[i][:40] for i in mism]}: "
        f"{ref_ids[mism][:2]} vs {our_ids[mism][:2]}"
    )
    # raw encode (no padding) must agree too
    for t in BPE_TEXTS:
        assert our_tok.encode(t) == ref_tok.encode(t), t[:50]


def test_rn50_style_convert_parity(ref, sample_inputs, tmp_path):
    """ModifiedResNet tower: torch random init -> convert -> embedding parity
    (ref: modified_resnet.py:96-236; stem pad + frozen BN + attnpool)."""
    from spatial_clip_tpu import create_model
    from spatial_clip_tpu.models.convert import (
        convert_torch_checkpoint,
        jax_to_torch_state_dict,
    )

    images, tokens = sample_inputs
    torch.manual_seed(0)
    tm = ref.model.CLIP(
        embed_dim=64,
        vision_cfg=ref.model.CLIPVisionCfg(
            layers=(1, 1, 1, 1), width=16, image_size=32
        ),
        text_cfg=ref.model.CLIPTextCfg(**SMALL["text"]),
    )
    tm.eval()
    ckpt = tmp_path / "rn.pt"
    torch.save(tm.state_dict(), ckpt)

    bundle = create_model(
        "RN-Test",
        precision="fp32",
        seed=0,
        embed_dim=64,
        vision_cfg=dict(layers=[1, 1, 1, 1], width=16, image_size=32),
        text_cfg=dict(SMALL["text"]),
    )
    bundle.params = convert_torch_checkpoint(ckpt, bundle.params)

    t_img, t_txt = _embed_torch(tm, images, tokens)
    j_img, j_txt = _embed_ours(bundle, images, tokens)
    np.testing.assert_allclose(j_img, t_img, atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(j_txt, t_txt, atol=5e-4, rtol=5e-4)

    # export direction: the reference model must strict-load everything
    # learnable we emit
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in jax_to_torch_state_dict(bundle.params).items()}
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected, f"exported keys the reference rejects: {unexpected}"
    learnable = {n for n, _ in tm.named_parameters()}
    assert not (set(missing) & learnable), set(missing) & learnable


def test_vit_b32_convert_parity(ref, tmp_path):
    """Full-size ViT-B/32: the flagship layout, random torch init -> ours."""
    from spatial_clip_tpu import create_model
    from spatial_clip_tpu.models.convert import convert_torch_checkpoint

    torch.manual_seed(0)
    tm = ref.model.CLIP(
        embed_dim=512,
        vision_cfg=ref.model.CLIPVisionCfg(layers=2, width=768, patch_size=32,
                                           image_size=224),
        text_cfg=ref.model.CLIPTextCfg(context_length=77, vocab_size=49408,
                                       width=512, heads=8, layers=2),
    )
    tm.eval()
    ckpt = tmp_path / "b32.pt"
    torch.save(tm.state_dict(), ckpt)

    bundle = create_model(
        "ViT-B-32", precision="fp32", seed=0,
        vision_cfg=dict(layers=2), text_cfg=dict(layers=2),
    )
    bundle.params = convert_torch_checkpoint(ckpt, bundle.params)

    rng = np.random.default_rng(1)
    images = rng.normal(size=(2, 3, 224, 224)).astype(np.float32)
    tokens = rng.integers(1, 49407, (2, 77)).astype(np.int64)
    tokens[:, -1] = 49407
    t_img, t_txt = _embed_torch(tm, images, tokens)
    j_img, j_txt = _embed_ours(bundle, images, tokens)
    np.testing.assert_allclose(j_img, t_img, atol=8e-4, rtol=8e-4)
    np.testing.assert_allclose(j_txt, t_txt, atol=8e-4, rtol=8e-4)
