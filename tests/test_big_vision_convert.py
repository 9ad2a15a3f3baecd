"""big_vision SigLIP .npz converter round-trip on a synthetic checkpoint
(ref: src/open_clip/convert.py:13-196 load_big_vision_weights key layout)."""
from __future__ import annotations

import numpy as np
import pytest

from spatial_clip_tpu import create_model
from spatial_clip_tpu.models.convert import _flatten, load_big_vision_npz


def _tiny_siglip_bundle():
    return create_model(
        "ViT-B-16-SigLIP2",  # real config name; shrink towers for CPU
        precision="fp32", seed=0,
        embed_dim=64,
        init_logit_bias=-10.0,
        vision_cfg=dict(
            timm_model_name="vit_pico_patch16_siglip_test",
            image_size=32, timm_pool="map", timm_proj="none",
        ),
        text_cfg=dict(
            context_length=8, vocab_size=64, width=64, heads=2, layers=2,
            no_causal_mask=True, proj_bias=True, pool_type="last",
            hf_tokenizer_name=None,
        ),
    )


def _synth_npz(tmp_path, bundle):
    """Emit a big_vision-layout npz whose values derive from the bundle's own
    params (so converted tensors can be checked numerically)."""
    rng = np.random.default_rng(0)
    flat = _flatten(bundle.params)
    w = {}
    D = 64
    H, hd = 2, 32

    def rnd(*shape):
        return rng.normal(size=shape).astype(np.float32)

    w["params/img/embedding/kernel"] = rnd(16, 16, 3, D)
    w["params/img/embedding/bias"] = rnd(D)
    L = flat["visual/trunk/pos_embed"].shape[0]
    w["params/img/pos_embedding"] = rnd(1, L, D)
    for tower, n_layers, prefix in (
        ("img", 2, "params/img/Transformer/encoderblock_"),
        ("txt", 2, "params/txt/Encoder_0/encoderblock_"),
    ):
        for i in range(n_layers):
            p = f"{prefix}{i}/"
            w[p + "LayerNorm_0/scale"] = rnd(D)
            w[p + "LayerNorm_0/bias"] = rnd(D)
            w[p + "LayerNorm_1/scale"] = rnd(D)
            w[p + "LayerNorm_1/bias"] = rnd(D)
            mha = p + "MultiHeadDotProductAttention_0/"
            for n in ("query", "key", "value"):
                w[mha + f"{n}/kernel"] = rnd(D, H, hd)
                w[mha + f"{n}/bias"] = rnd(H, hd)
            w[mha + "out/kernel"] = rnd(H, hd, D)
            w[mha + "out/bias"] = rnd(D)
            w[p + "MlpBlock_0/Dense_0/kernel"] = rnd(D, 4 * D)
            w[p + "MlpBlock_0/Dense_0/bias"] = rnd(4 * D)
            w[p + "MlpBlock_0/Dense_1/kernel"] = rnd(4 * D, D)
            w[p + "MlpBlock_0/Dense_1/bias"] = rnd(D)
    w["params/img/Transformer/encoder_norm/scale"] = rnd(D)
    w["params/img/Transformer/encoder_norm/bias"] = rnd(D)
    mp = "params/img/MAPHead_0/"
    w[mp + "probe"] = rnd(1, 1, D)
    mha = mp + "MultiHeadDotProductAttention_0/"
    for n in ("query", "key", "value"):
        w[mha + f"{n}/kernel"] = rnd(D, H, hd)
        w[mha + f"{n}/bias"] = rnd(H, hd)
    w[mha + "out/kernel"] = rnd(H, hd, D)
    w[mha + "out/bias"] = rnd(D)
    w[mp + "LayerNorm_0/scale"] = rnd(D)
    w[mp + "LayerNorm_0/bias"] = rnd(D)
    w[mp + "MlpBlock_0/Dense_0/kernel"] = rnd(D, 4 * D)
    w[mp + "MlpBlock_0/Dense_0/bias"] = rnd(4 * D)
    w[mp + "MlpBlock_0/Dense_1/kernel"] = rnd(4 * D, D)
    w[mp + "MlpBlock_0/Dense_1/bias"] = rnd(D)

    w["params/txt/Embed_0/embedding"] = rnd(64, D)
    w["params/txt/pos_embedding"] = rnd(1, 8, D)
    w["params/txt/Encoder_0/encoder_norm/scale"] = rnd(D)
    w["params/txt/Encoder_0/encoder_norm/bias"] = rnd(D)
    w["params/txt/head/kernel"] = rnd(D, 64)
    w["params/txt/head/bias"] = rnd(64)
    w["params/t"] = np.asarray([2.3], np.float32)
    w["params/b"] = np.asarray([-10.0], np.float32)
    path = tmp_path / "siglip.npz"
    np.savez(path, **w)
    return path, w


def test_big_vision_npz_roundtrip(tmp_path):
    bundle = _tiny_siglip_bundle()
    path, w = _synth_npz(tmp_path, bundle)
    params = load_big_vision_npz(path, bundle.params)
    flat = _flatten(params)

    # qkv fusion: concat of query/key/value kernels reshaped (D, H*hd)
    mha = "params/img/Transformer/encoderblock_0/MultiHeadDotProductAttention_0/"
    expect = np.concatenate(
        [w[mha + f"{n}/kernel"].reshape(64, -1) for n in ("query", "key", "value")],
        axis=1,
    )
    np.testing.assert_array_equal(
        flat["visual/trunk/blocks/resblocks_0/attn/qkv/kernel"], expect
    )
    # out projection flattened (H*hd, D)
    np.testing.assert_array_equal(
        flat["visual/trunk/blocks/resblocks_0/attn/out/kernel"],
        w[mha + "out/kernel"].reshape(-1, 64),
    )
    # MAP head probe + text head
    np.testing.assert_array_equal(
        flat["visual/attn_pool/probe"], w["params/img/MAPHead_0/probe"].reshape(1, 64)
    )
    np.testing.assert_array_equal(
        flat["text/text_projection/kernel"], w["params/txt/head/kernel"]
    )
    assert float(flat["logit_scale"]) == pytest.approx(2.3)
    assert float(flat["logit_bias"]) == pytest.approx(-10.0)

    # the converted model must run end-to-end
    bundle.params = params
    img = np.zeros((1, 32, 32, 3), np.float32)
    txt = np.zeros((1, 8), np.int32)
    out = bundle(img, txt)
    assert np.isfinite(np.asarray(out["image_features"])).all()
    assert np.isfinite(np.asarray(out["text_features"])).all()


def test_mobileclip_text_key_remap():
    """MobileCLIP text-encoder key remap (ref: convert.py:210-240)."""
    from spatial_clip_tpu.models.convert import (
        convert_mobileclip_state_dict,
        detect_checkpoint_flavor,
    )

    rng = np.random.default_rng(0)
    sd = {
        "text_encoder.projection_layer.weight": rng.normal(size=(64, 128)),
        "text_encoder.embedding_layer.weight": rng.normal(size=(100, 128)),
        "text_encoder.positional_embedding.pos_embed.pos_embed":
            rng.normal(size=(1, 77, 128)),
        "text_encoder.final_layer_norm.weight": rng.normal(size=128),
        "text_encoder.transformer.0.pre_norm_mha.0.weight": rng.normal(size=128),
        "text_encoder.transformer.0.pre_norm_mha.1.qkv_proj.weight":
            rng.normal(size=(384, 128)),
        "text_encoder.transformer.0.pre_norm_ffn.1.weight":
            rng.normal(size=(512, 128)),
        "text_encoder.transformer.0.pre_norm_ffn.4.weight":
            rng.normal(size=(128, 512)),
        "image_encoder.model.patch_embed.0.rbr_conv.0.conv.weight":
            rng.normal(size=(16, 3, 3, 3)),
        "logit_scale": np.asarray(4.6),
    }
    assert detect_checkpoint_flavor(sd) == "mobileclip"
    out = convert_mobileclip_state_dict(sd)
    assert "text.text_projection.weight" in out
    assert "text.token_embedding.weight" in out
    assert out["text.positional_embedding"].shape == (77, 128)
    assert "text.ln_final.weight" in out
    assert "text.transformer.resblocks.0.ln_1.weight" in out
    assert "text.transformer.resblocks.0.attn.in_proj_weight" in out
    assert "text.transformer.resblocks.0.mlp.c_fc.weight" in out
    assert "text.transformer.resblocks.0.mlp.c_proj.weight" in out
    assert any(k.startswith("visual.trunk.") for k in out)
    assert out["logit_scale"] == sd["logit_scale"]
