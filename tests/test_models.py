"""Model library tests (shape contracts, pooling, converter round-trip)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatial_clip_tpu import create_model, create_model_and_transforms, get_tokenizer, list_models
from spatial_clip_tpu.models.clip import CLIP
from spatial_clip_tpu.models.config import resolve_clip_cfg
from spatial_clip_tpu.models.convert import (
    jax_to_torch_state_dict,
    torch_to_jax_params,
)
from spatial_clip_tpu.models.tokenizer import GeneTokenizer, HashTokenizer
from spatial_clip_tpu.models.transforms import normalize_batch


def test_list_models_has_flagships():
    names = list_models()
    assert "ViT-B-32" in names
    assert "ViT-Test" in names
    assert "ViT-B-32-GeneMLP" in names


def test_forward_shapes_and_norms(tiny_bundle):
    images = np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    text = np.ones((2, 16), dtype=np.int32)
    out = tiny_bundle(images=images, text=text)
    assert out["image_features"].shape == (2, 32)
    assert out["text_features"].shape == (2, 32)
    # features are L2-normalized
    np.testing.assert_allclose(
        np.linalg.norm(out["image_features"], axis=-1), 1.0, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.linalg.norm(out["text_features"], axis=-1), 1.0, rtol=1e-5
    )
    # logit_scale starts at exp(ln(1/0.07)) = 1/0.07
    np.testing.assert_allclose(float(out["logit_scale"]), 1 / 0.07, rtol=1e-4)


def test_encode_methods_match_forward(tiny_bundle):
    images = np.random.default_rng(1).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    out = tiny_bundle(images=images)
    feats = tiny_bundle.encode_image(images)
    np.testing.assert_allclose(np.asarray(out["image_features"]), np.asarray(feats), rtol=1e-5)


def test_text_argmax_pooling_uses_eot(tiny_bundle):
    """Moving padding after EOT must not change the embedding (argmax pool)."""
    t1 = np.zeros((1, 16), dtype=np.int32)
    t1[0, :4] = [1, 10, 20, 511]  # sot, tokens, eot(=max id)
    t2 = t1.copy()
    t2[0, 10] = 0  # padding stays 0 -> identical
    f1 = tiny_bundle.encode_text(t1)
    f2 = tiny_bundle.encode_text(t2)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-6)


def test_gene_mlp_tower():
    bundle = create_model(
        "ViT-Test", precision="fp32",
        gene_cfg={"num_genes": 64, "width": 32, "layers": 1},
    )
    images = np.zeros((2, 32, 32, 3), dtype=np.float32)
    genes = np.random.default_rng(0).uniform(0, 1, (2, 64)).astype(np.float32)
    out = bundle(images=images, text=genes)
    assert out["text_features"].shape == (2, 32)


def test_bf16_forward_close_to_fp32():
    b32 = create_model("ViT-Test", precision="fp32", seed=3)
    b16 = create_model("ViT-Test", precision="bf16", seed=3)
    images = np.random.default_rng(2).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    f32 = np.asarray(b32.encode_image(images))
    f16 = np.asarray(b16.encode_image(images))
    # cosine similarity of unit vectors should be ~1
    cos = (f32 * f16).sum(-1)
    assert np.all(cos > 0.99)


def test_tokenizers():
    tok = HashTokenizer(vocab_size=512, context_length=16)
    ids = tok(["GENE1 GENE2 GENE3", "B2M ACTB"])
    assert ids.shape == (2, 16)
    assert ids[0, 0] == tok.SOT
    # deterministic
    np.testing.assert_array_equal(ids, tok(["GENE1 GENE2 GENE3", "B2M ACTB"]))

    gt = GeneTokenizer(["ACTB", "B2M", "GAPDH"], context_length=8)
    ids = gt(["ACTB GAPDH", "UNKNOWN B2M"])
    assert ids[0, 1] == 4  # ACTB -> first gene id
    assert ids[0, 2] == 6  # GAPDH
    assert ids[1, 1] == GeneTokenizer.UNK
    assert gt.vocab_size % 128 == 0


def test_get_tokenizer_fallback():
    tok = get_tokenizer("ViT-Test")
    assert tok(["hello world"]).shape == (1, 16)


def test_transforms_and_normalize():
    from PIL import Image

    _, train_t, val_t = create_model_and_transforms("ViT-Test", precision="fp32")
    img = Image.new("RGB", (50, 40), color=(128, 64, 32))
    a = train_t(img)
    b = val_t(img)
    assert a.shape == (32, 32, 3) and a.dtype == np.uint8
    assert b.shape == (32, 32, 3)
    normed = normalize_batch(jnp.asarray(b[None]))
    assert normed.shape == (1, 32, 32, 3)
    assert abs(float(normed.mean())) < 3.0


def test_torch_converter_roundtrip(tiny_bundle):
    """jax -> torch state dict -> jax must be the identity."""
    sd = jax_to_torch_state_dict(tiny_bundle.params)
    assert "visual.conv1.weight" in sd
    assert sd["visual.conv1.weight"].shape[1] == 3  # OIHW
    assert "transformer.resblocks.0.attn.in_proj_weight" in sd
    back = torch_to_jax_params(sd)
    flat_orig = jax.tree.leaves(tiny_bundle.params)
    flat_back = jax.tree.leaves(back)
    assert len(flat_orig) == len(flat_back)
    for a, b in zip(flat_orig, flat_back):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_jit_forward_compiles(tiny_bundle):
    model, params = tiny_bundle.model, tiny_bundle.params

    @jax.jit
    def fwd(params, images, text):
        return model.apply({"params": params}, images, text)

    images = jnp.zeros((2, 32, 32, 3), jnp.float32)
    text = jnp.ones((2, 16), jnp.int32)
    out = fwd(params, images, text)
    assert out["image_features"].shape == (2, 32)


def test_patchify_reshape_matches_conv():
    """reshape+GEMM patchify must equal nn.Conv given shared kernel params."""
    import jax.numpy as jnp
    from spatial_clip_tpu.models.transformer import VisionTransformer

    kw = dict(image_size=32, patch_size=16, width=32, layers=1, heads=2,
              output_dim=16, dtype=jnp.float32)
    vit_r = VisionTransformer(patchify_impl="reshape", **kw)
    vit_c = VisionTransformer(patchify_impl="conv", **kw)
    img = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)), jnp.float32
    )
    params = vit_r.init(jax.random.PRNGKey(0), img)["params"]
    out_r = vit_r.apply({"params": params}, img)
    out_c = vit_c.apply({"params": params}, img)  # same param tree (conv1/kernel)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_c), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_modified_resnet_tower():
    bundle = create_model("RN-Test", precision="fp32", seed=0)
    images = np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    text = np.ones((2, 16), dtype=np.int32)
    out = bundle(images=images, text=text)
    assert out["image_features"].shape == (2, 32)
    np.testing.assert_allclose(
        np.linalg.norm(out["image_features"], axis=-1), 1.0, rtol=1e-5
    )
    # frozen BN stats receive zero gradient
    def f(params):
        return bundle.model.apply({"params": params}, images, text)[
            "image_features"
        ].sum()

    g = jax.grad(f)(bundle.params)
    assert float(np.abs(g["visual"]["bn1"]["mean"]).sum()) == 0.0
    assert float(np.abs(g["visual"]["bn1"]["scale"]).sum()) > 0.0


def test_qk_norm_and_scaled_cosine_variants():
    for override in ({"qk_norm": True}, {"scaled_cosine": True}):
        bundle = create_model(
            "ViT-Test", precision="fp32",
            vision_cfg={"image_size": 32, "layers": 2, "width": 32,
                        "patch_size": 16, "heads": 2, **override},
        )
        images = np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
        out = bundle(images=images)
        assert np.isfinite(np.asarray(out["image_features"])).all()
    # scaled-cosine creates a per-head temperature param
    flat = jax.tree_util.tree_leaves_with_path(bundle.params)
    assert any("logit_scale" in jax.tree_util.keystr(p) and "attn" in jax.tree_util.keystr(p)
               for p, _ in flat)


def test_reduction_tokenizer():
    from spatial_clip_tpu.models.tokenizer import ReductionTokenizer

    base = GeneTokenizer([f"G{i}" for i in range(30)], context_length=10)
    text = " ".join(f"G{i}" for i in range(30))  # overflows context
    for mode in ("random", "shuffle", "simple"):
        tok = ReductionTokenizer(base, reduction=mode, seed=0)
        ids = tok([text])
        assert ids.shape == (1, 10)
        assert ids[0, 0] == base.SOT and base.EOT in ids[0]
        # 8 kept gene tokens, all valid ids
        kept = ids[0, 1:9]
        assert ((kept >= 4) & (kept < 34)).all()


def test_syntax_reduction_tokenizer():
    """POS-lite syntax mask (ref tokenizer.py:331-404): content words
    (nouns first) survive reduction; function words are dropped first."""
    from spatial_clip_tpu.models.tokenizer import (
        ReductionTokenizer,
        SimpleTokenizer,
        _pos_priority,
    )

    # priority contract: noun < adjective < verb < other
    assert _pos_priority("tissue") == 1
    assert _pos_priority("beautiful") == 2
    assert _pos_priority("running") == 3
    assert _pos_priority("the") == 4
    assert _pos_priority(",") == 4

    words = ["cell", "tumor", "tissue", "liver", "gland", "duct",
             "the", "and", "of", "are", "in", "with", "near"]
    base = GeneTokenizer(words, context_length=10)
    tok = ReductionTokenizer(base, reduction="syntax", seed=0)
    text = ("the cell and the tumor are in the tissue of the liver "
            "with the gland near the duct")
    ids = tok([text])
    assert ids.shape == (1, 10)
    assert ids[0, 0] == base.sot_token and base.eot_token in ids[0]
    kept = base.decode([t for t in ids[0].tolist()
                        if t not in (0, base.sot_token, base.eot_token)]).split()
    # every noun survives; the remaining slots (8 keep - 6 nouns) fall back
    # to function words in original order — same fill semantics as the ref
    assert len(kept) == 8
    for noun in ("CELL", "TUMOR", "TISSUE", "LIVER", "GLAND", "DUCT"):
        assert noun in kept
    assert sum(w in ("THE", "AND", "OF", "ARE", "IN", "WITH", "NEAR")
               for w in kept) == 2

    # short texts pass through unreduced
    short = tok(["liver tissue"])
    np.testing.assert_array_equal(short, base(["liver tissue"]))


def test_siglip_tokenizer_canonicalization():
    """SigLIP cleaning contract (ref tokenizer.py:557-620 + :104-129):
    HTML-unescape, underscore->space, punctuation strip, lowercase,
    whitespace collapse."""
    from spatial_clip_tpu.models.tokenizer import SigLipTokenizer

    c = SigLipTokenizer.canonicalize
    assert c("Hello, _World_!  ") == "hello world"
    assert c("A &amp; B's  cells") == "a bs cells"
    assert c("tumor-adjacent   stroma.") == "tumoradjacent stroma"


def test_hf_text_tower_offline():
    """HF (Flax BERT) text tower built from a local config — no network."""
    hf_cfg = {"vocab_size": 512, "hidden_size": 32, "num_hidden_layers": 2,
              "num_attention_heads": 2, "intermediate_size": 64,
              "max_position_embeddings": 32}
    bundle = create_model(
        "ViT-Test", precision="fp32",
        text_cfg={"context_length": 16, "vocab_size": 512,
                  "hf_config": hf_cfg, "hf_pooler_type": "mean_pooler"},
    )
    images = np.zeros((2, 32, 32, 3), dtype=np.float32)
    text = np.ones((2, 16), dtype=np.int32)
    out = bundle(images=images, text=text)
    assert out["text_features"].shape == (2, 32)
    np.testing.assert_allclose(
        np.linalg.norm(out["text_features"], axis=-1), 1.0, rtol=1e-5
    )


def test_hf_mt5_text_tower_offline():
    """mt5 encoder-only text tower (ref: hf_configs.py:30-44 — the 4th HF
    arch family; relative position bias, ids+mask-only call signature)."""
    hf_cfg = {"vocab_size": 512, "d_model": 32, "num_layers": 2,
              "num_heads": 2, "d_ff": 64, "d_kv": 16}
    bundle = create_model(
        "ViT-Test", precision="fp32",
        text_cfg={"context_length": 16, "vocab_size": 512,
                  "hf_config": hf_cfg, "hf_model_arch": "mt5",
                  "hf_pooler_type": "mean_pooler"},
    )
    images = np.zeros((2, 32, 32, 3), dtype=np.float32)
    text = np.ones((2, 16), dtype=np.int32)
    out = bundle(images=images, text=text)
    assert out["text_features"].shape == (2, 32)
    np.testing.assert_allclose(
        np.linalg.norm(out["text_features"], axis=-1), 1.0, rtol=1e-5
    )


def test_simple_tokenizer_bpe_algorithm(tmp_path):
    """Byte-BPE with a tiny synthetic merges file: merges apply by rank,
    encode/decode round-trips, special tokens wrap the sequence."""
    import gzip

    from spatial_clip_tpu.models.tokenizer import SimpleTokenizer

    merges = ["#version tiny", "h e", "l l", "he ll", "hell o</w>", "o k</w>"]
    path = tmp_path / "bpe.txt.gz"
    with gzip.open(path, "wt") as f:
        f.write("\n".join(merges) + "\n")
    tok = SimpleTokenizer(bpe_path=str(path), context_length=12, n_merges=5)
    # 256 bytes + 256 </w> + 5 merges + 2 specials
    assert tok.vocab_size == 256 * 2 + 5 + 2
    ids = tok.encode("hello")
    assert len(ids) == 1  # fully merged to 'hello</w>'
    assert tok.decode(ids).strip() == "hello"
    ids2 = tok.encode("ok")
    assert len(ids2) == 1
    assert tok.decode(tok.encode("hello ok")).split() == ["hello", "ok"]
    arr = tok(["hello ok"])
    assert arr.shape == (1, 12)
    assert arr[0, 0] == tok.sot_token
    assert arr[0, 3] == tok.eot_token
    # unknown words fall back to byte/word-end symbols, no crash
    assert tok.decode(tok.encode("xyz")).strip() == "xyz"


def test_simple_tokenizer_missing_vocab_raises():
    from spatial_clip_tpu.models.tokenizer import SimpleTokenizer

    with pytest.raises(FileNotFoundError):
        SimpleTokenizer(bpe_path="/nonexistent/vocab.gz")


def test_forward_intermediates(tiny_bundle):
    """Per-block tokens exposed through the 'intermediates' collection
    (ref: model.py forward_intermediates)."""
    images = np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    out, inter = tiny_bundle.model.apply(
        {"params": tiny_bundle.params}, images, None,
        mutable=["intermediates"],
    )
    blocks = inter["intermediates"]["visual"]["transformer"]
    assert set(blocks) == {"block_0", "block_1"}
    assert blocks["block_0"][0].shape == (2, 5, 32)  # 4 patches + cls

    from spatial_clip_tpu.ops.flops import feature_take_indices

    assert feature_take_indices(12, 3) == [9, 10, 11]
    assert feature_take_indices(12, [-1, 0]) == [11, 0]


def test_int8_quantized_checkpoint_roundtrip(tmp_path, tiny_bundle):
    from spatial_clip_tpu.models.quantize import load_quantized_npz, save_quantized_npz

    path = tmp_path / "q.npz"
    save_quantized_npz(tiny_bundle.params, str(path), min_size=64)
    restored = load_quantized_npz(str(path))
    # structure preserved
    assert len(jax.tree.leaves(restored)) == len(jax.tree.leaves(tiny_bundle.params))
    # embeddings nearly unchanged
    images = np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    f_full = np.asarray(tiny_bundle.encode_image(images))
    f_q = np.asarray(tiny_bundle.encode_image(images, params=restored))
    cos = (f_full * f_q).sum(-1)
    assert (cos > 0.995).all(), cos
    # artifact meaningfully smaller than fp32 npz
    from spatial_clip_tpu.train.checkpoints import save_params_npz

    full_path = tmp_path / "full.npz"
    save_params_npz(tiny_bundle.params, str(full_path))
    assert path.stat().st_size < 0.6 * full_path.stat().st_size


def test_local_dir_model_loading(tmp_path, tiny_bundle):
    """save_for_hf export loads back via the 'local-dir:' factory scheme
    (ref: factory.py local-dir handling)."""
    from spatial_clip_tpu.models.push_to_hf_hub import save_for_hf

    d = save_for_hf(tiny_bundle, tiny_bundle.params, str(tmp_path / "repo"))
    bundle2 = create_model(
        f"local-dir:{d}", precision="fp32",
        pretrained=str(d / "open_clip_pytorch_model.bin"),
    )
    images = np.random.default_rng(1).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(tiny_bundle.encode_image(images)),
        np.asarray(bundle2.encode_image(images)),
        rtol=1e-5, atol=1e-6,
    )
